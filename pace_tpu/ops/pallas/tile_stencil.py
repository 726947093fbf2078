"""Row-chunked whole-tile Pallas harness for 2D cubed-sphere stencils.

The dycore's horizontal stencils (c_sw, d_sw, ...) are chains of +/-few-cell
shifts with tile-edge special cases.  Under XLA each shifted read is a
separate HBM stream, so the acoustics substep moves ~40x its fundamental
bytes (cost_analysis).  Here a whole chain runs inside one Pallas kernel:

  - blocks cover the FULL j and k axes and a chunk of i rows, with
    `halo` extra rows of overlap on each side so i-shifts up to `halo`
    stay in-block;
  - the overlapped input copies are built by XLA (slice+stack of an
    edge-replicated pad -- one fused pass, factor (XB+2*halo)/XB extra
    read traffic);
  - the stencil math is written against an injected ops namespace
    (GlobalOps for the jnp path, BlockOps in-kernel), so global and
    fused paths share one source of truth.

Reference for the stencil semantics: ai2cm/pace
fv3core/pace/fv3core/stencils/ (FrozenStencil origin/domain windows and
axis_offsets edge specials).
"""

from __future__ import annotations

import functools
from types import SimpleNamespace

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pace_tpu.ops import stencil_utils as su


class GlobalOps:
    """Stencil ops on global (6, N, N[, nz]) arrays (axes 1, 2 = i, j)."""

    def shift(self, q, di=0, dj=0):
        return su.shift(q, di, dj)

    def upd_cols(self, dest, expr, *cols):
        return su.upd_cols(dest, expr, *cols)

    def upd_rows(self, dest, expr, *rows):
        return su.upd_rows(dest, expr, *rows)

    def upd_point(self, dest, expr, i, j):
        return su.upd_point(dest, expr, i, j)

    def set_region(self, dest, sx, sy, expr):
        return su.set_region(dest, sx, sy, expr)

    def fill_corners_cells(self, q, q_corner, n, h, direction, ncells,
                           mults=(1.0, 1.0, 1.0, 1.0)):
        from pace_tpu.ops import corners as corner_ops

        return corner_ops.fill_corners_cells(
            q, q_corner, n, h, direction, ncells,
            sw_mult=mults[0], se_mult=mults[1], nw_mult=mults[2],
            ne_mult=mults[3],
        )


class BlockOps:
    """Stencil ops on (R, N[, nz]) row-chunk blocks (axes 0, 1 = i, j).

    `row0` is the GLOBAL i index of block row 0 (may be negative for the
    first chunk).  Row shifts zero any read whose global SOURCE index is
    outside [0, N): by induction this reproduces the global zero-pad
    shift semantics (stencil_utils._shift_axis) at every in-range row,
    for arbitrarily composed shift chains; pad-row values are then never
    read.  j shifts span the full axis and zero-pad directly."""

    def __init__(self, row0, N):
        self.row0 = row0
        self.N = N

    def _sh_axis(self, q, d, axis):
        cfg = [(0, 0, 0)] * q.ndim
        idx = [slice(None)] * q.ndim
        if d > 0:
            idx[axis] = slice(d, None)
            cfg[axis] = (0, d, 0)
        else:
            idx[axis] = slice(None, d)
            cfg[axis] = (-d, 0, 0)
        return jax.lax.pad(q[tuple(idx)], jnp.zeros((), q.dtype), cfg)

    def shift(self, q, di=0, dj=0):
        out = q
        if di:
            out = self._sh_axis(out, di, 0)
            src = (
                jax.lax.broadcasted_iota(jnp.int32, out.shape, 0)
                + self.row0 + di
            )
            out = jnp.where(
                jnp.logical_and(src >= 0, src < self.N), out,
                jnp.zeros((), out.dtype),
            )
        if dj:
            out = self._sh_axis(out, dj, 1)
        return out

    def _row_mask(self, dest, idxs):
        ri = jnp.clip(
            jax.lax.broadcasted_iota(jnp.int32, dest.shape, 0) + self.row0,
            0, self.N - 1,
        )
        m = None
        for i in idxs:
            if isinstance(i, slice):
                start = i.start or 0
                stop = 10 ** 9 if i.stop is None else i.stop
                term = jnp.logical_and(ri >= start, ri < stop)
            else:
                term = ri == i
            m = term if m is None else jnp.logical_or(m, term)
        return m

    def _col_mask(self, dest, idxs):
        nj = dest.shape[1]
        jj = jax.lax.broadcasted_iota(jnp.int32, dest.shape, 1)
        m = None
        for i in idxs:
            if isinstance(i, slice):
                start = i.start or 0
                stop = nj if i.stop is None else i.stop
                term = jnp.logical_and(jj >= start, jj < stop)
            else:
                term = jj == i
            m = term if m is None else jnp.logical_or(m, term)
        return m

    def upd_cols(self, dest, expr, *cols):
        # global "columns i" are the ROW axis of the block layout
        return jnp.where(self._row_mask(dest, cols), expr, dest)

    def upd_rows(self, dest, expr, *rows):
        return jnp.where(self._col_mask(dest, rows), expr, dest)

    def upd_point(self, dest, expr, i, j):
        m = jnp.logical_and(
            self._row_mask(dest, (i,)), self._col_mask(dest, (j,))
        )
        return jnp.where(m, expr, dest)

    def set_region(self, dest, sx, sy, expr):
        return self.upd_point(dest, expr, sx, sy)

    def fill_corners_cells(self, q, q_corner, n, h, direction, ncells,
                           mults=(1.0, 1.0, 1.0, 1.0)):
        """Static masked-shift form of corners.fill_corners_cells: each of
        the ncells*4 wedge points is one select of the companion field
        shifted by the (small, static) source offset."""
        from pace_tpu.ops.corners import _fill_corners_cells_table

        ti, tj, si, sj, cid = _fill_corners_cells_table(
            n, h, direction, ncells
        )
        for k in range(len(ti)):
            expr = mults[int(cid[k])] * self.shift(
                q_corner, int(si[k]) - int(ti[k]), int(sj[k]) - int(tj[k])
            )
            q = self.upd_point(q, expr, int(ti[k]), int(tj[k]))
        return q


def _overlap(x, XB, H):
    """(6, N, ...) -> (6, nxc, XB+2H, ...) overlapping row chunks with
    edge replication (one fused XLA pass)."""
    N = x.shape[1]
    top = jnp.repeat(x[:, :1], H, axis=1)
    bot = jnp.repeat(x[:, -1:], H, axis=1)
    xp = jnp.concatenate([top, x, bot], axis=1)
    chunks = [
        jax.lax.slice_in_dim(xp, c * XB, c * XB + XB + 2 * H, axis=1)
        for c in range(N // XB)
    ]
    return jnp.stack(chunks, axis=1)


def tile_stencil_call(
    body,
    inputs,
    out_ndims,
    *,
    N: int,
    nz: int,
    XB: int,
    halo: int,
    dtype,
    interpret: bool = False,
    name: str = "tile_stencil",
):
    """Run `body` over row-chunked whole-tile blocks.

    Args:
        body: body(ops, row_slice, *blocks) -> tuple of block outputs.
            Each input block is (R, N, nz), (R, N), or (nz,) matching the
            input's kind; outputs must be (R, N, nz) or (R, N) and are
            cropped to the XB valid rows via row_slice (slice(H, H+XB)).
        inputs: list of arrays: (6, N, N, nz) 3D fields, (6, N, N) 2D
            metrics, (6, N, N, C) stacked metrics, or (nz,)/(nz+1,) columns.
        out_ndims: list of 3 or 2 -- output field kinds.
    Returns: list of (6, N, N, nz) / (6, N, N) outputs.
    """
    nxc = N // XB
    R = XB + 2 * halo

    specs = []
    ops_in = []
    kinds = []
    for x in inputs:
        if x.ndim >= 3 and x.shape[0] == 6:
            ov = _overlap(x, XB, halo)
            ops_in.append(ov)
            blk = (1, 1) + (R,) + ov.shape[3:]
            nd = ov.ndim
            specs.append(
                pl.BlockSpec(
                    blk,
                    (lambda t, c, _nd=nd: (t, c) + (0,) * (_nd - 2)),
                    memory_space=pltpu.VMEM,
                )
            )
            kinds.append("field")
        else:  # column (nz,) or (nz+1,)
            col = x.reshape(1, -1)
            ops_in.append(col)
            specs.append(
                pl.BlockSpec(
                    col.shape, (lambda t, c: (0, 0)), memory_space=pltpu.VMEM
                )
            )
            kinds.append("column")

    out_shapes = []
    out_specs = []
    for nd in out_ndims:
        if nd == 3:
            shp = (6, nxc, XB, N, nz)
        else:
            shp = (6, nxc, XB, N)
        out_shapes.append(jax.ShapeDtypeStruct(shp, dtype))
        out_specs.append(
            pl.BlockSpec(
                (1, 1, XB) + shp[3:],
                (lambda t, c, _k=len(shp) - 2: (t, c) + (0,) * _k),
                memory_space=pltpu.VMEM,
            )
        )

    def kernel(*refs):
        in_refs = refs[: len(ops_in)]
        out_refs = refs[len(ops_in):]
        blocks = []
        for ref, kind in zip(in_refs, kinds):
            if kind == "field":
                blocks.append(ref[0, 0])
            else:
                blocks.append(ref[0])
        row0 = pl.program_id(1) * XB - halo
        ops = BlockOps(row0, N)
        outs = body(ops, slice(halo, halo + XB), *blocks)
        for oref, o in zip(out_refs, outs):
            oref[0, 0] = o[halo: halo + XB]

    outs = pl.pallas_call(
        kernel,
        grid=(6, nxc),
        in_specs=specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=interpret,
    )(*ops_in)
    if not isinstance(outs, (list, tuple)):
        outs = [outs]
    final = []
    for o, nd in zip(outs, out_ndims):
        final.append(o.reshape((6, N) + o.shape[3:]))
    return final
