"""Helpers for writing FV3 stencils as jnp whole-array expressions.

The reference compiles each stencil over an origin/domain window
(ai2cm/pace dsl/pace/dsl/stencil.py FrozenStencil); here stencils are plain
functions over full (6, N, N[, nz]) arrays.  `shift(q, di, dj)` gives the
whole-array shifted view (zero-filled at the array boundary, which is
always outside any region a stencil writes), and `set_region` writes an
expression into a static (i, j) window, leaving the rest unchanged — XLA
dead-code-eliminates the unused lanes of the expression.
"""

from __future__ import annotations

import jax.numpy as jnp


def shift(q: jnp.ndarray, di: int = 0, dj: int = 0, dk: int = 0) -> jnp.ndarray:
    """out[..., i, j, k] = q[..., i+di, j+dj, k+dk], zero-filled at array
    bounds (axes 1, 2 are i, j; axis 3 if present is k).  Out-of-bounds
    cells are never consumed by any stencil output region."""
    out = q
    if di:
        out = _shift_axis(out, di, 1)
    if dj:
        out = _shift_axis(out, dj, 2)
    if dk:
        out = _shift_axis(out, dk, 3)
    return out


# Largest |d| used anywhere (currently 4: a2b_ord4 extrapolation rows).
_H = 4


def _shift_axis(q, d, axis):
    """Shifted view padded with ZEROS at the array bounds.

    out[i] = q[i+d] in bounds, 0 outside: slice then lax.pad, one pad
    per call.  The pad value is only ever visible in the outermost
    storage rows, which no stencil output region consumes (see module
    docstring); it is 0 rather than edge-replicated, so those
    never-consumed cells may hold 0/0 NaNs -- by design they already
    hold arbitrary values.

    HISTORY (do not re-land without the on-chip sweep): round 3 replaced
    this with a shared fixed (4,4) pad + window slice so all shifts of
    one array CSE into one pad (a ~5 ms/step C48 win on the HLO byte
    census).  That form MISCOMPILES on the TPU backend: the n_split>=4
    and scan-vertical-solver (PACE_PALLAS_SIM1=0) configurations NaN
    within steps, and the spline kernel combo crashes XLA's
    fusion_emitter ("window_bounds == strides (79 vs 160)").  Bisected
    on-chip to exactly that commit (43b2ae4; f9309b0 finite, 43b2ae4
    nonfinite, per-op probes + KNOWN_ISSUES "shared-pad shift").  CPU
    and per-op numerics were bit-identical -- only whole-program TPU
    fusion breaks.

    Round 5 also measured a jnp.roll (slice+slice+concat) lowering on
    the chip: finite and digest-identical, but SLOWER everywhere
    (C48 k1/n2 101.2 vs 100.5 ms; k2/n6 375.8 vs 364.2 ms) -- the
    concats materialize just like the pads and add the wrap-copy
    bytes.  Deleted per the win-or-delete rule; do not re-try.

    Round 5 (later) also tried a 2-D shared-pad variant (ONE fixed
    (4,4) pad of both spatial axes per array, shifts as window slices
    -- a different graph from the round-3 per-(array, axis) chained
    form, hoping to dodge its fusion bug).  Per-op bit-identity held
    exhaustively, and the C48 k1/n2 step measured 93.9 ms (vs 100.5),
    but the on-chip gate killed it twice over: (a) with the Pallas SIM1
    solver the 20-step digest left the correct-program cluster by ~5%
    in u/w (finite but WRONG trajectory), and (b) with the scan solver
    the k2/n6 production config NaN'd outright (would have read
    325.6 ms).  Conclusion after three formulations across three
    rounds: THIS XLA/Mosaic revision miscompiles CSE'd shared pads
    feeding the acoustic-substep fusions in every form; the ~7 GB/step
    shift-pad census line is toolchain-blocked until an XLA update, and
    per-call slice+pad is the only correct lowering.  Do not re-land
    any shared-pad shift without the full gate (flag matrix incl.
    nosim1 + prod_k2n6 rows + digest-cluster check + JW day-9)."""
    from jax import lax

    if abs(d) > _H:
        raise ValueError(f"shift offset {d} exceeds fixed halo {_H}")
    cfg = [(0, 0, 0)] * q.ndim
    idx = [slice(None)] * q.ndim
    if d > 0:
        idx[axis] = slice(d, None)
        cfg[axis] = (0, d, 0)
    else:
        idx[axis] = slice(None, d)
        cfg[axis] = (-d, 0, 0)
    return lax.pad(q[tuple(idx)], jnp.zeros((), q.dtype), cfg)


def _axis_mask(dest: jnp.ndarray, axis: int, idxs) -> jnp.ndarray:
    """Trace-time-constant boolean mask selecting static ints/slices along
    one axis, shaped to broadcast against `dest`."""
    import numpy as np

    m = np.zeros((dest.shape[axis],), bool)
    for i in idxs:
        m[i] = True
    shape = [1] * dest.ndim
    shape[axis] = dest.shape[axis]
    return jnp.asarray(m.reshape(shape))


def upd_cols(dest: jnp.ndarray, expr: jnp.ndarray, *cols) -> jnp.ndarray:
    """dest[:, i] = expr[:, i] for static columns i (int or slice).

    Implemented as a masked select with a trace-time-constant mask: a
    `where` fuses into the surrounding elementwise XLA computation,
    whereas dynamic_update_slice (the previous form) materializes the
    full array per update — ~20 chained updates in the PPM edge handling
    made each stencil HBM-bound on its own intermediates.  `where` is
    also safe under the SPMD partitioner (docs/KNOWN_ISSUES.md covers
    why scatter is not)."""
    return jnp.where(_axis_mask(dest, 1, cols), expr, dest)


def upd_rows(dest: jnp.ndarray, expr: jnp.ndarray, *rows) -> jnp.ndarray:
    """dest[:, :, j] = expr[:, :, j] for static rows j (masked-select form)."""
    return jnp.where(_axis_mask(dest, 2, rows), expr, dest)


def upd_point(dest: jnp.ndarray, expr: jnp.ndarray, i, j) -> jnp.ndarray:
    """dest[:, i, j] = expr[:, i, j] for static int-or-slice (i, j)."""
    mask = jnp.logical_and(
        _axis_mask(dest, 1, (i,)), _axis_mask(dest, 2, (j,))
    )
    return jnp.where(mask, expr, dest)


def set_region(dest: jnp.ndarray, sx: slice, sy: slice,
               expr: jnp.ndarray) -> jnp.ndarray:
    """dest[:, sx, sy] = expr[:, sx, sy] (expr is a whole-array expression)."""
    return upd_point(dest, expr, sx, sy)


def region_add(dest, sx, sy, expr):
    """dest[:, sx, sy] += expr[:, sx, sy] (masked-select form)."""
    mask = jnp.logical_and(
        _axis_mask(dest, 1, (sx,)), _axis_mask(dest, 2, (sy,))
    )
    return jnp.where(mask, dest + expr, dest)


def sign(a, b):
    """|a| with the sign of b (Fortran SIGN; b==0 counts as positive...
    reference `sign` uses b > 0)."""
    return jnp.where(b > 0, jnp.abs(a), -jnp.abs(a))


def dim(a, b):
    return jnp.maximum(a - b, 0.0)


def absolute_value(a):
    return jnp.abs(a)


class GlobalOps:
    """Stencil ops namespace over global (6, N, N[, nz]) arrays.

    c_sw/d2a2c write their stencil math against this injected namespace
    (a holdover from the rejected row-chunked Pallas harness, whose
    BlockOps twin was deleted after failing Mosaic compile on-chip —
    see docs/KNOWN_ISSUES.md).  It survives because it keeps those ops'
    bodies parameterized over the update primitives, which the
    translate-test harness also exploits.
    """

    def shift(self, q, di=0, dj=0):
        return shift(q, di, dj)

    def upd_cols(self, dest, expr, *cols):
        return upd_cols(dest, expr, *cols)

    def upd_rows(self, dest, expr, *rows):
        return upd_rows(dest, expr, *rows)

    def upd_point(self, dest, expr, i, j):
        return upd_point(dest, expr, i, j)

    def set_region(self, dest, sx, sy, expr):
        return set_region(dest, sx, sy, expr)

    def fill_corners_cells(self, q, q_corner, n, h, direction, ncells,
                           mults=(1.0, 1.0, 1.0, 1.0)):
        from pace_tpu.ops import corners as corner_ops

        return corner_ops.fill_corners_cells(
            q, q_corner, n, h, direction, ncells,
            sw_mult=mults[0], se_mult=mults[1], nw_mult=mults[2],
            ne_mult=mults[3],
        )
