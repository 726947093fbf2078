"""Static rectangle-copy decomposition of halo/corner index maps.

Every cross-tile halo transform and cube-corner wedge fill in the
framework is an affine signed permutation of storage indices (see
parallel/topology.py EdgeTransform, ops/corners.py tables).  This module
expresses those maps as `CopyOp`s — static slice → flip → transpose →
dynamic_update_slice — instead of whole-array gathers.  All-static
shapes mean XLA's SPMD partitioner lowers the tile-edge traffic to
neighbor collective-permutes over ICI (the multi-chip form, matching the
reference's neighbor-wise HaloUpdater, ai2cm/pace
util/pace/util/halo_updater.py:217-300) rather than generic cross-device
gathers.

The CopyOp lowering is the DEFAULT everywhere (2026-08-19): it is both
the SPMD form and faster single-chip than the whole-array gather
(105.4 vs 107.5 ms/step C48 f32 — the gather pays ~2 relayout copies
per halo update on TPU).  PACE_HALO=gather selects the old lowering.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Tuple

import jax.numpy as jnp
import numpy as np
from jax import lax

# Halo/corner lowering mode (PACE_HALO):
#   "ppermute" — CopyOp decomposition (default: SPMD-friendly AND faster
#                single-chip — 105.4 vs 107.5 ms/step C48 f32 on the TPU
#                (2026-08-19); the 3-index-array gather pays ~2 relayout
#                copies per halo update on TPU, ~192 gathers/step)
#   "gather"   — whole-array gathers (previous default)
# (A "packed" strip-gather lowering existed through round 3; it measured
# 2.2 ms/step slower than ppermute at C48 f32 and was removed —
# VERDICT r3 #10.)
# Read dynamically (module attribute) so tests can flip it at runtime.
# Golden digests hold under both lowerings (copies are exact; the f64
# 1e-9-of-scale pin passes with either mode).
HALO_MODE = os.environ.get("PACE_HALO", "ppermute")
if HALO_MODE in ("structured", "strips"):
    HALO_MODE = "ppermute"


_INITIAL_MODE = HALO_MODE


def structured_enabled() -> bool:
    return HALO_MODE == "ppermute"


def select_default_for_mesh(n_devices: int) -> None:
    """Driver hook: default to the structured (ppermute) lowering for a
    multi-device mesh — unless the user already chose a mode, via the
    PACE_HALO env var or by assigning HALO_MODE programmatically (both
    always win; this only replaces the import-time default)."""
    global HALO_MODE
    if os.environ.get("PACE_HALO") is not None:
        return
    if HALO_MODE != _INITIAL_MODE:
        return
    if n_devices > 1:
        HALO_MODE = "ppermute"


@dataclasses.dataclass(frozen=True)
class CopyOp:
    """One affine rectangle copy with static bounds.

    dst[dst_tile, di0:di1, dj0:dj1] = sign * T(src[src_tile, si0:si1,
    sj0:sj1]) where T applies flip_i (block axis 0), flip_j (block axis
    1), then transpose.  With all_tiles=True the op applies to every tile
    at once (intra-tile corner fills, identical on all 6 tiles) and the
    tile fields are ignored."""

    dst_tile: int
    dst_i: Tuple[int, int]
    dst_j: Tuple[int, int]
    src_tile: int
    src_i: Tuple[int, int]
    src_j: Tuple[int, int]
    transpose: bool
    flip_i: bool
    flip_j: bool
    comp: int = 0       # source-array selector (0=u-like, 1=v-like)
    sign: float = 1.0
    all_tiles: bool = False


def _pad_band(out, band, di, dj, N):
    """Zero-pad a (6, Di, Dj, ...) band to the full (6, N, N, ...)
    storage shape at rows di, cols dj."""
    extra = out.ndim - 3
    cfg = [(0, 0, 0), (di[0], N - di[1], 0), (dj[0], N - dj[1], 0)]
    cfg += [(0, 0, 0)] * extra
    return lax.pad(band, jnp.zeros((), band.dtype), cfg)


def _band_write(out, band, di, dj, N):
    """Write a (6, Di, Dj, ...) band at rows di, cols dj of every tile
    via lax.pad + a static-mask select.

    This exact formulation is what makes the SPMD lowering optimal:
    measured on an 8-device (2,2,2) mesh (C48/79 scalar halo), a
    per-tile dynamic_update_slice chain costs 17.8 MB of collectives
    (XLA all-gathers the operand spatially), while pad+select lowers to
    pure neighbor collective-permutes totalling ~1 MB ≈ the halo
    surface.  Pad with static config partitions locally; the constant
    mask is replicated."""
    extra = out.ndim - 3
    padded = _pad_band(out, band, di, dj, N)
    mask = np.zeros((1, N, N) + (1,) * extra, bool)
    mask[:, di[0]:di[1], dj[0]:dj[1]] = True
    return jnp.where(jnp.asarray(mask), padded, out)


def _combined_band_write(out, writes, N):
    """Write several DISJOINT bands with ONE full-array select.

    The per-band `_band_write` chain materializes a full-array copy per
    band — the C48 census' top HBM line (1.94 GB/step of band selects,
    VERDICT r3 #4).  Summing the zero-padded bands first turns the
    whole program into pads + an add tree + one select, which XLA fuses
    into a single full-array traversal; under SPMD the pads still
    partition locally and lower to the same neighbor
    collective-permutes (pinned by tests/test_collective_bytes.py)."""
    extra = out.ndim - 3
    acc = None
    mask = np.zeros((1, N, N) + (1,) * extra, bool)
    for band, di, dj in writes:
        padded = _pad_band(out, band, di, dj, N)
        acc = padded if acc is None else acc + padded
        mask[:, di[0]:di[1], dj[0]:dj[1]] = True
    return jnp.where(jnp.asarray(mask), acc, out)


def _write_style() -> str:
    """Band write lowering: "select" (pad + masked select, default —
    SPMD-optimal AND byte-cheapest) or "dus" (static
    dynamic_update_slice chain).  Measured on the chip (C48 f32,
    2026-08-20): dus 91.7 ms/step vs select 93.2 — inside run-to-run
    noise — but the census charges the DUS chain 6.5 GB/step of
    layout copies (XLA does NOT update in place; each DUS pays a
    copy-on-write) vs 1.9 GB for the fused selects, and DUS under SPMD
    all-gathers operands (17.8 MB of collectives per C48 scalar halo).
    PACE_HALO_WRITE=dus re-enables the experiment."""
    return os.environ.get("PACE_HALO_WRITE", "select")


def apply_copy_ops(sources, out, ops, apply_sign: bool = True):
    """Apply a CopyOp program: out[dst] = sign * T(sources[comp][src]).

    `sources` is a tuple of (6, N, N, ...) arrays indexed by op.comp (one
    entry for scalars, (u, v) for vectors).  Reads come from the original
    arrays — halo/corner sources are owned points, never written by the
    same program — matching the gather semantics.

    SPMD-friendly evaluation strategy (see _band_write): source rects
    are extracted as whole-tile-axis local slices (small strip arrays ≈
    halo surface), per-tile strips are selected/transformed from those
    and stacked into per-destination-rect bands, and each band is
    written with pad + masked select.  Under a (tile, x, y) mesh the
    whole update lowers to neighbor collective-permutes at
    halo-surface bytes — the reference's neighbor-wise exchange
    (halo_updater.py:217-300) — instead of the generic gather's
    volume-sized all-reduces."""
    N = out.shape[1]

    def transform(strip, op, taxes=(0, 1)):
        if op.flip_i:
            strip = jnp.flip(strip, taxes[0])
        if op.flip_j:
            strip = jnp.flip(strip, taxes[1])
        if op.transpose:
            strip = jnp.swapaxes(strip, taxes[0], taxes[1])
        if apply_sign and op.sign != 1.0:
            strip = strip * jnp.asarray(op.sign, dtype=strip.dtype)
        return strip

    # collect every band write of the program; if their destination
    # rects are pairwise disjoint (true for all current halo/corner
    # programs) they combine into ONE full-array select
    pending = []  # (band, di, dj)

    # intra-tile (all_tiles) ops are already tile-uniform bands
    for op in ops:
        if op.all_tiles:
            strip = sources[op.comp][:, op.src_i[0]:op.src_i[1],
                                     op.src_j[0]:op.src_j[1]]
            pending.append(
                (transform(strip, op, taxes=(1, 2)), op.dst_i, op.dst_j))

    cross = [op for op in ops if not op.all_tiles]
    if cross:
        # distinct source rects, sliced across ALL tiles (local slices)
        rects = {}
        for op in cross:
            key = (op.comp, op.src_i, op.src_j)
            if key not in rects:
                rects[key] = sources[op.comp][
                    :, op.src_i[0]:op.src_i[1], op.src_j[0]:op.src_j[1]
                ]

        # group by destination rect; halo programs have one op per tile
        groups = {}
        for op in cross:
            groups.setdefault((op.dst_i, op.dst_j), {})[op.dst_tile] = op
        for (di, dj), by_tile in groups.items():
            if len(by_tile) != 6:
                # irregular program: sequential per-tile writes (correct
                # but not SPMD-optimal; not hit by any current spec)
                for t, op in sorted(by_tile.items()):
                    strip = transform(
                        rects[(op.comp, op.src_i, op.src_j)][op.src_tile],
                        op)
                    zeros = (0,) * (out.ndim - 3)
                    out = lax.dynamic_update_slice(
                        out, strip[None],
                        (op.dst_tile, di[0], dj[0]) + zeros)
                continue
            band = jnp.stack([
                transform(
                    rects[(op.comp, op.src_i, op.src_j)][op.src_tile], op)
                for _, op in sorted(by_tile.items())
            ])
            pending.append((band, di, dj))

    if not pending:
        return out
    if _write_style() == "dus":
        zeros = (0,) * (out.ndim - 3)
        for band, di, dj in pending:
            out = lax.dynamic_update_slice(
                out, band, (0, di[0], dj[0]) + zeros)
        return out
    # disjointness is static (np); overlapping programs (none today)
    # fall back to sequential selects
    cover = np.zeros((N, N), np.int32)
    for _, di, dj in pending:
        cover[di[0]:di[1], dj[0]:dj[1]] += 1
    if cover.max() <= 1:
        return _combined_band_write(out, pending, N)
    for band, di, dj in pending:
        out = _band_write(out, band, di, dj, N)
    return out


def fit_copy_op(ti, tj, si, sj, comp: int = 0, sign: float = 1.0,
                all_tiles: bool = True) -> CopyOp:
    """Fit one CopyOp to a sparse point-pair table whose destination
    points form a full rectangle and whose map is an affine signed
    permutation.  Verified exactly; raises if the table doesn't fit."""
    ti = np.asarray(ti, np.int64); tj = np.asarray(tj, np.int64)
    si = np.asarray(si, np.int64); sj = np.asarray(sj, np.int64)
    i0, i1 = int(ti.min()), int(ti.max()) + 1
    j0, j1 = int(tj.min()), int(tj.max()) + 1
    if len(ti) != (i1 - i0) * (j1 - j0):
        raise ValueError("destination points do not form a full rectangle")
    lookup = {}
    for k in range(len(ti)):
        key = (int(ti[k]), int(tj[k]))
        if key in lookup:
            raise ValueError(f"duplicate destination point {key}")
        lookup[key] = k
    p0 = lookup[(i0, j0)]

    def coeffs(tbl):
        a_i = int(tbl[lookup[(i0 + 1, j0)]] - tbl[p0]) if i1 - i0 > 1 else 0
        a_j = int(tbl[lookup[(i0, j0 + 1)]] - tbl[p0]) if j1 - j0 > 1 else 0
        c = int(tbl[p0]) - a_i * i0 - a_j * j0
        return a_i, a_j, c

    a00, a01, ci = coeffs(si)
    a10, a11, cj = coeffs(sj)
    if not ((si == a00 * ti + a01 * tj + ci).all()
            and (sj == a10 * ti + a11 * tj + cj).all()):
        raise ValueError("table is not affine over the rectangle")
    # Transposing evidence: src i varies with dest j, or src j with dest i.
    # (checking only a01 misses degenerate 1-wide rects where dest j is
    # constant but the map still swaps axes, e.g. corner cell lines)
    transposing = (a01 != 0) or (a10 != 0)
    straight = (a00 != 0) or (a11 != 0)
    if transposing and straight:
        raise ValueError("map mixes transposed and straight axes")
    transpose = transposing
    if transpose:
        flip_i, flip_j = a01 < 0, a10 < 0
    else:
        flip_i, flip_j = a00 < 0, a11 < 0
    op = CopyOp(
        dst_tile=0, dst_i=(i0, i1), dst_j=(j0, j1),
        src_tile=0,
        src_i=(int(si.min()), int(si.max()) + 1),
        src_j=(int(sj.min()), int(sj.max()) + 1),
        transpose=transpose, flip_i=flip_i, flip_j=flip_j,
        comp=comp, sign=float(sign), all_tiles=all_tiles,
    )
    block = (op.src_i[1] - op.src_i[0], op.src_j[1] - op.src_j[0])
    if transpose:
        block = block[::-1]
    assert block == (i1 - i0, j1 - j0), (
        f"block shape {block} does not match destination rect")
    return op


def fit_copy_ops_by_quadrant(ti, tj, si, sj, N: int, comp=None, sign=None):
    """Decompose a sparse corner-fill table into per-quadrant CopyOps.

    Corner wedges are disjoint rectangles, one per cube corner; grouping
    destinations by quadrant of the (N, N) plane separates them.  `comp`
    and `sign` may be per-point arrays — each (quadrant, comp, sign)
    combination becomes its own op."""
    ti = np.asarray(ti); tj = np.asarray(tj)
    comp_arr = np.zeros(len(ti), np.int64) if comp is None else np.asarray(comp)
    sign_arr = np.ones(len(ti)) if sign is None else np.asarray(sign)
    c = N // 2
    groups = {}
    for k in range(len(ti)):
        key = (ti[k] >= c, tj[k] >= c, int(comp_arr[k]), float(sign_arr[k]))
        groups.setdefault(key, []).append(k)
    ops = []
    for (_, _, comp_k, sign_k), idx in sorted(groups.items()):
        idx = np.asarray(idx)
        ops.append(fit_copy_op(
            ti[idx], tj[idx], np.asarray(si)[idx], np.asarray(sj)[idx],
            comp=comp_k, sign=sign_k,
        ))
    return tuple(ops)
