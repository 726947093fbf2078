"""Lane-axis padding for the vertical-solver kernels.

Mosaic requires any slice whose extent lies on the LANE (last) axis to be
128-aligned; dynamic-k ref reads/stores inside the solver kernels
(`ref[:, k]`) slice full lane rows, so the lane extent itself must be a
multiple of 128 (measured on hardware: "Slice shape along dimension N
must be aligned to tiling (128), but is 56").  The solvers are strictly
lane-independent (every column is its own tridiagonal system), so padding
the lane axis by edge replication is exact: padded columns compute valid
garbage that is sliced away afterward.
"""

from __future__ import annotations

import jax.numpy as jnp

LANE = 128


def pad_lanes(q, mult: int = LANE):
    """Pad the last axis of q up to a multiple of `mult` by edge
    replication.  Returns (padded, original_extent)."""
    nj = q.shape[-1]
    njp = -(-nj // mult) * mult
    if njp == nj:
        return q, nj
    pad = [(0, 0)] * (q.ndim - 1) + [(0, njp - nj)]
    return jnp.pad(q, pad, mode="edge"), nj


def padded_extent(nj: int, mult: int = LANE) -> int:
    return -(-nj // mult) * mult
