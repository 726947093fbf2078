"""A-grid physics wind tendencies -> D-grid wind update.

jnp port of ai2cm/pace stencils/pace/stencils/update_dwind_phys.py
`AGrid2DGridPhysics` (Fortran update_dwinds_phys): geographic (east/north)
A-grid tendencies are lifted to 3D cartesian vectors via vlon/vlat,
averaged to the D-grid wind points, corrected along tile edges with the
edge_vect interpolation factors, and projected onto the local es1/ew2
basis vectors.

Whole-tile global-view: every tile owns all four edges, so the reference's
rank-dependent edge-region bookkeeping (update_dwind_phys.py:157-420)
collapses to four static slices; the half-tile split at im2/jm2 picks which
neighbour the edge interpolation leans on.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from pace_tpu.ops.stencil_utils import shift
from pace_tpu.parallel import halo as halo_mod


def _edge_neighbor_index(n: int, h: int, N: int):
    """Cell j uses neighbor j+1 in the lower half-tile, j-1 in the upper
    (reference jm2 = (npy-1)/2 + 2 split, update_dwind_phys.py:233-258)."""
    idx = np.arange(N)
    lower = idx < h + n // 2
    return np.where(lower, np.clip(idx + 1, 0, N - 1),
                    np.clip(idx - 1, 0, N - 1))


def update_dwind_phys(u, v, u_dt, v_dt, gd, topo, n, h, dt):
    """Returns (u, v) with dt * tendencies applied on the D-grid."""
    hz = gd.horizontal
    center = topo.scalar_spec("center")
    # geographic components are frame-invariant across tile edges, so a
    # scalar exchange is correct (the reference uses scalar halo updaters
    # for u_dt/v_dt, fv_update_phys.py:137-148)
    u_dt = halo_mod.halo_update_scalar(u_dt, center)
    v_dt = halo_mod.halo_update_scalar(v_dt, center)

    # 3D cartesian tendency at cell centers: (6, N, N, nz, 3)
    vlon = hz.vlon[:, :, :, None, :]
    vlat = hz.vlat[:, :, :, None, :]
    v3 = u_dt[..., None] * vlon + v_dt[..., None] * vlat

    # average to wind points: ue at y-interfaces, ve at x-interfaces
    ue = shift(v3, 0, -1) + v3
    ve = shift(v3, -1) + v3

    nbr = _edge_neighbor_index(n, h, u.shape[1])
    # west/east tile edges correct ve along the edge columns
    evw = hz.edge_vect_w[:, :, None, None]
    eve = hz.edge_vect_e[:, :, None, None]
    for i_col, ev in ((h, evw), (h + n, eve)):
        col = ve[:, i_col]
        vt = ev * col[:, nbr] + (1.0 - ev) * col
        ve = ve.at[:, i_col].set(vt)
    # south/north tile edges correct ue along the edge rows
    evs = hz.edge_vect_s[:, :, None, None]
    evn = hz.edge_vect_n[:, :, None, None]
    for j_row, ev in ((h, evs), (h + n, evn)):
        row = ue[:, :, j_row]
        ut = ev * row[:, nbr] + (1.0 - ev) * row
        ue = ue.at[:, :, j_row].set(ut)

    dt5 = 0.5 * dt
    du = dt5 * (ue * hz.es1[:, :, :, None, :]).sum(-1)
    dv = dt5 * (ve * hz.ew2[:, :, :, None, :]).sum(-1)

    # apply only on the active wind points
    N = u.shape[1]
    iidx = np.arange(N)
    cells = (iidx >= h) & (iidx < h + n)
    ifaces = (iidx >= h) & (iidx <= h + n)
    mask_u = jnp.asarray(
        cells[:, None] & ifaces[None, :]
    ).reshape(1, N, N, 1)
    mask_v = jnp.asarray(
        ifaces[:, None] & cells[None, :]
    ).reshape(1, N, N, 1)
    u = jnp.where(mask_u, u + du, u)
    v = jnp.where(mask_v, v + dv, v)
    return u, v
