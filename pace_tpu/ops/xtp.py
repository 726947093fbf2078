"""PPM advection of D-grid winds along their own direction (xtp_u / ytp_v).

jnp ports of ai2cm/pace fv3core/pace/fv3core/stencils/xtp_u.py
`advect_u_along_x` and ytp_v.py `advect_v_along_y` (used inline by d_sw's
kinetic-energy computation).
"""

from __future__ import annotations

import jax.numpy as jnp

from pace_tpu.ops import xppm
from pace_tpu.ops.stencil_utils import shift


def advect_u_along_x(u, ub_contra, rdx, dx, dxa, dt, n, h, iord):
    """u advected to cell corners by the contravariant corner wind."""
    if abs(iord) < 8:
        al = xppm._compute_al(u, dx, n, h, iord)
        bl = al - u
        br = shift(al, 1) - u
    else:
        # xtp_u applies the PPM constraint only on the i_start+1 and
        # i_end-1 columns (xtp_u.py get_bl_br), unlike xppm
        bl, br = xppm._compute_blbr_ord8plus(
            u, dxa, n, h, constraint_cols=(h + 1, h + n - 2)
        )
    # zero corners: (i in {h-1, h} or {h+n-1, h+n}) x (j in {h, h+n})
    for i in (h - 1, h, h + n - 1, h + n):
        for j in (h, h + n):
            bl = bl.at[:, i, j].set(0.0)
            br = br.at[:, i, j].set(0.0)
    b0 = bl + br
    cfl = jnp.where(
        ub_contra > 0.0, ub_contra * dt * shift(rdx, -1), ub_contra * dt * rdx
    )
    fx0 = xppm._fx1_fn(cfl, br, b0, bl)
    if abs(iord) < 8:
        if abs(iord) == 5:
            smt5 = bl * br < 0.0
        else:
            smt5 = (3.0 * jnp.abs(b0)) < jnp.abs(bl - br)
        mask = jnp.where(jnp.logical_or(shift(smt5, -1), smt5), 1.0, 0.0)
    else:
        mask = 1.0
    return jnp.where(
        ub_contra > 0.0, shift(u, -1) + fx0 * mask, u + fx0 * mask
    )


def _t(q):
    return jnp.swapaxes(q, 1, 2)


def advect_v_along_y(v, vb_contra, rdy, dy, dya, dt, n, h, jord):
    return _t(advect_u_along_x(
        _t(v), _t(vb_contra), _t(rdy), _t(dy), _t(dya), dt, n, h, jord
    ))
