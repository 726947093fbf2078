"""Del-n (2nd/4th/6th/8th-order) damping fluxes.

jnp port of ai2cm/pace fv3core/pace/fv3core/stencils/delnflux.py
(`DelnFlux`, `DelnFluxNoSG`).  The damping order can vary per vertical level
("column namelist": nord is a (nz,) integer column, nonzero levels get
max(nord) high-order sweeps exactly as the reference's interval-specialized
stencils do); level selection is a broadcast mask instead of 4 compiled
interval variants.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from pace_tpu.ops import corners as corner_ops
from pace_tpu.ops.stencil_utils import shift


def calc_damp(damp_c_col, da_min: float, nord_col):
    """(damp_c * da_min) ** (nord + 1) per level; inputs (nz,) arrays."""
    return (damp_c_col * da_min) ** (nord_col + 1.0)


def deln_flux_nosg(q, del6_u, del6_v, rarea, nord_col, damp_col, n, h,
                   mass=None):
    """Compute (but do not apply) del-n damping fluxes fx2, fy2 of q.

    nord_col: (nz,) numpy int array (static); damp_col: (nz,) damp factors.
    Returns (fx2, fy2, d2)."""
    nord_np = np.asarray(nord_col)
    nmax = int(nord_np.max())
    mask_hi = jnp.asarray((nord_np > 0)).reshape((1, 1, 1, -1))
    damp = jnp.asarray(damp_col).reshape((1, 1, 1, -1)).astype(q.dtype)
    del6_u4 = del6_u[..., None]
    del6_v4 = del6_v[..., None]
    rarea4 = rarea[..., None]

    if mass is None:
        d2 = damp * q
    else:
        d2 = q

    def ccx(a):
        fixed = corner_ops.copy_corners(a, n, h, "x")
        return jnp.where(mask_hi, fixed, a) if nmax > 0 else a

    def ccy(a):
        fixed = corner_ops.copy_corners(a, n, h, "y")
        return jnp.where(mask_hi, fixed, a) if nmax > 0 else a

    d2 = ccx(d2)
    fx2 = del6_v4 * (shift(d2, -1) - d2)
    d2 = ccy(d2)
    fy2 = del6_u4 * (shift(d2, 0, -1) - d2)

    for _ in range(nmax):
        d2_new = (fx2 - shift(fx2, 1) + fy2 - shift(fy2, 0, 1)) * rarea4
        d2 = jnp.where(mask_hi, d2_new, d2)
        d2 = ccx(d2)
        fx2 = jnp.where(mask_hi, -del6_v4 * (shift(d2, -1) - d2), fx2)
        d2 = ccy(d2)
        fy2 = jnp.where(mask_hi, -del6_u4 * (shift(d2, 0, -1) - d2), fy2)

    return fx2, fy2, d2


def deln_flux(
    q, fx, fy, gd, nord_col, damp_c_col, n, h, mass=None,
):
    """Compute del-n damping fluxes of q and add them to fx/fy
    (reference DelnFlux.__call__). nord_col/damp_c_col are (nz,) numpy
    arrays (static). Returns (fx, fy)."""
    damp_c_np = np.asarray(damp_c_col)
    if (damp_c_np <= 1e-4).all():
        return fx, fy
    damp_col = calc_damp(damp_c_np, gd.damping.da_min, np.asarray(nord_col))
    fx2, fy2, _ = deln_flux_nosg(
        q, gd.damping.del6_u, gd.damping.del6_v, gd.horizontal.rarea,
        nord_col, damp_col, n, h, mass=mass,
    )
    if mass is None:
        return fx + fx2, fy + fy2
    damp4 = jnp.asarray(damp_col).reshape((1, 1, 1, -1)).astype(q.dtype)
    fx = fx + 0.5 * damp4 * (shift(mass, -1) + mass) * fx2
    fy = fy + 0.5 * damp4 * (shift(mass, 0, -1) + mass) * fy2
    return fx, fy
