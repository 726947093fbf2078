"""2D finite-volume flux-form transport (fv_tp_2d).

jnp port of ai2cm/pace fv3core/pace/fv3core/stencils/fvtp2d.py
`FiniteVolumeTransport`: directionally-split PPM transport (Putman & Lin
2007 eq. 16-18, FV3 docs eq. 4.17-4.18) with optional fused del-n damping.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from pace_tpu.ops import corners as corner_ops
from pace_tpu.ops.delnflux import deln_flux
from pace_tpu.ops.stencil_utils import shift
from pace_tpu.ops.xppm import x_flux, y_flux


def fv_tp_2d(
    q,
    crx,
    cry,
    x_area_flux,
    y_area_flux,
    gd,
    n: int,
    h: int,
    hord: int,
    nord_col=None,
    damp_c_col=None,
    x_mass_flux=None,
    y_mass_flux=None,
    mass=None,
    q_y=None,
    q_x=None,
):
    """Compute transport fluxes (q_x_flux, q_y_flux) of q.

    Args:
        q: transported scalar (6, N, N, nz)
        crx/cry: Courant numbers on x/y interfaces
        x_area_flux/y_area_flux: area fluxes [m^2]
        hord: PPM order (ord_inner = 8 if hord == 10 else hord)
        nord_col/damp_c_col: optional (nz,) damping columns (fused DelnFlux)
        x_mass_flux/y_mass_flux: if given, the output flux units are q*mass
        q_y/q_x: optionally precomputed corner copies (copy_corners(q, "y")
            and copy_corners(copy_corners(q, "y"), "x")) — the tracer path
            fuses these into its halo-exchange gathers
    """
    area = gd.horizontal.area[..., None]
    dxa = gd.horizontal.dxa[..., None]
    dya = gd.horizontal.dya[..., None]
    ord_outer = hord
    ord_inner = 8 if hord == 10 else hord

    x_unit_flux = x_area_flux if x_mass_flux is None else x_mass_flux
    y_unit_flux = y_area_flux if y_mass_flux is None else y_mass_flux

    if q_y is None:
        q_y = corner_ops.copy_corners(q, n, h, "y")
    q_y_advected_mean = y_flux(q_y, cry, dya, n, h, ord_inner)
    fyy = y_area_flux * q_y_advected_mean
    q_advected_y = (q_y * area + fyy - shift(fyy, 0, 1)) / (
        area + y_area_flux - shift(y_area_flux, 0, 1)
    )
    q_advected_y_x_advected_mean = x_flux(
        q_advected_y, crx, dxa, n, h, ord_outer
    )

    if q_x is None:
        q_x = corner_ops.copy_corners(q_y, n, h, "x")
    q_x_advected_mean = x_flux(q_x, crx, dxa, n, h, ord_inner)
    fx1 = x_area_flux * q_x_advected_mean
    q_advected_x = (q_x * area + fx1 - shift(fx1, 1)) / (
        area + x_area_flux - shift(x_area_flux, 1)
    )
    q_advected_x_y_advected_mean = y_flux(
        q_advected_x, cry, dya, n, h, ord_outer
    )

    q_x_flux = 0.5 * (
        q_advected_y_x_advected_mean + q_x_advected_mean
    ) * x_unit_flux
    q_y_flux = 0.5 * (
        q_advected_x_y_advected_mean + q_y_advected_mean
    ) * y_unit_flux

    if nord_col is not None and damp_c_col is not None:
        q_x_flux, q_y_flux = deln_flux(
            q_x, q_x_flux, q_y_flux, gd, nord_col, damp_c_col, n, h, mass=mass
        )
    return q_x_flux, q_y_flux
