"""Sub-cycled 2D tracer advection (tracer_2d_1l).

jnp port of ai2cm/pace fv3core/pace/fv3core/stencils/tracer_2d_1l.py
`TracerAdvection`.  As in the reference, the global Courant reduction is
fixed at cmax = 2.0 giving exactly 3 substeps (tracer_2d_1l.py:340); the
dynamic `pmax` reduction is a cheap future upgrade on TPU.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from pace_tpu.ops.fvtp2d import fv_tp_2d
from pace_tpu.ops.stencil_utils import shift
from pace_tpu.parallel import halo as halo_mod


def tracer_advection(
    tracers: dict, dp1, x_mass_flux, y_mass_flux, x_courant, y_courant,
    gd, topo, n, h, hord_tr,
):
    """Advect tracers (dict of (6,N,N,nz) arrays). Returns updated dict."""
    hz, ang = gd.horizontal, gd.angle
    dxa = hz.dxa[..., None]
    dya = hz.dya[..., None]
    dx = hz.dx[..., None]
    dy = hz.dy[..., None]
    sin1 = ang.sin_sg[..., 0][..., None]
    sin2 = ang.sin_sg[..., 1][..., None]
    sin3 = ang.sin_sg[..., 2][..., None]
    sin4 = ang.sin_sg[..., 3][..., None]
    rarea = hz.rarea[..., None]

    xfx = jnp.where(
        x_courant > 0.0,
        x_courant * shift(dxa, -1) * dy * shift(sin3, -1),
        x_courant * dxa * dy * sin1,
    )
    yfx = jnp.where(
        y_courant > 0.0,
        y_courant * shift(dya, 0, -1) * dx * shift(sin4, 0, -1),
        y_courant * dya * dx * sin2,
    )

    cmax = 2.0
    n_split = math.floor(1.0 + cmax)
    frac = 1.0 / n_split
    x_courant = x_courant * frac
    xfx = xfx * frac
    x_mass_flux = x_mass_flux * frac
    y_courant = y_courant * frac
    yfx = yfx * frac
    y_mass_flux = y_mass_flux * frac

    center = topo.scalar_spec("center")
    names = list(tracers.keys())
    # keep the tracers STACKED through all substeps: one batched halo
    # gather and one batched transport graph instead of per-tracer ops
    # (the dycore is HBM-bound; 8x fewer gather kernels per exchange)
    stacked = jnp.stack([tracers[name] for name in names])
    batched_halo = jax.vmap(
        lambda q: halo_mod.halo_update_scalar(q, center)
    )
    stacked = batched_halo(stacked)

    def transport_one(q, dp1_, dp2_):
        fx, fy = fv_tp_2d(
            q, x_courant, y_courant, xfx, yfx, gd, n, h, hord_tr,
            x_mass_flux=x_mass_flux, y_mass_flux=y_mass_flux,
        )
        return (
            q * dp1_ + (fx - shift(fx, 1) + fy - shift(fy, 0, 1)) * rarea
        ) / dp2_

    for it in range(n_split):
        last_call = it == n_split - 1
        dp2 = dp1 + (
            x_mass_flux - shift(x_mass_flux, 1)
            + y_mass_flux - shift(y_mass_flux, 0, 1)
        ) * rarea
        stacked = jax.vmap(transport_one, in_axes=(0, None, None))(
            stacked, dp1, dp2
        )
        if not last_call:
            stacked = batched_halo(stacked)
            dp1 = dp2
    return {name: stacked[i] for i, name in enumerate(names)}
