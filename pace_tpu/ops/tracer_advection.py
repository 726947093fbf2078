"""Sub-cycled 2D tracer advection (tracer_2d_1l).

jnp port of ai2cm/pace fv3core/pace/fv3core/stencils/tracer_2d_1l.py
`TracerAdvection`.  As in the reference, the global Courant reduction is
fixed at cmax = 2.0 giving exactly 3 substeps by default
(tracer_2d_1l.py:340).  `dynamic_subcycle=True` restores the Fortran
model's data-dependent split that the reference commented out
(tracer_2d_1l.py:312-338): the global max Courant number is reduced
in-graph (a plain jnp.max — GSPMD turns it into the cross-device
collective the reference needed MPI allreduce for) and the substep loop
becomes a lax.while_loop with a dynamic trip count, so quiescent flow
pays for one substep instead of three."""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from pace_tpu.ops.fvtp2d import fv_tp_2d
from pace_tpu.ops.stencil_utils import shift, _shift_axis
from pace_tpu.parallel import halo as halo_mod


def shift_b(q, di: int = 0, dj: int = 0):
    """shift() for tracer stacks (T, 6, N, N, nz): i, j are axes 2, 3."""
    out = q
    if di:
        out = _shift_axis(out, di, 2)
    if dj:
        out = _shift_axis(out, dj, 3)
    return out


def tracer_advection(
    tracers: dict, dp1, x_mass_flux, y_mass_flux, x_courant, y_courant,
    gd, topo, n, h, hord_tr, dynamic_subcycle: bool = False,
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

    if dynamic_subcycle:
        # global max Courant over the compute domain (halo padding can
        # legitimately hold NaN, so slice before reducing); under a
        # sharded mesh the max lowers to the cross-device reduction the
        # reference needed an MPI allreduce for (tracer_2d_1l.py:323)
        cx_i = jnp.abs(x_courant[:, h:h + n + 1, h:h + n])
        cy_i = jnp.abs(y_courant[:, h:h + n, h:h + n + 1])
        cmax_dyn = jnp.maximum(cx_i.max(), cy_i.max())
        n_split_dyn = jnp.maximum(
            jnp.floor(1.0 + cmax_dyn), 1.0
        ).astype(jnp.int32)
        frac = 1.0 / n_split_dyn.astype(dp1.dtype)
        n_split = None
    else:
        cmax = 2.0
        n_split = math.floor(1.0 + cmax)
        frac = 1.0 / n_split
    x_courant = x_courant * frac
    xfx = xfx * frac
    x_mass_flux = x_mass_flux * frac
    y_courant = y_courant * frac
    yfx = yfx * frac
    y_mass_flux = y_mass_flux * frac

    names = list(tracers.keys())
    # keep the tracers STACKED through all substeps: batched gathers and one
    # batched transport graph instead of per-tracer ops (the dycore is
    # HBM-bound; 8x fewer gather kernels per exchange).  The halo exchange
    # and the two FvTp2d corner copies are composed into two independent
    # gathers (topology.scalar_corner_specs) — the transport never needs the
    # bare halo-updated field, only its corner-copied variants, and q_y
    # equals it everywhere outside the corner wedges.
    stacked = jnp.stack([tracers[name] for name in names])
    from pace_tpu.parallel import copyops

    # jax.vmap hands tracers to the halo-traffic recorder's on_result
    # (np.asarray on a BatchTracer raises), so recorded debug runs take a
    # per-tracer python loop instead — identical math, eager-friendly
    _vmap = jax.vmap
    if halo_mod._RECORDER is not None:
        def _vmap(f):
            return lambda q8: jnp.stack([f(q8[i]) for i in range(len(names))])

    if copyops.structured_enabled():
        # multi-chip lowering: structured halo + corner stages (static
        # slice copies -> neighbor collective-permutes under SPMD); q_x is
        # one extra corner stage on top of q_y (spec_x = corner_x o
        # corner_y o halo), so feed q_y into gather_x.
        from pace_tpu.ops import corners as corners_mod

        center = topo.scalar_spec("center")
        gather_y = _vmap(lambda q: corners_mod.copy_corners(
            halo_mod.halo_update_scalar(q, center), n, h, "y"))
        gather_x = _vmap(
            lambda q: corners_mod.copy_corners(q, n, h, "x"))
        x_from_y = True
    else:
        spec_y, spec_x = topo.scalar_corner_specs()
        gather_y = _vmap(lambda q: halo_mod.halo_update_scalar(q, spec_y))
        gather_x = _vmap(lambda q: halo_mod.halo_update_scalar(q, spec_x))
        x_from_y = False

    from pace_tpu.ops.pallas import fvtp2d_pallas

    use_pallas = fvtp2d_pallas.enabled(dp1.dtype)

    def transport_fluxes(qy8, qx8):
        if use_pallas:
            return fvtp2d_pallas.transport_batched(
                qy8, qx8, x_courant, y_courant, xfx, yfx,
                x_mass_flux, y_mass_flux,
                hz.dxa, hz.dya, hz.area, n, h, hord_tr,
            )
        return jax.vmap(
            lambda q_y, q_x: fv_tp_2d(
                q_y, x_courant, y_courant, xfx, yfx, gd, n, h, hord_tr,
                x_mass_flux=x_mass_flux, y_mass_flux=y_mass_flux,
                q_y=q_y, q_x=q_x,
            )
        )(qy8, qx8)

    def substep(stacked, dp1):
        dp2 = dp1 + (
            x_mass_flux - shift(x_mass_flux, 1)
            + y_mass_flux - shift(y_mass_flux, 0, 1)
        ) * rarea
        qy8 = gather_y(stacked)
        fx8, fy8 = transport_fluxes(
            qy8, gather_x(qy8 if x_from_y else stacked))
        stacked = (
            qy8 * dp1
            + (fx8 - shift_b(fx8, 1) + fy8 - shift_b(fy8, 0, 1)) * rarea
        ) / dp2
        return stacked, dp2

    if dynamic_subcycle:
        def body(carry):
            it, stacked, dp1 = carry
            stacked, dp2 = substep(stacked, dp1)
            return it + 1, stacked, dp2

        _, stacked, _ = jax.lax.while_loop(
            lambda c: c[0] < n_split_dyn, body,
            (jnp.int32(0), stacked, dp1),
        )
    else:
        for it in range(n_split):
            stacked, dp2 = substep(stacked, dp1)
            if it != n_split - 1:
                dp1 = dp2
    return {name: stacked[i] for i, name in enumerate(names)}
