"""C-grid shallow-water half-step (c_sw).

jnp port of ai2cm/pace fv3core/pace/fv3core/stencils/c_sw.py
`CGridShallowWaterDynamics`: advances C-grid winds (and delp/pt on the
C-grid) by half a timestep to provide advective fluxes for the D-grid step.
"""

from __future__ import annotations

import jax.numpy as jnp

from pace_tpu.ops import corners as corner_ops
from pace_tpu.ops.d2a2c import d2a2c_vect
from pace_tpu.ops.stencil_utils import shift
from pace_tpu.ops import stencil_utils as su


def _sg(ang, i):
    return ang.sin_sg[..., i - 1][..., None], ang.cos_sg[..., i - 1][..., None]


def divergence_corner(u, v, ua, va, gd, n, h):
    """D-grid divergence at cell corners (for divergence damping)."""
    hz, ang = gd.horizontal, gd.angle
    dxc = hz.dxc[..., None]
    dyc = hz.dyc[..., None]
    rarea_c = hz.rarea_c[..., None]
    sin1, cos1 = _sg(ang, 1)
    sin2, cos2 = _sg(ang, 2)
    sin3, cos3 = _sg(ang, 3)
    sin4, cos4 = _sg(ang, 4)

    uf = (
        (u - 0.25 * (shift(va, 0, -1) + va) * (shift(cos4, 0, -1) + cos2))
        * dyc * 0.5 * (shift(sin4, 0, -1) + sin2)
    )
    vf = (
        (v - 0.25 * (shift(ua, -1) + ua) * (shift(cos3, -1) + cos1))
        * dxc * 0.5 * (shift(sin3, -1) + sin1)
    )
    divg_d = (shift(vf, 0, -1) - vf + shift(uf, -1) - uf) * rarea_c

    # tile-edge variants: on edges the cross terms drop (uf/vf use the raw
    # covariant wind there)
    uf0 = u * dyc * 0.5 * (shift(sin4, 0, -1) + sin2)
    vf0 = v * dxc * 0.5 * (shift(sin3, -1) + sin1)
    # west/east interface columns (i = h, h+n)
    col = (shift(vf0, 0, -1) - vf0 + shift(uf, -1) - uf) * rarea_c
    divg_d = su.upd_cols(divg_d, col, h)
    divg_d = su.upd_cols(divg_d, col, h + n)
    # south/north rows (j = h, h+n)
    row = (shift(vf, 0, -1) - vf + shift(uf0, -1) - uf0) * rarea_c
    divg_d = su.upd_rows(divg_d, row, h)
    divg_d = su.upd_rows(divg_d, row, h + n)
    # corners
    sw = (-vf0 + shift(uf0, -1) - uf0) * rarea_c
    for ci, cj in ((h, h), (h + n, h)):
        divg_d = su.upd_point(divg_d, sw, ci, cj)
    ne = (shift(vf0, 0, -1) + shift(uf0, -1) - uf0) * rarea_c
    for ci, cj in ((h + n, h + n), (h, h + n)):
        divg_d = su.upd_point(divg_d, ne, ci, cj)
    return divg_d


def c_sw(delp, pt, u, v, w, omga_unused, gd, n, h, dt2, nord):
    """C-grid shallow water half step.

    Returns (delpc, ptc, uc, vc, ua, va, ut, vt, divgd, omga,
    delp_f, pt_f, w_f) where *_f are the inputs with cube-corner wedges
    filled (the reference updates them in place).
    """
    hz, ang = gd.horizontal, gd.angle
    sin1, cos1 = _sg(ang, 1)
    sin2, cos2 = _sg(ang, 2)
    sin3, cos3 = _sg(ang, 3)
    sin4, cos4 = _sg(ang, 4)
    rarea = hz.rarea[..., None]
    dx = hz.dx[..., None]
    dy = hz.dy[..., None]

    uc, vc, ua, va, ut, vt = d2a2c_vect(u, v, gd, n, h, dord4=True)

    if nord > 0:
        divgd = divergence_corner(u, v, ua, va, gd, n, h)
    else:
        divgd = jnp.zeros_like(u)

    # geoadjust: first-order upwind volume fluxes
    ut = jnp.where(
        ut > 0.0,
        dt2 * ut * dy * shift(sin3, -1),
        dt2 * ut * dy * sin1,
    )
    vt = jnp.where(
        vt > 0.0,
        dt2 * vt * dx * shift(sin4, 0, -1),
        dt2 * vt * dx * sin2,
    )

    # x-direction corner fill + fluxes
    delp = corner_ops.fill_corners_cells(delp, delp, n, h, "x", 2)
    pt = corner_ops.fill_corners_cells(pt, pt, n, h, "x", 2)
    w = corner_ops.fill_corners_cells(w, w, n, h, "x", 2)
    fx1 = jnp.where(ut > 0.0, shift(delp, -1), delp)
    fx = jnp.where(ut > 0.0, shift(pt, -1), pt)
    fx2 = jnp.where(ut > 0.0, shift(w, -1), w)
    fx1 = ut * fx1
    fx = fx1 * fx
    fx2 = fx1 * fx2

    # y-direction corner fill + transport
    delp = corner_ops.fill_corners_cells(delp, delp, n, h, "y", 2)
    pt = corner_ops.fill_corners_cells(pt, pt, n, h, "y", 2)
    w = corner_ops.fill_corners_cells(w, w, n, h, "y", 2)
    fy1 = jnp.where(vt > 0.0, shift(delp, 0, -1), delp)
    fy = jnp.where(vt > 0.0, shift(pt, 0, -1), pt)
    fy2 = jnp.where(vt > 0.0, shift(w, 0, -1), w)
    fy1 = vt * fy1
    fy = fy1 * fy
    fy2 = fy1 * fy2

    delpc = delp + (fx1 - shift(fx1, 1) + fy1 - shift(fy1, 0, 1)) * rarea
    ptc = (pt * delp + (fx - shift(fx, 1) + fy - shift(fy, 0, 1)) * rarea) / delpc
    omga = (w * delp + (fx2 - shift(fx2, 1) + fy2 - shift(fy2, 0, 1)) * rarea) / delpc

    # kinetic energy and vorticity with upstream bias
    ke = jnp.where(ua > 0.0, uc, shift(uc, 1))
    vort = jnp.where(va > 0.0, vc, shift(vc, 0, 1))
    # tile-edge overrides
    v_edge_lo = jnp.where(
        va <= 0.0, vort * sin4 + shift(u, 0, 1) * cos4, vort
    )
    for j in (h - 1, h + n - 1):
        vort = su.upd_rows(vort, v_edge_lo, j)
    v_edge_hi = jnp.where(va > 0.0, vort * sin2 + u * cos2, vort)
    for j in (h, h + n):
        vort = su.upd_rows(vort, v_edge_hi, j)
    k_edge_lo = jnp.where(ua <= 0.0, ke * sin3 + shift(v, 1) * cos3, ke)
    for i in (h + n - 1, h - 1):
        ke = su.upd_cols(ke, k_edge_lo, i)
    k_edge_hi = jnp.where(ua > 0.0, ke * sin1 + v * cos1, ke)
    for i in (h + n, h):
        ke = su.upd_cols(ke, k_edge_hi, i)
    ke = 0.5 * dt2 * (ua * ke + va * vort)

    # C-grid circulation -> absolute vorticity at corners
    dxc = hz.dxc[..., None]
    dyc = hz.dyc[..., None]
    fxc = dxc * uc
    fyc = dyc * vc
    vort_c = shift(fxc, 0, -1) - fxc - shift(fyc, -1) + fyc
    no_fy1 = shift(fxc, 0, -1) - fxc + fyc
    for ci, cj in ((h, h), (h, h + n)):
        vort_c = su.upd_point(vort_c, no_fy1, ci, cj)
    no_fy = shift(fxc, 0, -1) - fxc - shift(fyc, -1)
    for ci, cj in ((h + n, h), (h + n, h + n)):
        vort_c = su.upd_point(vort_c, no_fy, ci, cj)
    vort_c = gd.horizontal.fC[..., None] + hz.rarea_c[..., None] * vort_c

    # update C-grid winds
    cosa_v = ang.cosa_v[..., None]
    sina_v = ang.sina_v[..., None]
    cosa_u = ang.cosa_u[..., None]
    sina_u = ang.sina_u[..., None]
    rdxc = hz.rdxc[..., None]
    rdyc = hz.rdyc[..., None]

    tmp_flux = dt2 * (u - vc * cosa_v) / sina_v
    edge = dt2 * u
    for j in (h, h + n):
        tmp_flux = su.upd_rows(tmp_flux, edge, j)
    flux = jnp.where(tmp_flux > 0.0, vort_c, shift(vort_c, 1))
    vc = vc - tmp_flux * flux + rdyc * (shift(ke, 0, -1) - ke)

    tmp_flux = dt2 * (v - uc * cosa_u) / sina_u
    edge = dt2 * v
    for i in (h, h + n):
        tmp_flux = su.upd_cols(tmp_flux, edge, i)
    flux = jnp.where(tmp_flux > 0.0, vort_c, shift(vort_c, 0, 1))
    uc = uc + tmp_flux * flux + rdxc * (shift(ke, -1) - ke)

    return delpc, ptc, uc, vc, ua, va, ut, vt, divgd, omga, delp, pt, w
