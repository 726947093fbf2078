"""C-grid shallow-water half-step (c_sw).

jnp port of ai2cm/pace fv3core/pace/fv3core/stencils/c_sw.py
`CGridShallowWaterDynamics`: advances C-grid winds (and delp/pt on the
C-grid) by half a timestep to provide advective fluxes for the D-grid step.

Written against the injected stencil-ops namespace
(ops/stencil_utils.py GlobalOps); a row-chunked Pallas twin was
measured on-chip and deleted (docs/KNOWN_ISSUES.md "c_sw Pallas").
"""

from __future__ import annotations

from types import SimpleNamespace

import jax.numpy as jnp

from pace_tpu.ops.d2a2c import d2a2c_core, metrics_namespace
from pace_tpu.ops.stencil_utils import GlobalOps

_GLOBAL = GlobalOps()


def _sg(m, i):
    return m.sin_sg[..., i - 1][..., None], m.cos_sg[..., i - 1][..., None]


def divergence_corner_core(ops, u, v, ua, va, m, n, h):
    """D-grid divergence at cell corners (for divergence damping)."""
    sh = ops.shift
    dxc = m.dxc[..., None]
    dyc = m.dyc[..., None]
    rarea_c = m.rarea_c[..., None]
    sin1, cos1 = _sg(m, 1)
    sin2, cos2 = _sg(m, 2)
    sin3, cos3 = _sg(m, 3)
    sin4, cos4 = _sg(m, 4)

    uf = (
        (u - 0.25 * (sh(va, 0, -1) + va) * (sh(cos4, 0, -1) + cos2))
        * dyc * 0.5 * (sh(sin4, 0, -1) + sin2)
    )
    vf = (
        (v - 0.25 * (sh(ua, -1) + ua) * (sh(cos3, -1) + cos1))
        * dxc * 0.5 * (sh(sin3, -1) + sin1)
    )
    divg_d = (sh(vf, 0, -1) - vf + sh(uf, -1) - uf) * rarea_c

    # tile-edge variants: on edges the cross terms drop (uf/vf use the raw
    # covariant wind there)
    uf0 = u * dyc * 0.5 * (sh(sin4, 0, -1) + sin2)
    vf0 = v * dxc * 0.5 * (sh(sin3, -1) + sin1)
    # west/east interface columns (i = h, h+n)
    col = (sh(vf0, 0, -1) - vf0 + sh(uf, -1) - uf) * rarea_c
    divg_d = ops.upd_cols(divg_d, col, h)
    divg_d = ops.upd_cols(divg_d, col, h + n)
    # south/north rows (j = h, h+n)
    row = (sh(vf, 0, -1) - vf + sh(uf0, -1) - uf0) * rarea_c
    divg_d = ops.upd_rows(divg_d, row, h)
    divg_d = ops.upd_rows(divg_d, row, h + n)
    # corners
    sw = (-vf0 + sh(uf0, -1) - uf0) * rarea_c
    for ci, cj in ((h, h), (h + n, h)):
        divg_d = ops.upd_point(divg_d, sw, ci, cj)
    ne = (sh(vf0, 0, -1) + sh(uf0, -1) - uf0) * rarea_c
    for ci, cj in ((h + n, h + n), (h, h + n)):
        divg_d = ops.upd_point(divg_d, ne, ci, cj)
    return divg_d


def c_sw_part1(ops, u, v, m, n, h, nord):
    """d2a2c + corner divergence (the deep-reach half of c_sw).
    Returns (uc, vc, ua, va, ut, vt, divgd)."""
    uc, vc, ua, va, ut, vt = d2a2c_core(ops, u, v, m, n, h)
    if nord > 0:
        divgd = divergence_corner_core(ops, u, v, ua, va, m, n, h)
    else:
        divgd = jnp.zeros_like(u)
    return uc, vc, ua, va, ut, vt, divgd


def c_sw_part2(ops, delp, pt, w, u, v, uc, vc, ua, va, ut, vt, m, n, h,
               dt2):
    """Transport + ke/vorticity + C-wind update (shallow-reach half).
    Returns (delpc, ptc, uc2, vc2, ut2, vt2, omga, delp_f, pt_f, w_f)."""
    sh = ops.shift
    sin1, cos1 = _sg(m, 1)
    sin2, cos2 = _sg(m, 2)
    sin3, cos3 = _sg(m, 3)
    sin4, cos4 = _sg(m, 4)
    rarea = m.rarea[..., None]
    dx = m.dx[..., None]
    dy = m.dy[..., None]

    # geoadjust: first-order upwind volume fluxes
    ut = jnp.where(
        ut > 0.0,
        dt2 * ut * dy * sh(sin3, -1),
        dt2 * ut * dy * sin1,
    )
    vt = jnp.where(
        vt > 0.0,
        dt2 * vt * dx * sh(sin4, 0, -1),
        dt2 * vt * dx * sin2,
    )

    # x-direction corner fill + fluxes
    delp = ops.fill_corners_cells(delp, delp, n, h, "x", 2)
    pt = ops.fill_corners_cells(pt, pt, n, h, "x", 2)
    w = ops.fill_corners_cells(w, w, n, h, "x", 2)
    fx1 = jnp.where(ut > 0.0, sh(delp, -1), delp)
    fx = jnp.where(ut > 0.0, sh(pt, -1), pt)
    fx2 = jnp.where(ut > 0.0, sh(w, -1), w)
    fx1 = ut * fx1
    fx = fx1 * fx
    fx2 = fx1 * fx2

    # y-direction corner fill + transport
    delp = ops.fill_corners_cells(delp, delp, n, h, "y", 2)
    pt = ops.fill_corners_cells(pt, pt, n, h, "y", 2)
    w = ops.fill_corners_cells(w, w, n, h, "y", 2)
    fy1 = jnp.where(vt > 0.0, sh(delp, 0, -1), delp)
    fy = jnp.where(vt > 0.0, sh(pt, 0, -1), pt)
    fy2 = jnp.where(vt > 0.0, sh(w, 0, -1), w)
    fy1 = vt * fy1
    fy = fy1 * fy
    fy2 = fy1 * fy2

    delpc = delp + (fx1 - sh(fx1, 1) + fy1 - sh(fy1, 0, 1)) * rarea
    ptc = (pt * delp + (fx - sh(fx, 1) + fy - sh(fy, 0, 1)) * rarea) / delpc
    omga = (w * delp + (fx2 - sh(fx2, 1) + fy2 - sh(fy2, 0, 1)) * rarea) \
        / delpc

    # kinetic energy and vorticity with upstream bias
    ke = jnp.where(ua > 0.0, uc, sh(uc, 1))
    vort = jnp.where(va > 0.0, vc, sh(vc, 0, 1))
    # tile-edge overrides
    v_edge_lo = jnp.where(
        va <= 0.0, vort * sin4 + sh(u, 0, 1) * cos4, vort
    )
    for j in (h - 1, h + n - 1):
        vort = ops.upd_rows(vort, v_edge_lo, j)
    v_edge_hi = jnp.where(va > 0.0, vort * sin2 + u * cos2, vort)
    for j in (h, h + n):
        vort = ops.upd_rows(vort, v_edge_hi, j)
    k_edge_lo = jnp.where(ua <= 0.0, ke * sin3 + sh(v, 1) * cos3, ke)
    for i in (h + n - 1, h - 1):
        ke = ops.upd_cols(ke, k_edge_lo, i)
    k_edge_hi = jnp.where(ua > 0.0, ke * sin1 + v * cos1, ke)
    for i in (h + n, h):
        ke = ops.upd_cols(ke, k_edge_hi, i)
    ke = 0.5 * dt2 * (ua * ke + va * vort)

    # C-grid circulation -> absolute vorticity at corners
    vort_c = circulation_cgrid_core(ops, uc, vc, m, n, h)
    vort_c = m.fC[..., None] + m.rarea_c[..., None] * vort_c

    # update C-grid winds
    uc, vc = vorticity_transport_cgrid_core(
        ops, uc, vc, vort_c, ke, u, v, m, n, h, dt2
    )

    return delpc, ptc, uc, vc, ut, vt, omga, delp, pt, w


def circulation_cgrid_core(ops, uc, vc, m, n, h):
    """Raw C-grid circulation at cell corners (reference c_sw.py
    circulation_cgrid:367-408: fx/fy line integrals with the corner
    one-sided variants; absolute vorticity -- fC + rarea_c * this -- is
    applied by the caller)."""
    sh = ops.shift
    dxc = m.dxc[..., None]
    dyc = m.dyc[..., None]
    fxc = dxc * uc
    fyc = dyc * vc
    vort_c = sh(fxc, 0, -1) - fxc - sh(fyc, -1) + fyc
    no_fy1 = sh(fxc, 0, -1) - fxc + fyc
    for ci, cj in ((h, h), (h, h + n)):
        vort_c = ops.upd_point(vort_c, no_fy1, ci, cj)
    no_fy = sh(fxc, 0, -1) - fxc - sh(fyc, -1)
    for ci, cj in ((h + n, h), (h + n, h + n)):
        vort_c = ops.upd_point(vort_c, no_fy, ci, cj)
    return vort_c


def vorticity_transport_cgrid_core(ops, uc, vc, vort_c, ke, u, v, m, n, h,
                                   dt2):
    """C-grid wind update from the absolute-vorticity flux and the KE
    gradient (reference c_sw.py update_x_velocity:411 /
    update_y_velocity:445, called at c_sw.py:758-776).  Returns
    (uc_new, vc_new)."""
    sh = ops.shift
    cosa_v = m.cosa_v[..., None]
    sina_v = m.sina_v[..., None]
    cosa_u = m.cosa_u[..., None]
    sina_u = m.sina_u[..., None]
    rdxc = m.rdxc[..., None]
    rdyc = m.rdyc[..., None]

    tmp_flux = dt2 * (u - vc * cosa_v) / sina_v
    edge = dt2 * u
    for j in (h, h + n):
        tmp_flux = ops.upd_rows(tmp_flux, edge, j)
    flux = jnp.where(tmp_flux > 0.0, vort_c, sh(vort_c, 1))
    vc = vc - tmp_flux * flux + rdyc * (sh(ke, 0, -1) - ke)

    tmp_flux = dt2 * (v - uc * cosa_u) / sina_u
    edge = dt2 * v
    for i in (h, h + n):
        tmp_flux = ops.upd_cols(tmp_flux, edge, i)
    flux = jnp.where(tmp_flux > 0.0, vort_c, sh(vort_c, 0, 1))
    uc = uc + tmp_flux * flux + rdxc * (sh(ke, -1) - ke)
    return uc, vc


def c_sw_core(ops, delp, pt, u, v, w, m, n, h, dt2, nord):
    """Ops-injected c_sw body (part1 + part2). Returns (delpc, ptc, uc,
    vc, ua, va, ut, vt, divgd, omga, delp_f, pt_f, w_f)."""
    uc, vc, ua, va, ut, vt, divgd = c_sw_part1(ops, u, v, m, n, h, nord)
    (delpc, ptc, uc, vc, ut, vt, omga, delp_f, pt_f, w_f) = c_sw_part2(
        ops, delp, pt, w, u, v, uc, vc, ua, va, ut, vt, m, n, h, dt2
    )
    return (delpc, ptc, uc, vc, ua, va, ut, vt, divgd, omga, delp_f,
            pt_f, w_f)


def c_sw_metrics(gd):
    """Metric bundle (global layout) for c_sw_core."""
    hz, ang = gd.horizontal, gd.angle
    base = metrics_namespace(gd)
    return SimpleNamespace(
        **vars(base),
        cos_sg=ang.cos_sg, rarea=hz.rarea, dx=hz.dx, dy=hz.dy,
        dxc=hz.dxc, dyc=hz.dyc, rarea_c=hz.rarea_c, fC=hz.fC,
        sina_v=ang.sina_v, sina_u=ang.sina_u, rdxc=hz.rdxc, rdyc=hz.rdyc,
    )


def divergence_corner(u, v, ua, va, gd, n, h):
    return divergence_corner_core(_GLOBAL, u, v, ua, va, c_sw_metrics(gd),
                                  n, h)


def c_sw(delp, pt, u, v, w, omga_unused, gd, n, h, dt2, nord):
    """C-grid shallow water half step (global XLA path).

    Returns (delpc, ptc, uc, vc, ua, va, ut, vt, divgd, omga,
    delp_f, pt_f, w_f) where *_f are the inputs with cube-corner wedges
    filled (the reference updates them in place).
    """
    return c_sw_core(_GLOBAL, delp, pt, u, v, w, c_sw_metrics(gd), n, h,
                     dt2, nord)
