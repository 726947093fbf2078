"""Semi-implicit nonhydrostatic vertical solvers (SIM1 / Riem_Solver_C / _3).

jnp ports of ai2cm/pace fv3core/pace/fv3core/stencils/sim1_solver.py,
riem_solver_c.py, riem_solver3.py.  The vertical tridiagonal (Thomas)
elimination/substitution passes run as `lax.scan` over k with the horizontal
dimensions vectorized — the natural TPU layout for columnwise-sequential
solves (SURVEY §7.3 item 3).

All arrays carry k LAST: layer fields (..., nz), interface fields (..., nz+1).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from pace_tpu.utils import constants


def _k_first(q):
    return jnp.moveaxis(q, -1, 0)


def _k_last(q):
    return jnp.moveaxis(q, 0, -1)


def sim1_solver(w, dm, gm, dz, pt, pm, pem, ws, dt, p_fac):
    """Tridiagonal solve for w and dz (sound waves + vertical PGF).

    Args (all layer fields (..., nz) except pem (..., nz+1), ws (...)):
        w: vertical velocity (in/out)
        dm: layer mass per unit area
        gm: gamma = 1/(1-cappa)
        dz: layer height thickness (negative)
        pt: (potential) temperature
        pm: layer-mean hydrostatic pressure (condensate-free)
        pem: interface hydrostatic pressure
        ws: surface vertical wind from terrain
    Returns (w, dz, pe) with pe the nonhydrostatic perturbation pressure on
    interfaces (..., nz+1).
    """
    from pace_tpu.ops.pallas import sim1_pallas as sim1_pallas_mod

    if sim1_pallas_mod.enabled(w.dtype) and w.ndim == 4:
        return sim1_pallas_mod.sim1_pallas(
            w, dm, gm, dz, pt, pm, pem, ws, dt, p_fac
        )

    t1g = 2.0 * dt * dt
    rdt = 1.0 / dt
    nz = w.shape[-1]

    # perturbation pressure from equation of state
    pe_l = (
        jnp.exp(gm * jnp.log(-dm / dz * constants.RDGAS * pt)) - pm
    )  # (..., nz)
    w1 = w

    g_rat = dm[..., :-1] / dm[..., 1:]                      # (..., nz-1)
    bb = 2.0 * (1.0 + g_rat)                                # k in [0, nz-1)
    dd = 3.0 * (pe_l[..., :-1] + g_rat * pe_l[..., 1:])
    # last row: bb = 2, dd = 3*pe
    bb = jnp.concatenate([bb, jnp.full_like(bb[..., :1], 2.0)], -1)
    dd = jnp.concatenate([dd, 3.0 * pe_l[..., -1:]], -1)    # (..., nz)
    g_rat_f = jnp.concatenate([g_rat, jnp.zeros_like(g_rat[..., :1])], -1)

    # forward elimination: carry (bet, pp); k = 1..nz
    bb_k = _k_first(bb)
    dd_k = _k_first(dd)
    grat_k = _k_first(g_rat_f)

    def fwd(carry, x):
        bet, pp = carry
        g_prev, d_prev, b_cur = x
        gam_k = g_prev / bet
        pp_k = (d_prev - pp) / bet
        bet_k = b_cur - gam_k
        return (bet_k, pp_k), (pp_k, gam_k)

    bet0 = bb_k[0]
    pp0 = jnp.zeros_like(bet0)
    bb_next = jnp.concatenate([bb_k[1:], bb_k[-1:]], 0)  # bb[k] for k=1..nz
    xs = (grat_k, dd_k, bb_next)
    # xs index m = 0..nz-1 corresponds to k = m+1
    (_, _), (pp_rest, gam_rest) = jax.lax.scan(fwd, (bet0, pp0), xs)
    pp = jnp.concatenate([pp0[None], pp_rest], 0)           # k = 0..nz
    gam = jnp.concatenate([jnp.zeros_like(pp0)[None], gam_rest], 0)

    # backward: pp_k -= gam_k * pp_{k+1} for k = nz-1..1
    def bwd(carry, x):
        pp_next = carry
        pp_k, gam_k = x
        new = pp_k - gam_k * pp_next
        return new, new

    _, pp_upd_rev = jax.lax.scan(
        bwd, pp[nz], (pp[1:nz][::-1], gam[1:nz][::-1])
    )
    pp = jnp.concatenate(
        [pp[0][None], pp_upd_rev[::-1], pp[nz][None]], 0
    )  # (nz+1, ...)

    # aa_k for k in [1, nz)
    gm_k = _k_first(gm)
    dz_k = _k_first(dz)
    pem_k = _k_first(pem)
    dm_k = _k_first(dm)
    aa = (
        t1g * 0.5 * (gm_k[:-1] + gm_k[1:]) / (dz_k[:-1] + dz_k[1:])
        * (pem_k[1:nz] + pp[1:nz])
    )  # index m = 0..nz-2 corresponds to k = m+1
    aa = jnp.concatenate([jnp.zeros_like(aa[:1]), aa], 0)   # k = 0..nz-1

    # w solve, forward
    w1_k = _k_first(w1)
    p1_last = t1g * gm_k[nz - 1] / dz_k[nz - 1] * (pem_k[nz] + pp[nz])

    bet = dm_k[0] - aa[1]
    w_0 = (dm_k[0] * w1_k[0] + dt * pp[1]) / bet

    def wfwd(carry, x):
        bet_prev, w_prev = carry
        aak, aak1, dmk, w1k, dpp, extra = x
        gam2_k = aak / bet_prev
        bet_k = dmk - (aak + aak1 + aak * gam2_k)
        w_k = (dmk * w1k + dt * dpp - extra - aak * w_prev) / bet_k
        return (bet_k, w_k), (w_k, gam2_k)

    # per-step inputs for k = 1..nz-1; at k = nz-1 the lower coupling
    # coefficient is p1_last and the surface term enters the RHS
    aak_in = aa[1:nz]
    aak1_in = jnp.concatenate([aa[2:nz], p1_last[None]], 0)
    extra_in = jnp.concatenate(
        [jnp.zeros_like(aa[2:nz]), (p1_last * ws)[None]], 0
    )
    xs = (
        aak_in, aak1_in, dm_k[1:nz], w1_k[1:nz], pp[2:nz + 1] - pp[1:nz],
        extra_in,
    )
    (_, _), (w_rest, gam2_rest) = jax.lax.scan(wfwd, (bet, w_0), xs)
    w_f = jnp.concatenate([w_0[None], w_rest], 0)           # (nz, ...)
    gam2 = jnp.concatenate([jnp.zeros_like(w_0)[None], gam2_rest], 0)

    # back substitution: w_k -= gam2_{k+1} w_{k+1}, k = nz-2..0
    def wbwd(carry, x):
        w_next = carry
        w_k, gam_next = x
        new = w_k - gam_next * w_next
        return new, new

    _, w_upd_rev = jax.lax.scan(
        wbwd, w_f[nz - 1], (w_f[: nz - 1][::-1], gam2[1:nz][::-1])
    )
    w_out = jnp.concatenate([w_upd_rev[::-1], w_f[nz - 1][None]], 0)

    # pe on interfaces: cumulative sum of mass-weighted dw
    dwe = dm_k * (w_out - w1_k) * rdt                       # (nz, ...)
    pe_i = jnp.concatenate(
        [jnp.zeros_like(dwe[:1]), jnp.cumsum(dwe, axis=0)], 0
    )  # (nz+1, ...)

    # p1 backward recurrence for dz update
    def p1bwd(carry, x):
        p1_next = carry
        pe_k, pe_k1, pe_k2, bb_k_, grat_k_ = x
        p1_k = (pe_k + bb_k_ * pe_k1 + grat_k_ * pe_k2) / 3.0 \
            - grat_k_ * p1_next
        return p1_k, p1_k

    p1_bot = (pe_i[nz - 1] + 2.0 * pe_i[nz]) / 3.0
    xs = (
        pe_i[: nz - 1][::-1], pe_i[1:nz][::-1],
        pe_i[2:nz + 1][::-1], bb_k[: nz - 1][::-1], grat_k[: nz - 1][::-1],
    )
    _, p1_rev = jax.lax.scan(p1bwd, p1_bot, xs)
    p1 = jnp.concatenate([p1_rev[::-1], p1_bot[None]], 0)   # (nz, ...)

    pm_k = _k_first(pm)
    pt_k = _k_first(pt)
    cp3_k = _k_first(1.0 - 1.0 / gm)  # cappa = 1 - 1/gm
    maxp = jnp.where(p_fac * dm_k > p1 + pm_k, p_fac * pm_k, p1 + pm_k)
    dz_out = -dm_k * constants.RDGAS * pt_k * jnp.exp(
        (cp3_k - 1.0) * jnp.log(maxp)
    )

    return _k_last(w_out), _k_last(dz_out), _k_last(pe_i)


def riem_solver_c(
    dt2, cappa, ptop, hs, ws, ptc, q_con, delpc, gz, w3, p_fac,
):
    """C-grid nonhydrostatic vertical solver (Riem_Solver_C).

    Args (layer fields (..., nz); gz (..., nz+1); hs/ws (...)):
    Returns (gz, pef): updated interface heights and full pressure.
    """
    dm = delpc
    pem = jnp.concatenate(
        [
            jnp.full_like(dm[..., :1], ptop),
            ptop + jnp.cumsum(dm, -1),
        ], -1,
    )
    peg = jnp.concatenate(
        [
            jnp.full_like(dm[..., :1], ptop),
            ptop + jnp.cumsum(dm * (1.0 - q_con), -1),
        ], -1,
    )
    dz = gz[..., 1:] - gz[..., :-1]
    gm = 1.0 / (1.0 - cappa)
    dm = dm / constants.GRAV
    pm = (peg[..., 1:] - peg[..., :-1]) / jnp.log(peg[..., 1:] / peg[..., :-1])

    w, dz, pe = sim1_solver(w3, dm, gm, dz, ptc, pm, pem, ws, dt2, p_fac)

    pef = jnp.concatenate(
        [jnp.full_like(pe[..., :1], ptop), pe[..., 1:] + pem[..., 1:]], -1
    )
    # gz from surface height and dz, integrating upward
    below = jnp.cumsum(dz[..., ::-1], -1)[..., ::-1]
    gz_new = jnp.concatenate(
        [hs[..., None] - below * constants.GRAV, hs[..., None]], -1
    )
    return gz_new, pef


def riem_solver3(
    dt, cappa, ptop, zs, ws, delz, q_con, delp, pt, zh, pe, pk3, pk, peln,
    w, p_fac, beta, use_logp, last_call: bool,
):
    """D-grid full-timestep nonhydrostatic vertical solver (Riem_Solver3).

    Args: layer fields (..., nz): cappa, delz, q_con, delp, pt, w;
    interface fields (..., nz+1): zh, pe, pk3, pk, peln; zs/ws (...).
    Returns (delz, zh, pe, ppe, pk3, pk, peln, w).
    """
    import math

    peln1 = math.log(ptop)
    ptk = math.exp(constants.KAPPA * peln1)

    dm = delp
    pe_init = pe
    p_if = jnp.concatenate(
        [jnp.full_like(dm[..., :1], ptop), ptop + jnp.cumsum(dm, -1)], -1
    )
    log_p_if = jnp.concatenate(
        [jnp.full_like(dm[..., :1], peln1), jnp.log(p_if[..., 1:])], -1
    )
    p_if_gas = jnp.concatenate(
        [
            jnp.full_like(dm[..., :1], ptop),
            ptop + jnp.cumsum(dm * (1.0 - q_con), -1),
        ], -1,
    )
    log_p_if_gas = jnp.concatenate(
        [jnp.full_like(dm[..., :1], peln1), jnp.log(p_if_gas[..., 1:])], -1
    )
    pk3_new = jnp.concatenate(
        [
            jnp.full_like(dm[..., :1], ptk),
            jnp.exp(constants.KAPPA * log_p_if[..., 1:]),
        ], -1,
    )
    gm = 1.0 / (1.0 - cappa)
    dm = dm * constants.RGRAV
    p_gas = (p_if_gas[..., 1:] - p_if_gas[..., :-1]) / (
        log_p_if_gas[..., 1:] - log_p_if_gas[..., :-1]
    )
    dz = zh[..., 1:] - zh[..., :-1]

    w_new, dz_new, pe_pert = sim1_solver(
        w, dm, gm, dz, pt, p_gas, p_if, ws, dt, p_fac
    )

    # finalize
    pk3_out = log_p_if if use_logp else pk3_new
    ppe = pe_pert + p_if if beta < -0.1 else pe_pert
    if last_call:
        peln_out = log_p_if
        pk_out = pk3_out
        pe_out = p_if
    else:
        peln_out = peln
        pk_out = pk
        pe_out = pe_init
    below = jnp.cumsum(dz_new[..., ::-1], -1)[..., ::-1]
    zh_new = jnp.concatenate(
        [zs[..., None] - below, zs[..., None]], -1
    )
    return dz_new, zh_new, pe_out, ppe, pk3_out, pk_out, peln_out, w_new
