"""Dry convective adjustment in the top sponge layers (fv_subgridz).

jnp port of ai2cm/pace fv3core/pace/fv3core/stencils/fv_subgridz.py
`DryConvectiveAdjustment`: a Richardson-number-based 2-layer mixing scheme
applied over the top `n_sponge` levels, iterated m=3 times with mixing
ratios 0.25/0.5/0.999, followed by a relaxation blend and wind-tendency
output.

The reference's BACKWARD gt4py computation with per-interval ri_ref
multipliers (m_loop, fv_subgridz.py:236-660) is a single lax.scan running
from the bottom of the sponge upward, carrying the inter-level mixing
fluxes h0; the interval specializations become per-level scalars in the
scan inputs.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from jax import lax

from pace_tpu.utils import constants as con

RK = con.CP_AIR / con.RDGAS + 1.0
G2 = 0.5 * con.GRAV
T1_MIN = 160.0
T2_MIN = 165.0
T2_MAX = 315.0
T3_MAX = 325.0
USTAR2 = 1.0e-4
RI_MAX = 1.0
RI_MIN = 0.25

TRACERS = ("qvapor", "qliquid", "qrain", "qice", "qsnow", "qgraupel",
           "qo3mr", "qsgs_tke", "qcld")
# fields mixed by kh_adjust (tracers + winds); total_energy is mixed via
# the static-energy difference
MIXED = TRACERS + ("u0", "v0", "w0")


def _standard_cm(qv, ql_, qr, qi, qs, qg):
    q_liq = ql_ + qr
    q_sol = qi + qs + qg
    dry = 1.0 - (qv + q_liq + q_sol)
    cpm = dry * con.CP_AIR + qv * con.CP_VAP + q_liq * con.C_LIQ \
        + q_sol * con.C_ICE
    cvm = dry * con.CV_AIR + qv * con.CV_VAP + q_liq * con.C_LIQ \
        + q_sol * con.C_ICE
    return cpm, cvm


def _tvol(gz, u0, v0, w0):
    return gz + 0.5 * (u0 ** 2 + v0 ** 2 + w0 ** 2)


def _adjust_cvm(f):
    cpm, cvm = _standard_cm(f["qvapor"], f["qliquid"], f["qrain"],
                            f["qice"], f["qsnow"], f["qgraupel"])
    tv = _tvol(f["gz"], f["u0"], f["v0"], f["w0"])
    t0 = (f["te"] - tv) / cvm
    f = dict(f, cpm=cpm, cvm=cvm, t0=t0, se=cpm * t0 + tv)
    return f


def _qcon(f):
    return f["qliquid"] + f["qice"] + f["qsnow"] + f["qrain"] + f["qgraupel"]


def dry_convective_adjustment(s: dict, timestep: float, fv_sg_adj: float,
                              n_sponge: int, nwat: int = 6,
                              hydrostatic: bool = False,
                              ptop: float = 100.0):
    """Returns (updated state dict, u_dt, v_dt).  s holds the DycoreState
    arrays (shape (..., nz)).  ptop is static (selects the t_min bound as
    the reference does from pe[0], fv_subgridz.py:866-870)."""
    assert not hydrostatic, "Hydrostatic not implemented for fv_subgridz"
    nz = s["pt"].shape[-1]
    kbot = n_sponge if n_sponge is not None else nz
    zero_dt = jnp.zeros_like(s["pt"])
    if kbot < 3:
        return s, zero_dt, zero_dt
    t_max = T2_MAX if kbot < min(nz, 24) else T3_MAX
    xvir = 0.0 if nwat == 0 else con.ZVIR
    t_min = T1_MIN if ptop < 2.0 else T2_MIN

    sl = slice(0, kbot)
    # init (reference fv_subgridz.py:68-129): save working copies and build
    # sponge-relative geopotential
    f = {name: s[name][..., sl] for name in TRACERS}
    f["u0"] = s["ua"][..., sl]
    f["v0"] = s["va"][..., sl]
    f["w0"] = s["w"][..., sl]
    f["t0"] = s["pt"][..., sl]
    delz = s["delz"][..., sl]
    # gzh upward accumulation from the bottom of the sponge
    gzh_below = -con.GRAV * jnp.cumsum(delz[..., ::-1], -1)[..., ::-1]
    gzh = gzh_below + con.GRAV * delz  # gzh[k+1]
    f["gz"] = gzh - G2 * delz
    cpm, cvm = _standard_cm(f["qvapor"], f["qliquid"], f["qrain"],
                            f["qice"], f["qsnow"], f["qgraupel"])
    tv = _tvol(f["gz"], f["u0"], f["v0"], f["w0"])
    f["cpm"], f["cvm"] = cpm, cvm
    f["se"] = cpm * f["t0"] + tv
    f["te"] = cvm * f["t0"] + tv

    delp = s["delp"][..., sl]
    pkz = s["pkz"][..., sl]
    dlogp = s["peln"][..., 1:kbot + 1] - s["peln"][..., :kbot]

    # per-level ri_ref multiplier (reference interval specializations)
    mult = np.ones(kbot)
    if kbot > 1:
        mult[1] = 4.0
    if kbot > 2:
        mult[2] = 2.0
    if kbot > 3:
        mult[3] = 1.5

    state_names = list(TRACERS) + ["u0", "v0", "w0", "t0", "se", "te",
                                   "cpm", "cvm", "gz"]

    for m in range(3):
        ratio = {0: 0.25, 1: 0.5, 2: 0.999}[m]
        f = _m_loop(f, delp, pkz, dlogp, mult, kbot, ratio, xvir, t_max,
                    t_min, state_names)

    # finalize (reference fv_subgridz.py:667-735)
    fra = timestep / float(fv_sg_adj)
    if fra < 1.0:
        for name, src in (
            ("t0", s["pt"]), ("u0", s["ua"]), ("v0", s["va"]),
            ("w0", s["w"]),
        ):
            f[name] = src[..., sl] + (f[name] - src[..., sl]) * fra
        for name in TRACERS:
            f[name] = s[name][..., sl] + (f[name] - s[name][..., sl]) * fra
    rdt = 1.0 / timestep
    pad = jnp.zeros_like(s["pt"][..., kbot:])
    u_dt = jnp.concatenate([rdt * (f["u0"] - s["ua"][..., sl]), pad], -1)
    v_dt = jnp.concatenate([rdt * (f["v0"] - s["va"][..., sl]), pad], -1)

    out = dict(s)

    def put(full, part):
        return jnp.concatenate([part, full[..., kbot:]], -1)

    out["pt"] = put(s["pt"], f["t0"])
    out["ua"] = put(s["ua"], f["u0"])
    out["va"] = put(s["va"], f["v0"])
    out["w"] = put(s["w"], f["w0"])
    for name in TRACERS:
        out[name] = put(s[name], f[name])
    return out, u_dt, v_dt


def _m_loop(f, delp, pkz, dlogp, mult, kbot, ratio, xvir, t_max, t_min,
            state_names):
    """One Richardson-mixing sweep from the sponge bottom upward
    (reference m_loop)."""

    def level(d, k):
        return {n: d[n][..., k] for n in state_names}

    def at_k(k):
        lev = level(f, k)
        lev_above = level(f, max(k - 1, 0))
        return (lev, lev_above, delp[..., k],
                delp[..., max(k - 1, 0)], pkz[..., k],
                pkz[..., max(k - 1, 0)], dlogp[..., k], mult[k],
                float(k < kbot - 1), float(k > 0))

    # scan from k = kbot-1 (bottom of sponge) up to k = 0
    ks = list(range(kbot - 1, -1, -1))
    xs_list = [at_k(k) for k in ks]
    xs = tuple(
        jnp.stack([x[i] for x in xs_list])
        if not isinstance(xs_list[0][i], dict)
        else {n: jnp.stack([x[i][n] for x in xs_list])
              for n in xs_list[0][i]}
        for i in range(len(xs_list[0]))
    )

    zeros = jnp.zeros_like(delp[..., 0])
    h0_init = {n: zeros for n in MIXED + ("te",)}
    carry0 = (h0_init, zeros, jnp.full_like(zeros, RI_MAX + 1.0))

    def body(carry, x):
        h0, ri_p, ri_ref_p = carry
        (lev, above, dp_k, dp_km1, pkz_k, pkz_km1, dlp_k, mult_k,
         has_up, has_down) = x
        lev = dict(lev)

        # "up" adjustment with the flux from the level below
        up = (has_up > 0.5) & (ri_p < ri_ref_p)
        for n in MIXED:
            lev[n] = jnp.where(up, lev[n] + h0[n] / dp_k, lev[n])
        lev["te"] = jnp.where(up, lev["te"] + h0["te"] / dp_k, lev["te"])
        lev = _adjust_cvm(lev)

        # Richardson number across the (k-1, k) interface
        qcon_km1 = _qcon(above)
        qcon_k = _qcon(lev)
        tv1 = above["t0"] * (1.0 + xvir * above["qvapor"] - qcon_km1)
        tv2 = lev["t0"] * (1.0 + xvir * lev["qvapor"] - qcon_k)
        pt1 = tv1 / pkz_km1
        pt2 = tv2 / pkz_k
        ri = (above["gz"] - lev["gz"]) * (pt1 - pt2) / (
            0.5 * (pt1 + pt2)
            * ((above["u0"] - lev["u0"]) ** 2
               + (above["v0"] - lev["v0"]) ** 2 + USTAR2)
        )
        ri = jnp.where((tv1 > t_max) & (tv1 > tv2), 0.0,
                       jnp.where(tv2 < t_min, jnp.minimum(ri, 0.1), ri))
        ri_ref = RI_MIN + (RI_MAX - RI_MIN) * jnp.maximum(
            400.0e2 - dp_k / dlp_k, 0.0
        ) / 200.0e2
        ri_ref = jnp.minimum(ri_ref, RI_MAX) * mult_k

        # mass flux and "down" adjustment
        max_ri_ratio = jnp.maximum(ri / ri_ref, 0.0)
        mc = jnp.where(
            ri < ri_ref,
            ratio * dp_km1 * dp_k / (dp_km1 + dp_k)
            * (1.0 - max_ri_ratio) ** 2,
            0.0,
        )
        down = (has_down > 0.5) & (ri < ri_ref)
        h0_new = {}
        for n in MIXED:
            h = mc * (lev[n] - above[n])
            h0_new[n] = jnp.where(down, h, 0.0)
            lev[n] = jnp.where(down, lev[n] - h0_new[n] / dp_k, lev[n])
        h_te = mc * (lev["se"] - above["se"])
        h0_new["te"] = jnp.where(down, h_te, 0.0)
        lev["te"] = jnp.where(down, lev["te"] - h0_new["te"] / dp_k,
                              lev["te"])
        lev = _adjust_cvm(lev)
        out_lev = {n: lev[n] for n in state_names}
        return (h0_new, ri, ri_ref), out_lev

    _, ys = lax.scan(body, carry0, xs)
    # ys[n] has shape (kbot, ...) in bottom-up order; restore (..., k)
    new_f = {}
    for n in state_names:
        new_f[n] = jnp.moveaxis(ys[n][::-1], 0, -1)
    return new_f
