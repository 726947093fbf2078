"""Per-operator golden suite: the translate-test analogue.

The reference validates ~40 components against Fortran savepoint data
(SURVEY.md section 4, tier 2).  Serialized Fortran data is unavailable
here, so each key operator is pinned against ITS OWN recorded digest on a
deterministic realistic input (the post-step C12 baroclinic state, f64):
regressions localize to the operator instead of only failing end-to-end.

Regenerate deliberately after intentional numerics changes:
    python tests/golden/make_op_golden.py
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

N_, NZ, H = 12, 79, 3
DT = 225.0


def build_inputs():
    from pace_tpu.grid.generation import generate_grid_data
    from pace_tpu.models.fv3.config import DynamicalCoreConfig
    from pace_tpu.models.fv3.dynamics import DynamicalCore
    from pace_tpu.models.fv3.init.baroclinic import init_baroclinic_state
    from pace_tpu.utils.gridtools import GridSizing

    from pace_tpu.parallel import halo as halo_mod

    sizing = GridSizing(N_, NZ)
    gd = generate_grid_data(N_, NZ, dtype=jnp.float64)
    config = DynamicalCoreConfig(do_sat_adj=False)
    core = DynamicalCore(config, sizing, gd, timestep=DT)
    state = init_baroclinic_state(sizing, dtype=jnp.float64)
    state = jax.jit(core.step_dynamics)(state)
    s = {f.name: getattr(state, f.name) for f in dataclasses.fields(state)}
    # the acoustics entry halo updates (dyn_core.py:686-689): the operators
    # are exercised exactly as the substep loop would see their inputs
    topo = core.topo
    center = topo.scalar_spec("center")
    for name in ("delp", "pt", "w", "q_con", "omga"):
        s[name] = halo_mod.halo_update_scalar(s[name], center)
    s["u"], s["v"] = halo_mod.halo_update_vector(
        topo, s["u"], s["v"], "y_iface", "x_iface"
    )
    s["uc"], s["vc"] = halo_mod.halo_update_vector(
        topo, s["uc"], s["vc"], "x_iface", "y_iface"
    )
    return sizing, gd, config, core, s


def compute_op_outputs():
    """Returns {op_name: {output_name: array}} for the pinned operators."""
    from pace_tpu.models.fv3.acoustics import _p_grad_c
    from pace_tpu.ops import (
        c_sw as c_sw_mod, d_sw as d_sw_mod, del2cubed, fxadv,
        nh_p_grad as nhpg, riemann, tracer_advection as tradv, updatedz,
        updatedzd,
    )
    from pace_tpu.ops.a2b_ord4 import a2b_ord4
    from pace_tpu.ops.c2l_ord import cubed_to_latlon
    from pace_tpu.ops.fvtp2d import fv_tp_2d
    from pace_tpu.ops.xppm import x_flux
    from pace_tpu.ops import remapping
    from pace_tpu.utils import constants

    sizing, gd, config, core, s = build_inputs()
    n, h, nz = N_, H, NZ
    col, topo, vp = core.column_namelist, core.topo, core.vertical_params
    dt2 = DT / 4
    out = {}

    def rec(name, names, vals):
        out[name] = dict(zip(names, [np.asarray(v) for v in vals]))

    csw = c_sw_mod.c_sw(s["delp"], s["pt"], s["u"], s["v"], s["w"],
                        s["omga"], gd, n, h, dt2, config.nord)
    rec("c_sw", ["delpc", "ptc", "uc", "vc", "ua", "va", "ut", "vt",
                 "divgd", "omga"], csw[:10])

    crx, cry, xfx, yfx, ut, vt = fxadv.fx_adv(
        s["uc"], s["vc"], jnp.zeros_like(s["delp"]),
        jnp.zeros_like(s["delp"]), gd, n, h, DT / 2,
    )
    rec("fx_adv", ["crx", "cry", "xfx", "yfx", "ut", "vt"],
        [crx, cry, xfx, yfx, ut, vt])

    fx, fy = fv_tp_2d(s["delp"], crx, cry, xfx, yfx, gd, n, h, 6,
                      nord_col=col["nord_v"], damp_c_col=col["damp_vt"])
    rec("fv_tp_2d_damped", ["fx", "fy"], [fx, fy])

    rec("xppm_x_flux", ["flux"],
        [x_flux(s["pt"], crx, gd.horizontal.dxa[..., None], n, h, 8)])

    dsw = d_sw_mod.d_sw(
        s["delp"], s["pt"], s["u"], s["v"], s["w"], s["uc"], s["vc"],
        s["ua"], s["va"], csw[8], s["mfxd"], s["mfyd"], s["cxd"],
        s["cyd"], s["q_con"], jnp.zeros_like(s["delp"]), s["diss_estd"],
        ut, vt, gd, col, config, n, h, DT / 2,
    )
    rec("d_sw", ["delp", "pt", "u", "v", "w", "q_con", "divgd", "delpc",
                 "mfx", "mfy", "heat_source"],
        [dsw[k] for k in ("delp", "pt", "u", "v", "w", "q_con", "divgd",
                          "delpc", "mfx", "mfy", "heat_source")])

    zs = s["phis"] * constants.RGRAV
    below = jnp.cumsum(s["delz"][..., ::-1], -1)[..., ::-1]
    gz = jnp.concatenate([zs[..., None] - below, zs[..., None]], -1)
    gzc, ws3 = updatedz.update_dz_c(
        jnp.asarray(vp["dp_ref"], gz.dtype), zs, gd.horizontal.area,
        csw[6], csw[7], gz, n, h, dt2,
    )
    rec("update_dz_c", ["gz", "ws3"], [gzc, ws3])

    gz2, pkc = riemann.riem_solver_c(
        dt2, jnp.full_like(s["delp"], 0.28), gd.vertical.ptop, s["phis"],
        ws3, csw[1], s["q_con"], csw[0], gzc, s["omga"], config.p_fac,
    )
    rec("riem_solver_c", ["gz", "pkc"], [gz2, pkc])

    ucp, vcp = _p_grad_c(csw[2], csw[3], csw[0], pkc, gz2, gd, dt2,
                         hydrostatic=False)
    rec("p_grad_c", ["uc", "vc"], [ucp, vcp])

    zh, wsd = updatedzd.update_dz_d(
        zs, gz[..., :nz + 1], crx, cry, xfx, yfx, gd, col, config, n, h,
        DT / 2, vp["dp_ref"],
    )
    rec("update_dz_d", ["zh", "wsd"], [zh, wsd])

    r3 = riemann.riem_solver3(
        DT / 2, jnp.full_like(s["delp"], 0.28), gd.vertical.ptop, zs,
        wsd, s["delz"], s["q_con"], s["delp"], s["pt"], zh, s["pe"],
        jnp.zeros_like(s["pe"]), s["pk"], s["peln"], s["w"],
        config.p_fac, config.beta, config.use_logp, last_call=True,
    )
    rec("riem_solver3", ["delz", "zh", "pe", "pkc", "pk3", "pk", "peln",
                         "w"], r3)

    un, vn, _, _, _ = nhpg.nh_p_grad(
        s["u"], s["v"], r3[3], r3[1] * constants.GRAV, r3[4], s["delp"],
        gd, n, h, DT / 2, gd.vertical.ptop, constants.KAPPA,
    )
    rec("nh_p_grad", ["u", "v"], [un, vn])

    rec("a2b_ord4", ["qb"], [a2b_ord4(s["pt"], gd, n, h)])
    rec("del2_cubed", ["q"],
        [del2cubed.hyperdiffusion(s["omga"], gd, 0.2, n, h, nmax=2)])

    from pace_tpu.models.fv3.state import NQ, TRACER_NAMES
    adv_in = {name: s[name] for name in TRACER_NAMES[:NQ]}
    adv = tradv.tracer_advection(
        adv_in, s["delp"], s["mfxd"], s["mfyd"], s["cxd"], s["cyd"], gd,
        topo, n, h, config.hord_tr,
    )
    rec("tracer_advection", sorted(adv), [adv[k] for k in sorted(adv)])

    tracers = {name: s[name] for name in remapping.REMAP_TRACERS}
    rm = remapping.lagrangian_to_eulerian(
        tracers, s["pt"], s["delp"], s["delz"], s["peln"], s["u"], s["v"],
        s["w"], jnp.full_like(s["delp"], 0.28), s["q_con"], s["pkz"],
        s["pk"], s["pe"], s["phis"], s["ps"], jnp.zeros_like(s["ps"]),
        gd, config, n, h, True, config.consv_te, DT, do_sat_adj_fn=None,
    )
    rec("remapping", ["pt", "delp", "delz", "u", "v", "w", "pkz", "qvapor"],
        [rm["pt"], rm["delp"], rm["delz"], rm["u"], rm["v"], rm["w"],
         rm["pkz"], rm["tracers"]["qvapor"]])

    ua2, va2, _, _ = cubed_to_latlon(s["u"], s["v"], gd, topo, n, h, order=4)
    rec("c2l_ord4", ["ua", "va"], [ua2, va2])

    return out


def digest(arr):
    h, n = H, N_
    a = np.asarray(arr, np.float64)
    if a.ndim >= 3:
        a = a[:, h:h + n, h:h + n]
    flat = a.ravel()
    samples = flat[:: max(1, flat.size // 48)][:48]
    return dict(
        mean=float(np.nanmean(flat)), std=float(np.nanstd(flat)),
        min=float(np.nanmin(flat)), max=float(np.nanmax(flat)),
        samples=[float(x) for x in samples],
    )
