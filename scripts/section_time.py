"""In-graph section timing at C48 f32 on the real TPU (fori_loop over each
section so the ~19 ms tunnel dispatch amortizes)."""
import dataclasses
import time

import jax
import jax.numpy as jnp

from pace_tpu.grid.generation import generate_grid_data
from pace_tpu.models.fv3 import acoustics
from pace_tpu.models.fv3.config import DynamicalCoreConfig, get_column_namelist
from pace_tpu.models.fv3.dynamics import DynamicalCore
from pace_tpu.models.fv3.init.baroclinic import init_baroclinic_state
from pace_tpu.models.fv3.state import NQ, TRACER_NAMES
from pace_tpu.ops import moist_cv, remapping
from pace_tpu.ops import tracer_advection as tradv
from pace_tpu.parallel.topology import get_topology
from pace_tpu.utils.gridtools import GridSizing

n, nz, h = 48, 79, 3
sizing = GridSizing(n, nz)
gd = generate_grid_data(n, nz, dtype=jnp.float32)
config = DynamicalCoreConfig(do_sat_adj=False, k_split=1, n_split=2)
core = DynamicalCore(config, sizing, gd, timestep=450.0)
state = init_baroclinic_state(sizing, dtype=jnp.float32)
topo = get_topology(n, h)
col = core.column_namelist
vp = core.vertical_params

s0 = {f.name: getattr(state, f.name) for f in dataclasses.fields(state)}
q_con, cvm, pkz, cappa, dp1 = moist_cv.fv_setup(
    s0["qvapor"], s0["qliquid"], s0["qrain"], s0["qsnow"], s0["qice"],
    s0["qgraupel"], s0["pt"], s0["delp"], s0["delz"],
    moist_phys=config.moist_phys,
)
s0["q_con"], s0["pkz"] = q_con, pkz
s0["pt"] = s0["pt"] * (1.0 + dp1) * (1.0 - q_con) / pkz
wsd0 = jnp.zeros_like(s0["ps"])


def timeit(name, fn, arg, iters=10):
    f = jax.jit(lambda a: jax.lax.fori_loop(0, iters, lambda i, x: fn(x), a))
    out = f(arg)
    jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])
    t0 = time.perf_counter()
    out = f(arg)
    jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])
    dt = (time.perf_counter() - t0) / iters * 1000
    print(f"{name:28s} {dt:8.2f} ms", flush=True)
    return dt


timeit("full step", lambda st: core.step_dynamics(st), state, iters=8)


def acoustics_only(args):
    s, cappa, wsd = args
    s = dict(s)
    s, cappa, wsd, _ = acoustics.acoustic_dynamics(
        s, cappa, gd, col, config, topo, n, h, 450.0, 1, wsd, vp)
    return (s, cappa, wsd)


timeit("acoustics (n_split=2)", acoustics_only, (s0, cappa, wsd0), iters=8)


def tracers_only(s):
    s = dict(s)
    advected = {name: s[name] for name in TRACER_NAMES[:NQ]}
    advected = tradv.tracer_advection(
        advected, s["delp"], s["mfxd"], s["mfyd"], s["cxd"], s["cyd"],
        gd, topo, n, h, config.hord_tr)
    s.update(advected)
    return s


timeit("tracer advection", tracers_only, s0, iters=8)


def remap_only(args):
    s, cappa, wsd = args
    s = dict(s)
    tracers = {name: s[name] for name in remapping.REMAP_TRACERS}
    out = remapping.lagrangian_to_eulerian(
        tracers, s["pt"], s["delp"], s["delz"], s["peln"], s["u"], s["v"],
        s["w"], cappa, s["q_con"], s["pkz"], s["pk"], s["pe"], s["phis"],
        s["ps"], wsd, gd, config, n, h, True, 0.0, 450.0, None)
    s.update(out["tracers"])
    for name in ("pt", "delp", "delz", "peln", "u", "v", "w", "q_con",
                 "pkz", "pk", "pe", "ps"):
        s[name] = out[name]
    return (s, out["cappa"], wsd)


timeit("vertical remap (last_step)", remap_only, (s0, cappa, wsd0), iters=8)


# ---- fine-grained rows (round 2): vertical solver + dz/pgrad stages ----
from pace_tpu.ops import riemann, updatedzd, nh_p_grad as nhpg_mod  # noqa: E402
from pace_tpu.ops import fxadv  # noqa: E402
import numpy as np  # noqa: E402
import os as _os  # noqa: E402

zs = s0["phis"] / 9.80665
zh0 = jnp.concatenate(
    [zs[..., None] + jnp.cumsum(-s0["delz"][..., ::-1], -1)[..., ::-1],
     zs[..., None]], -1)
crx, cry, xfx_, yfx_, ut0, vt0 = fxadv.fx_adv(
    s0["uc"], s0["vc"], jnp.zeros_like(s0["delp"]),
    jnp.zeros_like(s0["delp"]), gd, n, h, 225.0)


def riem3_fn(args):
    s, cappa_, wsd = args
    return riemann.riem_solver3(
        225.0, cappa_, gd.vertical.ptop, zs, wsd, s["delz"], s["q_con"],
        s["delp"], s["pt"], zh0, s["pe"], jnp.zeros_like(s["pe"]),
        s["pk"], s["peln"], s["w"], config.p_fac, config.beta,
        config.use_logp, last_call=True)


timeit("riem_solver3 (scan path)", riem3_fn, (s0, cappa, wsd0))

_os.environ["PACE_PALLAS_SIM1"] = "1"
timeit("riem_solver3 (pallas sim1)", riem3_fn, (s0, cappa, wsd0))
_os.environ["PACE_PALLAS_SIM1"] = "0"


def dzd_fn(a):
    return updatedzd.update_dz_d(
        zs, a, crx, cry, xfx_, yfx_, gd, col, config, n, h, 225.0,
        vp["dp_ref"])


timeit("update_dz_d", dzd_fn, zh0)

pkc0 = jnp.zeros_like(s0["pe"])
pk30 = jnp.zeros_like(s0["pe"])
gz0 = zh0 * 9.80665


def nhpg_fn(args):
    u, v = args
    return nhpg_mod.nh_p_grad(
        u, v, pkc0, gz0, pk30, s0["delp"], gd, n, h, 225.0,
        gd.vertical.ptop, 0.28571428)


timeit("nh_p_grad", nhpg_fn, (s0["u"], s0["v"]))

_os.environ["PACE_PALLAS_SPLINE"] = "1"
timeit("vertical remap (pallas spline)", remap_only, (s0, cappa, wsd0),
       iters=8)
_os.environ["PACE_PALLAS_SPLINE"] = "0"
