"""Per-section XLA cost analysis (flops / bytes accessed) at C48 f32,
on the CPU backend — identifies the logical-byte hogs without TPU time.
The TPU step is HBM-bound (see docs/ROADMAP.md), so 'bytes accessed' /
819 GB/s is the v5e speed-of-light estimate per section.

Usage: PYTHONPATH=... python scripts/section_cost.py [N]
"""
import dataclasses
import sys

import jax
import jax.numpy as jnp

jax.config.update("jax_platforms", "cpu")

from pace_tpu.grid.generation import generate_grid_data
from pace_tpu.models.fv3 import acoustics
from pace_tpu.models.fv3.config import DynamicalCoreConfig
from pace_tpu.models.fv3.dynamics import DynamicalCore
from pace_tpu.models.fv3.init.baroclinic import init_baroclinic_state
from pace_tpu.models.fv3.state import NQ, TRACER_NAMES
from pace_tpu.ops import moist_cv, remapping
from pace_tpu.ops import tracer_advection as tradv
from pace_tpu.ops.map_single import map_single, map_single_stacked
from pace_tpu.parallel.topology import get_topology
from pace_tpu.utils.gridtools import GridSizing

n = int(sys.argv[1]) if len(sys.argv) > 1 else 48
nz, h = 79, 3
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

HBM_GBPS = 819.0


def report(name, fn, arg):
    cost = jax.jit(fn).lower(arg).compile().cost_analysis()
    if isinstance(cost, list):
        cost = cost[0]
    by = cost.get("bytes accessed", 0.0)
    fl = cost.get("flops", 0.0)
    print(f"{name:34s} {by/1e9:8.2f} GB  {fl/1e9:8.1f} GF  "
          f"SoL {by/1e9/HBM_GBPS*1e3:6.2f} ms", flush=True)
    return by


report("full step", lambda st: core.step_dynamics(st), state)


def acoustics_only(args):
    s, cappa, wsd = args
    s = dict(s)
    s, cappa, wsd, _ = acoustics.acoustic_dynamics(
        s, cappa, gd, col, config, topo, n, h, 450.0, 1, wsd, vp)
    return (s, cappa, wsd)


report("acoustics (n_split=2)", acoustics_only, (s0, cappa, wsd0))


def tracers_only(s):
    s = dict(s)
    advected = {name: s[name] for name in TRACER_NAMES[:NQ]}
    advected = tradv.tracer_advection(
        advected, s["delp"], s["mfxd"], s["mfyd"], s["cxd"], s["cyd"],
        gd, topo, n, h, config.hord_tr)
    s.update(advected)
    return s


report("tracer advection", tracers_only, s0)


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


report("vertical remap (last_step)", remap_only, (s0, cappa, wsd0))

# ---- remap internals ----
pe1 = s0["pe"]
ps = pe1[..., -1]
ak = jnp.asarray(gd.vertical.ak, jnp.float32)
bk = jnp.asarray(gd.vertical.bk, jnp.float32)
ptop = gd.vertical.ptop
pe2 = jnp.concatenate(
    [jnp.full_like(pe1[..., :1], ptop),
     ak[1:nz] + bk[1:nz] * ps[..., None],
     pe1[..., -1:]], -1)
peln = s0["peln"]
pn2 = jnp.log(pe2)

report("  map pt (log-p)",
       lambda a: map_single(a, peln, pn2, n, h, 9, 1, qmin=184.0),
       s0["pt"])
stackq = jnp.stack([s0[name] for name in remapping.REMAP_TRACERS])
report("  map 9 tracers (stacked)",
       lambda q: map_single_stacked(q, pe1, pe2, n, h, 9, 0), stackq)
report("  map w", lambda a: map_single(a, pe1, pe2, n, h, 9, -2, qs=wsd0),
       s0["w"])
report("  map delz", lambda a: map_single(a, pe1, pe2, n, h, 9, 1),
       s0["delz"])
report("  map u", lambda a: map_single(a, pe1, pe2, n, h, 9, -1), s0["u"])
report("  moist_pt", lambda a: moist_cv.moist_pt(
    s0["qvapor"], s0["qliquid"], s0["qrain"], s0["qsnow"], s0["qice"],
    s0["qgraupel"], a, s0["delp"], s0["delz"], 0.608), s0["pt"])

# ---- acoustics internals (single substep pieces) ----
from pace_tpu.ops import c_sw as c_sw_mod  # noqa: E402
from pace_tpu.ops import d_sw as d_sw_mod  # noqa: E402

report("  c_sw", lambda a: c_sw_mod.c_sw(
    s0["delp"], s0["pt"], s0["u"], s0["v"], s0["w"], a, gd, n, h, 112.5,
    config.nord), s0["omga"])

ut0 = jnp.zeros_like(s0["delp"])


def dsw_fn(a):
    return d_sw_mod.d_sw(
        s0["delp"], s0["pt"], s0["u"], s0["v"], s0["w"], s0["uc"],
        s0["vc"], s0["ua"], s0["va"], a, s0["mfxd"], s0["mfyd"],
        s0["cxd"], s0["cyd"], s0["q_con"], jnp.zeros_like(s0["delp"]),
        s0["diss_estd"], ut0, ut0, gd, col, config, n, h, 225.0)


report("  d_sw", dsw_fn, s0["pt"])

from pace_tpu.ops import riemann  # noqa: E402

zh0 = jnp.concatenate([s0["phis"][..., None] / 9.80665 +
                       jnp.cumsum(-s0["delz"][..., ::-1], -1)[..., ::-1],
                       s0["phis"][..., None] / 9.80665], -1)


def riem3_fn(a):
    return riemann.riem_solver3(
        225.0, cappa, ptop, s0["phis"] / 9.80665, wsd0, s0["delz"],
        s0["q_con"], s0["delp"], a, zh0, s0["pe"],
        jnp.zeros_like(s0["pe"]), s0["pk"], s0["peln"], s0["w"],
        config.p_fac, config.beta, config.use_logp, last_call=True)


report("  riem_solver3", riem3_fn, s0["pt"])
