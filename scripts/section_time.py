"""In-graph section timing at C48 f32 on the real TPU (fori_loop over each
section so the ~19 ms tunnel dispatch amortizes)."""
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from bench import _wait_for_backend

_wait_for_backend()

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
    # carry shape must be preserved across fori_loop iterations: thread
    # the solver outputs back into the state dict.
    s, cappa_, wsd = args
    s = dict(s)
    dz, zh, pe, ppe, pk3, pk, peln, w = riemann.riem_solver3(
        225.0, cappa_, gd.vertical.ptop, zs, wsd, s["delz"], s["q_con"],
        s["delp"], s["pt"], zh0, s["pe"], jnp.zeros_like(s["pe"]),
        s["pk"], s["peln"], s["w"], config.p_fac, config.beta,
        config.use_logp, last_call=True)
    s.update(delz=dz, pe=pe, pk=pk, peln=peln, w=w)
    return (s, cappa_, wsd)


timeit("riem_solver3 (scan path)", riem3_fn, (s0, cappa, wsd0))

_os.environ["PACE_PALLAS_SIM1"] = "1"
timeit("riem_solver3 (pallas sim1)", riem3_fn, (s0, cappa, wsd0))
_os.environ["PACE_PALLAS_SIM1"] = "0"


def dzd_fn(a):
    zh_new, _ws = updatedzd.update_dz_d(
        zs, a, crx, cry, xfx_, yfx_, gd, col, config, n, h, 225.0,
        vp["dp_ref"])
    return zh_new


timeit("update_dz_d", dzd_fn, zh0)

pkc0 = jnp.zeros_like(s0["pe"])
pk30 = jnp.zeros_like(s0["pe"])
gz0 = zh0 * 9.80665


def nhpg_fn(args):
    u, v = args
    out = nhpg_mod.nh_p_grad(
        u, v, pkc0, gz0, pk30, s0["delp"], gd, n, h, 225.0,
        gd.vertical.ptop, 0.28571428)
    return (out[0], out[1])


timeit("nh_p_grad", nhpg_fn, (s0["u"], s0["v"]))


# ---- remap sub-sections (round 3): where do the remap ms go? ----
from pace_tpu.ops import fillz as fillz_mod  # noqa: E402
from pace_tpu.ops import moist_cv as mcv  # noqa: E402
from pace_tpu.ops.map_single import (  # noqa: E402
    map_single, map_single_multi, map_single_stacked,
)
from pace_tpu.utils import constants as cst  # noqa: E402

pe1_ = s0["pe"]
ak_ = jnp.asarray(gd.vertical.ak, jnp.float32)
bk_ = jnp.asarray(gd.vertical.bk, jnp.float32)
ps_ = pe1_[..., -1]
pe2_ = jnp.concatenate(
    [jnp.full_like(pe1_[..., :1], gd.vertical.ptop),
     ak_[1:nz] + bk_[1:nz] * ps_[..., None], pe1_[..., -1:]], -1)
dp2_ = pe2_[..., 1:] - pe2_[..., :-1]
pn2_ = jnp.log(pe2_)
stack0 = jnp.stack([s0[nm] for nm in remapping.REMAP_TRACERS])


def tracer_remap_fn(q):
    return map_single_stacked(q, pe1_, pe2_, n, h, config.kord_tr, 0)


timeit("remap: 9-tracer stack", tracer_remap_fn, stack0)


from pace_tpu.ops.remap_profile import remap_profile as _rp  # noqa: E402
from pace_tpu.ops.map_single import (  # noqa: E402
    lagrangian_contributions_stacked as _lcs,
)

dp1_ = pe1_[..., 1:] - pe1_[..., :-1]
zqs_ = jnp.zeros(s0["pt"].shape[:-1], jnp.float32)


def profile_only_fn(q):
    a1, a2, a3, a4 = jax.vmap(
        lambda t: _rp(zqs_, t, dp1_, n, h, config.kord_tr, 0))(q)
    return a1 + a2 + a3 + a4  # force all four outputs


timeit("remap: 9-tracer profile only", profile_only_fn, stack0)

_coef = jax.vmap(
    lambda t: _rp(zqs_, t, dp1_, n, h, config.kord_tr, 0))(stack0)


def contraction_only_fn(coefs):
    a1, a2, a3, a4 = coefs
    out = _lcs(pe1_, pe2_, a1, a2, a3, a4, dp1_)
    return (out, a2, a3, a4)


timeit("remap: 9-tracer contraction only",
       lambda c: contraction_only_fn(c), _coef)


def fillz_fn(q):
    return jax.vmap(lambda t: fillz_mod.fix_tracer(t, dp2_))(q)


timeit("remap: fillz (9 tracers)", fillz_fn, stack0)


def pt_remap_fn(p):
    return map_single(p, s0["peln"], pn2_, n, h,
                      abs(config.kord_tm), 1, qmin=184.0)


timeit("remap: pt (log-p)", pt_remap_fn, s0["pt"])


def wdelz_fn(args):
    w_, dz_ = args
    return tuple(map_single_multi(
        [(w_, config.kord_wz, -2, wsd0, 0.0),
         (dz_, config.kord_wz, 1, None, 0.0)], pe1_, pe2_, n, h))


timeit("remap: w+delz", wdelz_fn, (s0["w"], s0["delz"]))


def uv_remap_fn(args):
    u_, v_ = args
    from pace_tpu.ops.stencil_utils import shift as _shift
    pe_bot = pe1_[..., -1:]
    pe0_u = jnp.concatenate(
        [pe1_[..., :1],
         0.5 * (_shift(pe1_, 0, -1)[..., 1:] + pe1_[..., 1:])], -1)
    pe3_u = ak_ + 0.5 * bk_ * (_shift(pe_bot, 0, -1) + pe_bot)
    u_ = map_single(u_, pe0_u, pe3_u, n, h, config.kord_mt, -1)
    pe0_v = jnp.concatenate(
        [pe1_[..., :1],
         0.5 * (_shift(pe1_, -1)[..., 1:] + pe1_[..., 1:])], -1)
    pe3_v = jnp.concatenate(
        [jnp.broadcast_to(ak_[0], pe1_[..., :1].shape),
         (ak_ + 0.5 * bk_ * (_shift(pe_bot, -1) + pe_bot))[..., 1:]], -1)
    v_ = map_single(v_, pe0_v, pe3_v, n, h, config.kord_mt, -1)
    return (u_, v_)


timeit("remap: u+v", uv_remap_fn, (s0["u"], s0["v"]))


def moist_fn(args):
    pt_, delp_, delz_ = args
    cvm_, gz_, qc_, cp_, ptn = mcv.moist_pt(
        s0["qvapor"], s0["qliquid"], s0["qrain"], s0["qsnow"], s0["qice"],
        s0["qgraupel"], pt_, delp_, delz_, cst.ZVIR)
    qc2, gz2, cv2, cp2, pkz_ = mcv.moist_pkz(
        s0["qvapor"], s0["qliquid"], s0["qrain"], s0["qsnow"], s0["qice"],
        s0["qgraupel"], ptn, delp_, delz_, cst.ZVIR)
    return (ptn, delp_ + 0.0 * pkz_, delz_ + 0.0 * qc2)


timeit("remap: moist_pt+moist_pkz", moist_fn,
       (s0["pt"], s0["delp"], s0["delz"]))
