"""The FV3 dynamical core: one full model timestep (fv_dynamics).

jnp port of ai2cm/pace fv3core/pace/fv3core/stencils/fv_dynamics.py
`DynamicalCore`: fv_setup -> pt to potential-density temperature ->
k_split x { acoustic substeps -> tracer advection -> vertical remapping }
-> negative-tracer adjustment -> D-grid to lat/lon winds.

The whole step is a pure function of DycoreState, jittable as one XLA
program (replacing the reference's DaCe whole-program orchestration).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from pace_tpu.models.fv3 import acoustics
from pace_tpu.models.fv3.config import DynamicalCoreConfig, get_column_namelist
from pace_tpu.models.fv3.state import NQ, TRACER_NAMES, DycoreState
from pace_tpu.ops import c2l_ord, moist_cv, neg_adj3, remapping
from pace_tpu.ops import tracer_advection as tradv
from pace_tpu.ops.del2cubed import hyperdiffusion
from pace_tpu.ops import saturation_adjustment as satadj
from pace_tpu.parallel import halo as halo_mod
from pace_tpu.parallel.topology import get_topology
from pace_tpu.utils import constants, timing
from pace_tpu.utils.checkpointer import checkpoint
from pace_tpu.utils.debug import nancheck
from pace_tpu.utils.gridtools import GridSizing


class DynamicalCore:
    """Configures and steps the FV3 dycore (API analogue of the reference
    DynamicalCore; the compute path is the pure function `step`)."""

    def __init__(self, config: DynamicalCoreConfig, sizing: GridSizing,
                 grid_data, timestep: float):
        self.config = config
        self.sizing = sizing
        self.grid_data = grid_data
        self.timestep = timestep
        if config.hydrostatic:
            raise NotImplementedError("hydrostatic mode is not implemented")
        if config.consv_te > 0:
            raise NotImplementedError("consv_te > 0 needs a global reduction")
        self.topo = get_topology(sizing.n, sizing.halo)
        self.column_namelist = get_column_namelist(config, sizing.nz)
        import numpy as np
        ak = np.asarray(jax.device_get(grid_data.vertical.ak))
        bk = np.asarray(jax.device_get(grid_data.vertical.bk))
        ph = ak + bk * 1.0e5
        self.vertical_params = dict(
            ak=ak, bk=bk, dp_ref=ph[1:] - ph[:-1],
            pfull=(ph[1:] - ph[:-1]) / np.log(ph[1:] / ph[:-1]),
        )

    def step_dynamics(self, state: DycoreState) -> DycoreState:
        return fv_dynamics(
            state, self.grid_data, self.column_namelist, self.config,
            self.topo, self.sizing.n, self.sizing.halo, self.timestep,
            self.vertical_params,
        )

    __call__ = step_dynamics

    def build_sectioned_step(self):
        """Profiling mode: the same fv_dynamics split into its three
        phases as SEPARATE jits with host timing between them — the
        analogue of the reference's "DynCore" / "TracerAdvection" /
        "Remapping" timer sections (fv_dynamics.py:497-610,
        driver/pace/driver/performance/collector.py:60-153).

        Returns step(state, timer) -> state.  Costs extra dispatches and
        forgoes cross-phase XLA fusion/donation, so it is only built when
        performance_config.sections is true; the monolithic
        `step_dynamics` stays the production path.
        """
        import functools

        gd, col = self.grid_data, self.column_namelist
        config, topo = self.config, self.topo
        n, h = self.sizing.n, self.sizing.halo
        vp = self.vertical_params
        mdt = self.timestep / config.k_split

        pre = jax.jit(lambda s: _preamble(dict(s), config, n, h))

        @functools.partial(jax.jit, static_argnums=3)
        def acou(s, cappa, wsd, n_map):
            return _phase_acoustics(
                dict(s), cappa, wsd, gd, col, config, topo, n, h, mdt,
                n_map, vp,
            )

        tra = jax.jit(
            lambda s, dp0: _phase_tracer_advection(
                dict(s), dp0, gd, topo, n, h, config
            )
        )

        @functools.partial(jax.jit, static_argnums=3)
        def rem(s, cappa, wsd, last_step):
            return _phase_remap(
                dict(s), cappa, wsd, gd, config, topo, n, h, last_step,
                mdt, vp,
            )

        post = jax.jit(lambda s: _postlude(dict(s), gd, topo, n, h, config))

        def step(state: DycoreState, timer) -> DycoreState:
            s = {f.name: getattr(state, f.name)
                 for f in dataclasses.fields(state)}
            s, cappa, wsd = pre(s)
            for k_loop in range(config.k_split):
                dp_initial = s["delp"]
                with timer.clock("DynCore"):
                    s, cappa, wsd = acou(s, cappa, wsd, k_loop + 1)
                    timing.fence(s["delp"])
                with timer.clock("TracerAdvection"):
                    s = tra(s, dp_initial)
                    timing.fence(s["qvapor"])
                with timer.clock("Remapping"):
                    s, cappa = rem(
                        s, cappa, wsd, k_loop == config.k_split - 1
                    )
                    timing.fence(s["delp"])
            return post(s)

        return step


def _preamble(s: dict, config: DynamicalCoreConfig, n: int, h: int):
    """compute_preamble: fv_setup + pt -> potential-density temperature."""
    # named in-model savepoints (reference fv_dynamics.py:321-341
    # _checkpoint_fvdynamics): no-ops unless a checkpointer is active
    checkpoint("FVDynamics-In", sizing=(n, h), u=s["u"], v=s["v"], w=s["w"],
               delp=s["delp"], pt=s["pt"], delz=s["delz"],
               qvapor=s["qvapor"])
    q_con, cvm, pkz, cappa, dp1 = moist_cv.fv_setup(
        s["qvapor"], s["qliquid"], s["qrain"], s["qsnow"], s["qice"],
        s["qgraupel"], s["pt"], s["delp"], s["delz"],
        moist_phys=config.moist_phys,
    )
    s["q_con"] = q_con
    s["pkz"] = pkz
    s["pt"] = s["pt"] * (1.0 + dp1) * (1.0 - q_con) / pkz
    nancheck("fv_setup", n, h, pt=s["pt"], q_con=q_con, pkz=pkz)
    wsd = jnp.zeros_like(s["ps"])
    return s, cappa, wsd


def _phase_acoustics(s: dict, cappa, wsd, gd, col,
                     config: DynamicalCoreConfig, topo, n: int, h: int,
                     mdt: float, n_map: int, vp: dict):
    """One k_split iteration's acoustic substeps (reference timer
    section "DynCore", fv_dynamics.py:497)."""
    s, cappa, wsd, _pem = acoustics.acoustic_dynamics(
        s, cappa, gd, col, config, topo, n, h, mdt, n_map, wsd, vp,
    )
    nancheck("acoustic_dynamics", n, h, u=s["u"], v=s["v"], w=s["w"],
             delp=s["delp"], pt=s["pt"], delz=s["delz"])
    return s, cappa, wsd


def _phase_tracer_advection(s: dict, dp_initial, gd, topo, n: int, h: int,
                            config: DynamicalCoreConfig):
    """Sub-cycled 2D tracer advection (reference timer section
    "TracerAdvection")."""
    if not config.z_tracer:
        raise NotImplementedError("z_tracer=False")
    advected = {name: s[name] for name in TRACER_NAMES[:NQ]}
    # reference fv_dynamics.py:377-398 _checkpoint_tracer_advection
    checkpoint("Tracer2D1L-In", sizing=(n, h), qvapor=advected["qvapor"],
               qliquid=advected["qliquid"], dp1=dp_initial,
               mfxd=s["mfxd"], mfyd=s["mfyd"])
    advected = tradv.tracer_advection(
        advected, dp_initial, s["mfxd"], s["mfyd"], s["cxd"],
        s["cyd"], gd, topo, n, h, config.hord_tr,
        dynamic_subcycle=config.dynamic_tracer_subcycle,
    )
    s.update(advected)
    nancheck("tracer_advection", n, h,
             **{k: advected[k] for k in list(advected)[:3]})
    checkpoint("Tracer2D1L-Out", sizing=(n, h), qvapor=s["qvapor"],
               qliquid=s["qliquid"], mfxd=s["mfxd"], mfyd=s["mfyd"])
    return s


def _phase_remap(s: dict, cappa, wsd, gd, config: DynamicalCoreConfig,
                 topo, n: int, h: int, last_step: bool, mdt: float,
                 vp: dict):
    """Vertical remapping + (last step) omega (reference timer section
    "Remapping", fv_dynamics.py:399-422)."""
    checkpoint("Remapping-In", sizing=(n, h), pt=s["pt"], delp=s["delp"],
               delz=s["delz"], u=s["u"], v=s["v"], w=s["w"])
    tracers = {name: s[name] for name in remapping.REMAP_TRACERS}
    sat_fn = None
    if config.do_sat_adj:
        def sat_fn(dp1_b, trc, hs, peln, delp, delz, q_con_, pt, pkz_,
                   cappa_, zvir, mdt_, last_step_, akap):
            return satadj.saturation_adjustment(
                dp1_b, trc, hs, peln, delp, delz, q_con_, pt, pkz_,
                cappa_, zvir, mdt_, last_step_, akap, gd, config, n, h,
                vp=vp,
            )
    out = remapping.lagrangian_to_eulerian(
        tracers, s["pt"], s["delp"], s["delz"], s["peln"], s["u"],
        s["v"], s["w"], cappa, s["q_con"], s["pkz"], s["pk"], s["pe"],
        s["phis"], s["ps"], wsd, gd, config, n, h, last_step,
        config.consv_te, mdt, do_sat_adj_fn=sat_fn,
    )
    s.update(out["tracers"])
    for name in ("pt", "delp", "delz", "peln", "u", "v", "w", "q_con",
                 "pkz", "pk", "pe", "ps"):
        s[name] = out[name]
    cappa = out["cappa"]
    checkpoint("Remapping-Out", sizing=(n, h), pt=s["pt"], delp=s["delp"],
               delz=s["delz"], u=s["u"], v=s["v"], w=s["w"])
    nancheck("lagrangian_to_eulerian", n, h, pt=s["pt"],
             delp=s["delp"], u=s["u"], v=s["v"], w=s["w"], pkz=s["pkz"])

    if last_step:
        # omega from w, then hyperdiffuse it
        s["omga"] = s["delp"] / s["delz"] * s["w"]
        if config.nf_omega > 0:
            s["omga"] = halo_mod.halo_update_scalar(
                s["omga"], topo.scalar_spec("center")
            )
            s["omga"] = hyperdiffusion(
                s["omga"], gd, 0.18 * gd.damping.da_min, n, h,
                nmax=config.nf_omega,
            )
    return s, cappa


def _postlude(s: dict, gd, topo, n: int, h: int,
              config: DynamicalCoreConfig) -> DycoreState:
    """Negative-tracer adjustment + D-grid -> lat/lon A-grid winds."""
    tracers = {name: s[name] for name in remapping.REMAP_TRACERS}
    tracers, s["pt"] = neg_adj3.adjust_negative_tracers(
        tracers, s["pt"], s["delp"]
    )
    s.update(tracers)

    ua, va, u, v = c2l_ord.cubed_to_latlon(
        s["u"], s["v"], gd, topo, n, h, order=config.c2l_ord
    )
    s["ua"], s["va"] = ua, va
    s["u"], s["v"] = u, v
    nancheck("cubed_to_latlon", n, h, ua=ua, va=va, pt=s["pt"])

    checkpoint("FVDynamics-Out", sizing=(n, h), u=s["u"], v=s["v"], w=s["w"],
               delp=s["delp"], pt=s["pt"], delz=s["delz"],
               qvapor=s["qvapor"])
    return DycoreState(**s)


def fv_dynamics(
    state: DycoreState, gd, col, config: DynamicalCoreConfig, topo,
    n: int, h: int, timestep: float, vp: dict,
) -> DycoreState:
    s = {f.name: getattr(state, f.name) for f in dataclasses.fields(state)}
    s, cappa, wsd = _preamble(s, config, n, h)
    k_split = config.k_split
    for k_loop in range(k_split):
        dp_initial = s["delp"]
        s, cappa, wsd = _phase_acoustics(
            s, cappa, wsd, gd, col, config, topo, n, h,
            timestep / k_split, k_loop + 1, vp,
        )
        s = _phase_tracer_advection(s, dp_initial, gd, topo, n, h, config)
        s, cappa = _phase_remap(
            s, cappa, wsd, gd, config, topo, n, h,
            k_loop == k_split - 1, timestep / k_split, vp,
        )
    return _postlude(s, gd, topo, n, h, config)
