"""The model driver: configuration, initialization, time loop, output.

Port of ai2cm/pace driver/pace/driver/driver.py (`DriverConfig`, `Driver`)
re-designed TPU-native:

- the whole model step (dycore + physics + coupler) is ONE jitted pure
  function of DycoreState, compiled once and reused each timestep — the
  analogue of the reference's DaCe whole-program orchestration;
- domain decomposition is a jax.sharding Mesh over (tile, x, y) with
  GSPMD inserting the halo-exchange collectives, replacing the
  reference's MPI CubedSphereCommunicator / layout config;
- no stencil_config/backend section: XLA is the only backend.
"""

from __future__ import annotations

import dataclasses
import functools
import logging
import warnings
from datetime import timedelta
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from pace_tpu.driver import diagnostics as diag_mod
from pace_tpu.driver._from_dict import from_dict
from pace_tpu.driver.initialization import InitializerSelector
from pace_tpu.driver.performance import PerformanceConfig
from pace_tpu.driver.restart import RestartConfig
from pace_tpu.driver.safety_checks import SafetyChecker
from pace_tpu.driver.state import DriverState
from pace_tpu.grid.generation import generate_grid_data
from pace_tpu.models.coupler import DycoreToPhysics, UpdateAtmosphereState
from pace_tpu.models.fv3.config import DynamicalCoreConfig
from pace_tpu.parallel import copyops
from pace_tpu.models.fv3.dynamics import DynamicalCore
from pace_tpu.models.physics.config import PhysicsConfig
from pace_tpu.models.physics.physics import Physics
from pace_tpu.utils import timing
from pace_tpu.utils.gridtools import GridSizing


@dataclasses.dataclass
class MeshConfig:
    """Device mesh over (tile, x, y); tile must divide 6.

    Multi-host: set ``multihost: true`` to call
    ``jax.distributed.initialize`` before building the mesh (on Cloud TPU
    pods the coordinator/process fields auto-detect from the environment;
    set them explicitly elsewhere).  ``dcn_mesh_shape`` places the slow
    DCN (data-center network) axes outermost via
    ``mesh_utils.create_hybrid_device_mesh`` so halo collectives ride ICI
    within a slice — the analogue of the reference's node-aware MPI rank
    placement (ai2cm/pace util/pace/util/communicator.py partitioner
    layout).  Elementwise, ``layout[i] = dcn_mesh_shape[i] * ici[i]``.
    """

    layout: Tuple[int, int, int] = (1, 1, 1)
    multihost: bool = False
    coordinator_address: Optional[str] = None
    num_processes: Optional[int] = None
    process_id: Optional[int] = None
    dcn_mesh_shape: Optional[Tuple[int, int, int]] = None

    def build(self):
        from jax.sharding import Mesh

        if self.multihost:
            jax.distributed.initialize(
                coordinator_address=self.coordinator_address,
                num_processes=self.num_processes,
                process_id=self.process_id,
            )
        n_req = self.layout[0] * self.layout[1] * self.layout[2]
        if n_req == 1 and not self.multihost:
            return None
        if self.dcn_mesh_shape is not None:
            from jax.experimental import mesh_utils

            ici = tuple(
                l // d for l, d in zip(self.layout, self.dcn_mesh_shape)
            )
            if tuple(
                i * d for i, d in zip(ici, self.dcn_mesh_shape)
            ) != tuple(self.layout):
                raise ValueError(
                    f"dcn_mesh_shape {self.dcn_mesh_shape} does not "
                    f"divide layout {self.layout}"
                )
            devices = mesh_utils.create_hybrid_device_mesh(
                ici, self.dcn_mesh_shape
            )
        else:
            devices = np.array(jax.devices()[:n_req]).reshape(self.layout)

        return Mesh(devices, ("tile", "x", "y"))


@dataclasses.dataclass
class GridConfig:
    """Generated-grid options (reference driver/pace/driver/grid.py:82
    GeneratedGridConfig): Schmidt stretching and vertical-table override."""

    stretch_factor: Optional[float] = None
    lon_target: float = 350.0
    lat_target: float = -90.0
    eta_file: Optional[str] = None


@dataclasses.dataclass
class DriverConfig:
    """Configuration for a model run (reference driver.py:46-210).

    Attributes:
        initialization: initial-condition selector
        nx_tile: gridpoints per horizontal tile dimension
        nz: vertical levels
        dt_atmos: timestep (s)
        mesh: device-mesh layout (replaces the reference's MPI layout)
        grid_config: stretched-grid / eta-file options
        dtype: "float32" (TPU production) or "float64"
    """

    initialization: InitializerSelector
    nx_tile: int
    nz: int
    dt_atmos: float
    mesh: MeshConfig = dataclasses.field(default_factory=MeshConfig)
    grid_config: GridConfig = dataclasses.field(default_factory=GridConfig)
    diagnostics_config: diag_mod.DiagnosticsConfig = dataclasses.field(
        default_factory=diag_mod.DiagnosticsConfig
    )
    performance_config: PerformanceConfig = dataclasses.field(
        default_factory=PerformanceConfig
    )
    dycore_config: DynamicalCoreConfig = dataclasses.field(
        default_factory=DynamicalCoreConfig
    )
    physics_config: PhysicsConfig = dataclasses.field(
        default_factory=PhysicsConfig
    )
    restart_config: RestartConfig = dataclasses.field(
        default_factory=RestartConfig
    )
    days: int = 0
    hours: int = 0
    minutes: int = 0
    seconds: int = 0
    dycore_only: bool = False
    disable_step_physics: bool = False
    safety_check_frequency: Optional[int] = None
    dtype: str = "float32"

    @functools.cached_property
    def timestep(self) -> timedelta:
        return timedelta(seconds=self.dt_atmos)

    @functools.cached_property
    def total_time(self) -> timedelta:
        return timedelta(days=self.days, hours=self.hours,
                         minutes=self.minutes, seconds=self.seconds)

    def n_timesteps(self) -> int:
        if self.total_time < self.timestep:
            warnings.warn(
                f"total time {self.total_time} < timestep {self.timestep}"
            )
        return int(self.total_time / self.timestep)

    @classmethod
    def from_dict(cls, kwargs: dict) -> "DriverConfig":
        return from_dict(cls, kwargs)

    @classmethod
    def from_yaml(cls, path: str) -> "DriverConfig":
        import yaml

        with open(path) as f:
            return cls.from_dict(yaml.safe_load(f))


class Driver:
    def __init__(self, config: DriverConfig):
        self.config = config
        self.time = config.initialization.start_time
        self.performance_collector = config.performance_config.build()
        self.profiler = config.performance_config.build_profiler()
        dtype = jnp.float64 if config.dtype == "float64" else jnp.float32
        if dtype == jnp.float64 and not jax.config.jax_enable_x64:
            warnings.warn("dtype=float64 requested without jax_enable_x64")

        with self.performance_collector.total_timer.clock("initialization"):
            sizing = GridSizing(config.nx_tile, config.nz)
            gc = config.grid_config
            grid_data = generate_grid_data(
                config.nx_tile, config.nz, dtype=dtype,
                stretch_factor=gc.stretch_factor,
                lon_target=gc.lon_target, lat_target=gc.lat_target,
                eta_file=gc.eta_file,
            )
            dycore_state = config.initialization.get_dycore_state(
                sizing, dtype
            )
            self.state = DriverState(
                dycore_state=dycore_state, grid_data=grid_data,
                sizing=sizing, time=self.time,
            )
            self.dycore = DynamicalCore(
                config.dycore_config, sizing, grid_data, config.dt_atmos
            )
            if not (config.dycore_only or config.disable_step_physics):
                ptop = float(np.asarray(jax.device_get(
                    grid_data.vertical.ptop
                )))
                self.physics = Physics(
                    config.physics_config, grid_data.horizontal.area,
                    ptop, config.dt_atmos,
                )
                self.dycore_to_physics = DycoreToPhysics(sizing, dtype=dtype)
                self.end_of_step_update = UpdateAtmosphereState(
                    grid_data, self.dycore.topo, sizing, config.dt_atmos,
                    c2l_order=config.dycore_config.c2l_ord,
                )
            else:
                self.physics = None

            self.mesh = config.mesh.build()
            # multi-chip default: the structured (CopyOp/ppermute) halo
            # lowering — whole-array gathers force GSPMD to materialize
            # a REPLICATED full-tile temp per device (measured: the C384
            # coupled step's per-device peak barely drops from 96 to 384
            # devices under the gather form), while the static-slice
            # form lowers to neighbor collective-permutes at
            # halo-surface bytes.  Applied here (not in MeshConfig.build,
            # which unit tests call) so only a real Driver changes the
            # process default; PACE_HALO or a programmatic HALO_MODE
            # assignment always wins.
            if self.mesh is not None:
                copyops.select_default_for_mesh(self.mesh.size)
            self._step = self._build_step()
            self.diagnostics = (
                config.diagnostics_config.diagnostics_factory(sizing)
            )
            self.safety_checker = SafetyChecker(sizing)
            if config.safety_check_frequency:
                _register_default_checks()

    def _build_step(self):
        import dataclasses as dc

        dycore = self.dycore
        physics = self.physics
        cfg = self.config.dycore_config
        do_sg = cfg.fv_sg_adj > 0 and physics is not None

        def physics_step(state):
            u_dt0 = v_dt0 = None
            if do_sg:
                from pace_tpu.ops.fv_subgridz import (
                    dry_convective_adjustment,
                )

                s = {f.name: getattr(state, f.name)
                     for f in dc.fields(state)}
                ptop = float(np.asarray(jax.device_get(
                    self.state.grid_data.vertical.ptop
                )))
                s, u_dt0, v_dt0 = dry_convective_adjustment(
                    s, self.config.dt_atmos, cfg.fv_sg_adj,
                    cfg.n_sponge, nwat=cfg.nwat, ptop=ptop,
                )
                state = type(state)(**s)
            phy = self.dycore_to_physics(state)
            phy = physics(phy)
            return self.end_of_step_update(
                state, phy, u_dt0=u_dt0, v_dt0=v_dt0
            )

        def step(state):
            state = dycore.step_dynamics(state)
            if physics is not None:
                state = physics_step(state)
            return state

        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            mesh = self.mesh

            def shard(leaf):
                if hasattr(leaf, "ndim") and leaf.ndim >= 3:
                    spec = P("tile", "x", "y")
                elif hasattr(leaf, "ndim") and leaf.ndim >= 1:
                    spec = P("tile")
                else:
                    spec = P()
                return jax.device_put(leaf, NamedSharding(mesh, spec))

            self.state.dycore_state = jax.tree_util.tree_map(
                shard, self.state.dycore_state
            )
        if self.config.performance_config.sections:
            # per-section profiling path: separate jits per phase, host
            # timing into the per-step timer (no donation — the state
            # threads through several dispatches per step)
            dyn_sectioned = dycore.build_sectioned_step()
            phys_jit = jax.jit(physics_step) if physics is not None \
                else None
            timer = self.performance_collector.timestep_timer

            def sectioned(state):
                state = dyn_sectioned(state, timer)
                if phys_jit is not None:
                    with timer.clock("Physics"):
                        state = phys_jit(state)
                        timing.fence(state.delp)
                return state

            return sectioned
        # donate the input state: in and out states have identical
        # pytree structure/shapes, so XLA reuses the buffers in place —
        # roughly halves the state footprint per step (the C192 memory
        # lever, BASELINE.md north star 4).  The step loop never reads a
        # state after stepping it (diagnostics read the returned state).
        return jax.jit(step, donate_argnums=0)

    def step_all(self):
        config = self.config
        if config.diagnostics_config.output_initial_state:
            self.diagnostics.store(self.time, self.state.dycore_state)
        n_steps = config.n_timesteps()
        self.profiler.enable()
        with self.performance_collector.total_timer.clock("total"):
            for step in range(n_steps):
                self.performance_collector.start_step()
                self.state.dycore_state = self._step(
                    self.state.dycore_state
                )
                jax.block_until_ready(self.state.dycore_state.delp)
                self.performance_collector.end_step()
                self.time += config.timestep
                if (step + 1) % config.diagnostics_config.output_frequency \
                        == 0:
                    self.diagnostics.store(
                        self.time, self.state.dycore_state
                    )
                if config.safety_check_frequency and \
                        (step + 1) % config.safety_check_frequency == 0:
                    self.safety_checker.check_state(
                        self.state.dycore_state
                    )
                config.restart_config.write_intermediate_if_enabled(
                    self.state, step + 1, self.time
                )
        self.profiler.dump_stats()
        self.state.time = self.time

    def cleanup(self):
        """Flush perf JSON, diagnostics, and the final restart.

        Called from run.py's try/finally, so it must survive a crashed
        step: the step jit donates its input (driver state buffers are
        deleted at dispatch), so after a mid-step failure the live state
        is unreadable — each flush is independent and a failure in one
        (e.g. 'Array has been deleted') must not mask the original
        exception or block the perf report.  Crash-resumable state comes
        from the intermediate restarts (restart_config.save_frequency),
        which are written from completed steps only."""
        logger = logging.getLogger("pace_tpu.driver")
        report = self.performance_collector.write_out_performance(
            "jax/xla", self.config.dt_atmos
        )
        for what, flush in (
            ("grid diagnostics",
             lambda: self.diagnostics.store_grid(self.state.grid_data)),
            ("diagnostics", self.diagnostics.cleanup),
            ("final restart",
             lambda: self.config.restart_config.write_final_if_enabled(
                 self.state, self.time)),
        ):
            try:
                flush()
            except Exception:
                logger.exception(
                    "cleanup: could not flush %s (state buffers may have "
                    "been donated by a crashed step; intermediate restarts, "
                    "if enabled, are unaffected)", what,
                )
        return report


def _register_default_checks():
    if SafetyChecker.checks:
        return
    SafetyChecker.register_variable(
        "pt", minimum_value=150.0, maximum_value=350.0,
        compute_domain_only=True,
    )
    SafetyChecker.register_variable(
        "delp", minimum_value=0.01, compute_domain_only=True
    )
    SafetyChecker.register_variable(
        "u", minimum_value=-250.0, maximum_value=250.0,
        compute_domain_only=True,
    )
    SafetyChecker.register_variable(
        "v", minimum_value=-250.0, maximum_value=250.0,
        compute_domain_only=True,
    )
