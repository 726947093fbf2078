"""Host-model embedding interface (GEOS wrapper analogue).

jnp port of ai2cm/pace fv3core/pace/fv3core/initialization/geos_wrapper.py
`GeosDycoreWrapper`: lets a host model (e.g. NASA GEOS) drive one dycore
step at a time with plain numpy arrays — namelist in, numpy state in,
numpy state out.  The tracer bundle `q` carries the 9 advected species on
a trailing axis, as in the Fortran interface.
"""

from __future__ import annotations

from typing import Dict, Union

import jax
import jax.numpy as jnp
import numpy as np

from pace_tpu.driver.performance import PerformanceCollector
from pace_tpu.grid.generation import generate_grid_data
from pace_tpu.models.fv3.config import DynamicalCoreConfig
from pace_tpu.models.fv3.dynamics import DynamicalCore
from pace_tpu.models.fv3.state import TRACER_NAMES, DycoreState
from pace_tpu.utils.gridtools import GridSizing
from pace_tpu.utils.namelist import Namelist

_IN_FIELDS = (
    "u", "v", "w", "delz", "pt", "delp", "ps", "pe", "pk", "peln", "pkz",
    "phis", "q_con", "omga", "ua", "va", "uc", "vc", "mfxd", "mfyd",
    "cxd", "cyd", "diss_estd",
)


class GeosDycoreWrapper:
    """numpy-in / numpy-out single-step dycore driver for host models."""

    def __init__(self, namelist: Union[Namelist, dict, str],
                 dtype=jnp.float32):
        if isinstance(namelist, str):
            namelist = Namelist.from_file(namelist)
        elif isinstance(namelist, dict):
            namelist = Namelist.from_f90nml(namelist)
        self.namelist = namelist
        self.perf_collector = PerformanceCollector("GEOS wrapper")
        self.dycore_config = DynamicalCoreConfig(
            **namelist.dycore_config_kwargs()
        )
        n = namelist.npx - 1
        self.sizing = GridSizing(n, namelist.npz)
        grid_data = generate_grid_data(n, namelist.npz, dtype=dtype)
        self.dycore = DynamicalCore(
            self.dycore_config, self.sizing, grid_data,
            timestep=float(namelist.dt_atmos),
        )
        self.dycore_state = DycoreState.init_zeros(self.sizing, dtype=dtype)
        self._dtype = dtype
        self._step = jax.jit(self.dycore.step_dynamics)

    def _put_fortran_data_in_dycore(self, q: np.ndarray,
                                    **fields) -> DycoreState:
        kw = {
            f.name: getattr(self.dycore_state, f.name)
            for f in self.dycore_state.__dataclass_fields__.values()
        }
        for name, arr in fields.items():
            kw[name] = jnp.asarray(arr, self._dtype)
        for i, name in enumerate(TRACER_NAMES):
            if i < q.shape[-1]:
                kw[name] = jnp.asarray(q[..., i], self._dtype)
        return DycoreState(**kw)

    def _prep_outputs_for_geos(self) -> Dict[str, np.ndarray]:
        s = self.dycore_state
        out = {
            name: np.asarray(jax.device_get(getattr(s, name)))
            for name in _IN_FIELDS
        }
        out["q"] = np.stack(
            [np.asarray(jax.device_get(getattr(s, name)))
             for name in TRACER_NAMES], -1,
        )
        return out

    def __call__(self, q: np.ndarray, **fields) -> Dict[str, np.ndarray]:
        """Run one dycore step.  `fields` are the _IN_FIELDS numpy arrays
        (any omitted field keeps its previous value); `q` is
        (..., n_tracers)."""
        with self.perf_collector.timestep_timer.clock("move_to_pace"):
            self.dycore_state = self._put_fortran_data_in_dycore(q, **fields)
        with self.perf_collector.timestep_timer.clock("dycore"):
            self.dycore_state = self._step(self.dycore_state)
            jax.block_until_ready(self.dycore_state.delp)
        with self.perf_collector.timestep_timer.clock("move_to_fortran"):
            return self._prep_outputs_for_geos()
