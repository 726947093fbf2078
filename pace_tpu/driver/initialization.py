"""Initial-condition providers.

Port of ai2cm/pace driver/pace/driver/initialization.py: an Initializer
ABC with a registry-backed InitializerSelector; "baroclinic" (Jablonowski
& Williamson 2006) and "restart" are implemented.
"""

from __future__ import annotations

import abc
import dataclasses
from datetime import datetime
from typing import Optional

import jax.numpy as jnp

from pace_tpu.driver.registry import Registry
from pace_tpu.driver.restart import load_restart_arrays
from pace_tpu.driver._from_dict import from_dict as _from_dict


class Initializer(abc.ABC):
    @property
    @abc.abstractmethod
    def start_time(self) -> datetime:
        ...

    @abc.abstractmethod
    def get_dycore_state(self, sizing, dtype):
        ...


@dataclasses.dataclass
class InitializerSelector(Initializer):
    """yaml selector: {"type": "baroclinic", "config": {...}}."""

    type: str
    config: Initializer

    registry = Registry()

    @classmethod
    def register(cls, type_name):
        return cls.registry.register(type_name)

    @property
    def start_time(self) -> datetime:
        return self.config.start_time

    def get_dycore_state(self, sizing, dtype):
        return self.config.get_dycore_state(sizing, dtype)

    @classmethod
    def from_dict(cls, config: dict):
        instance = cls.registry.from_dict(config)
        return cls(config=instance, type=config["type"])


@InitializerSelector.register("baroclinic")
@dataclasses.dataclass
class BaroclinicInit(Initializer):
    """Jablonowski & Williamson baroclinic wave test case."""

    start_time_str: str = "2000-01-01 00:00:00"

    @property
    def start_time(self) -> datetime:
        return datetime.fromisoformat(self.start_time_str)

    def get_dycore_state(self, sizing, dtype):
        from pace_tpu.models.fv3.init.baroclinic import init_baroclinic_state

        return init_baroclinic_state(sizing, dtype=dtype)


@InitializerSelector.register("tropicalcyclone")
@dataclasses.dataclass
class TropicalCycloneConfig(Initializer):
    """Reed-Jablonowski tropical cyclone test case (FV3 test_case 55)."""

    start_time_str: str = "2000-01-01 00:00:00"

    @property
    def start_time(self) -> datetime:
        return datetime.fromisoformat(self.start_time_str)

    def get_dycore_state(self, sizing, dtype):
        from pace_tpu.models.fv3.init.tropical_cyclone import init_tc_state

        return init_tc_state(sizing, dtype=dtype)


@InitializerSelector.register("fortran_restart")
@dataclasses.dataclass
class FortranRestartInit(Initializer):
    """Start from legacy Fortran FMS `.res` tile restart files
    (fv_core.res.tile*.nc etc.), the analogue of the reference's
    `fortran_restart` initializer (driver/pace/driver/
    initialization.py:225 FortranRestartInit) backed by
    utils/legacy_restart.open_restart."""

    path: str = "RESTART"
    label: str = ""
    start_time_str: Optional[str] = None  # coupler.res wins when present

    @property
    def start_time(self) -> datetime:
        if self.start_time_str is not None:
            return datetime.fromisoformat(self.start_time_str)
        import os

        from pace_tpu.utils.legacy_restart import (
            COUPLER_RES_NAME,
            get_current_date_from_coupler_res,
        )

        coupler = os.path.join(self.path, COUPLER_RES_NAME)
        if os.path.exists(coupler):
            return get_current_date_from_coupler_res(coupler)
        return datetime(2000, 1, 1)

    def get_dycore_state(self, sizing, dtype):
        from pace_tpu.models.fv3.state import DycoreState
        from pace_tpu.utils.legacy_restart import open_restart

        arrays = open_restart(
            self.path, sizing, label=self.label, dtype=None
        )
        arrays.pop("time", None)
        # surface-wind diagnostics are not DycoreState fields
        arrays.pop("u_srf", None)
        arrays.pop("v_srf", None)
        state = DycoreState.init_zeros(sizing, dtype=dtype)
        return state.replace(
            **{k: jnp.asarray(v, dtype) for k, v in arrays.items()}
        )


@InitializerSelector.register("restart")
@dataclasses.dataclass
class RestartInit(Initializer):
    path: str = "RESTART"
    start_time_str: str = "2000-01-01 00:00:00"

    @property
    def start_time(self) -> datetime:
        return datetime.fromisoformat(self.start_time_str)

    def get_dycore_state(self, sizing, dtype):
        from pace_tpu.models.fv3.state import DycoreState

        arrays = load_restart_arrays(self.path)
        return DycoreState(
            **{k: jnp.asarray(v, dtype) for k, v in arrays.items()}
        )


@InitializerSelector.register("predefined")
@dataclasses.dataclass
class PredefinedStateInit(Initializer):
    """Start from an already-constructed DycoreState (reference
    driver/pace/driver/initialization.py:381 PredefinedStateInit).

    For programmatic use (tests, embedding in a larger jax program, the
    translate harness); not meaningfully constructible from yaml since
    the state holds device arrays.
    """

    dycore_state: object = None
    start_time_str: str = "2016-08-01 00:00:00"

    @property
    def start_time(self) -> datetime:
        return datetime.fromisoformat(self.start_time_str)

    def get_dycore_state(self, sizing, dtype):
        if self.dycore_state is None:
            raise ValueError(
                "predefined initializer requires a dycore_state object"
            )
        return self.dycore_state
