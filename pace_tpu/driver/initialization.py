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
