"""Type-name -> config-dataclass registry.

Port of ai2cm/pace driver/pace/driver/registry.py `Registry`: yaml sections
of the form {"type": name, "config": {...}} select and hydrate one of
several registered dataclasses.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional

from pace_tpu.driver._from_dict import ConfigError, from_dict


class Registry:
    def __init__(self, default_type: Optional[str] = None):
        self.registered: Dict[str, type] = {}
        self.default_type = default_type

    def register(self, type_name: str) -> Callable:
        def decorator(cls):
            if type_name in self.registered:
                raise ValueError(f"{type_name} already registered")
            self.registered[type_name] = cls
            return cls

        return decorator

    def from_dict(self, config: dict):
        type_name = config.get("type", self.default_type)
        if type_name is None:
            raise ConfigError("'type' key required")
        if type_name not in self.registered:
            raise ConfigError(
                f"unknown type {type_name!r}; registered: "
                f"{sorted(self.registered)}"
            )
        cls = self.registered[type_name]
        return from_dict(cls, config.get("config", {}))
