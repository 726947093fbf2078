"""State sanity checking between timesteps.

Port of ai2cm/pace driver/pace/driver/safety_checks.py `SafetyChecker` /
`VariableBounds`: registered per-variable bounds, checked against the
DycoreState; violations raise RuntimeError.
"""

from __future__ import annotations

from typing import ClassVar, Dict, Optional

import jax
import numpy as np


class VariableBounds:
    def __init__(self, minimum_value: Optional[float] = None,
                 maximum_value: Optional[float] = None,
                 compute_domain_only: bool = False) -> None:
        self.minimum_value = minimum_value
        self.maximum_value = maximum_value
        self.compute_domain_only = compute_domain_only


class SafetyChecker:
    """Checks registered state variables against bounds.

    Raises:
        NotImplementedError: doubly-registered variables or variables
            missing from the state
        RuntimeError: variables outside the specified bounds
    """

    checks: ClassVar[Dict[str, VariableBounds]] = {}

    def __init__(self, sizing=None):
        self.sizing = sizing

    @classmethod
    def register_variable(cls, name: str,
                          minimum_value: Optional[float] = None,
                          maximum_value: Optional[float] = None,
                          compute_domain_only: bool = False):
        if name in cls.checks:
            raise NotImplementedError("Can only register variables once")
        cls.checks[name] = VariableBounds(
            minimum_value, maximum_value, compute_domain_only
        )

    @classmethod
    def clear_all_checks(cls):
        cls.checks.clear()

    def check_state(self, state):
        for variable, bounds in self.checks.items():
            if not hasattr(state, variable):
                raise NotImplementedError(
                    f"Variable {variable} is not in the state"
                )
            arr = np.asarray(jax.device_get(getattr(state, variable)))
            if bounds.compute_domain_only and self.sizing is not None:
                h, n = self.sizing.halo, self.sizing.n
                arr = arr[:, h:h + n, h:h + n]
            min_val = float(arr.min())
            max_val = float(arr.max())
            if bounds.minimum_value is not None \
                    and min_val < bounds.minimum_value:
                raise RuntimeError(
                    f"Variable {variable} is outside of its specified "
                    f"bounds: {min_val} < {bounds.minimum_value}"
                )
            if bounds.maximum_value is not None \
                    and max_val > bounds.maximum_value:
                raise RuntimeError(
                    f"Variable {variable} is outside of its specified "
                    f"bounds: {max_val} > {bounds.maximum_value}"
                )
