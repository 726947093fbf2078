"""Nudging toward a reference state.

Port of ai2cm/pace util/pace/util/nudging.py (apply_nudging,
get_nudging_tendencies) for plain-array states: pure functions returning
the updated state instead of in-place Quantity mutation.
"""

from __future__ import annotations

from datetime import timedelta
from typing import Mapping


def _seconds(t):
    return t.total_seconds() if isinstance(t, timedelta) else float(t)


def get_nudging_tendencies(state: Mapping, reference_state: Mapping,
                           nudging_timescales: Mapping) -> dict:
    """Relaxation tendencies (reference - state) / timescale, per second."""
    out = {}
    for name, timescale in nudging_timescales.items():
        if name not in state:
            raise ValueError(
                f"no state variable to apply tendency for {name}"
            )
        out[name] = (
            reference_state[name] - state[name]
        ) / _seconds(timescale)
    return out


def apply_nudging(state: Mapping, reference_state: Mapping,
                  nudging_timescales: Mapping, timestep):
    """Returns (nudged_state, tendencies); state itself is not mutated."""
    tendencies = get_nudging_tendencies(
        state, reference_state, nudging_timescales
    )
    dt = _seconds(timestep)
    new_state = dict(state)
    for name, tendency in tendencies.items():
        if name not in state:
            raise ValueError(
                f"no state variable to apply tendency for {name}"
            )
        new_state[name] = state[name] + tendency * dt
    return new_state, tendencies
