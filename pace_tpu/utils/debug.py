"""Numerical debug hooks.

`PACE_DEBUG_NANCHECK=1` turns on per-stage finiteness checking inside the
jitted model step: after each major op of fv_dynamics a host callback
asserts the compute domain of the stage's outputs is finite and reports
the first offending (stage, field) — the TPU-native analogue of the
reference's injected SDFG NaN-checker debug pass (ai2cm/pace
dsl/pace/dsl/dace/sdfg_debug_passes.py:247 sdfg_nan_checker).

Only the compute domain is checked: halo-padding cells legitimately hold
NaN mid-graph (see docs/KNOWN_ISSUES.md).  When the env var is unset the
hook is a literal no-op, so the production graph is unchanged.
"""

from __future__ import annotations

import os

import numpy as np

NANCHECK_ENABLED = os.environ.get("PACE_DEBUG_NANCHECK", "0") == "1"


class NaNDetected(RuntimeError):
    pass


def _host_check(stage: str, n: int, h: int, names, *arrays) -> None:
    for name, arr in zip(names, arrays):
        a = np.asarray(arr)
        if a.ndim >= 3:
            # strictly interior cells only: index h+n is a halo row for
            # cell-centered fields and (h+n, h+n) is a corner-wedge point,
            # both of which legitimately hold NaN mid-graph (see module
            # docstring) — including them would flag healthy runs
            a = a[:, h:h + n, h:h + n]
        if not np.isfinite(a).all():
            count = int((~np.isfinite(a)).sum())
            raise NaNDetected(
                f"non-finite values after stage {stage!r}: field {name!r} "
                f"has {count} bad points (of {a.size})"
            )


def nancheck(stage: str, n: int, h: int, **arrays) -> None:
    """Insert a finiteness assertion on the given arrays (jit-safe).

    No-op unless PACE_DEBUG_NANCHECK=1 was set at import time.
    """
    if not NANCHECK_ENABLED:
        return
    import jax

    names = tuple(arrays.keys())
    jax.debug.callback(_host_check, stage, n, h, names, *arrays.values())
