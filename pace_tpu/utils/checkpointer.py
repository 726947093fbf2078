"""Checkpointer hooks: savepoint-style state capture and validation.

Port of ai2cm/pace util/pace/util/checkpointer/ (base.py Checkpointer,
snapshots.py SnapshotCheckpointer, thresholds.py Threshold/
SavepointThresholds/ThresholdCalibrationCheckpointer, validation.py
ValidationCheckpointer) without the xarray dependency: snapshots are
in-memory numpy dicts; thresholds serialize to/from npz+json.
"""

from __future__ import annotations

import collections
import contextlib
import dataclasses
import json
from typing import Dict, List

import jax
import numpy as np

SavepointName = str
VariableName = str


def _to_numpy(array) -> np.ndarray:
    return np.asarray(jax.device_get(array))


class Checkpointer:
    """Base hook: called as checkpointer(savepoint_name, **arrays) at fixed
    points in the model."""

    def __call__(self, savepoint_name: str, **kwargs) -> None:
        raise NotImplementedError


# --- in-model savepoint hook -------------------------------------------------
#
# The reference instruments the dycore itself with named checkpoints
# (fv3core/pace/fv3core/stencils/fv_dynamics.py:321-422 _checkpoint_fvdynamics
# /_checkpoint_remapping_in/..., dyn_core.py:626-668 _checkpoint_csw/_dsw) and
# drives them from tests/savepoint/test_checkpoints.py.  Here the whole step
# is one jitted XLA program, so the hook is a host callback: `checkpoint()`
# emits nothing at all unless a checkpointer is active at TRACE time (the
# production graph is unchanged), and an emitted callback dispatches to
# whichever checkpointer is active at RUN time — so one compiled step serves
# calibration, snapshotting, and validation by swapping the active object.

_ACTIVE: "Checkpointer | None" = None


def set_checkpointer(cp) -> "Checkpointer | None":
    """Install `cp` as the active in-model checkpointer; returns previous."""
    global _ACTIVE
    prev = _ACTIVE
    _ACTIVE = cp
    return prev


@contextlib.contextmanager
def checkpointing(cp: Checkpointer):
    prev = set_checkpointer(cp)
    try:
        yield cp
    finally:
        set_checkpointer(prev)


def _dispatch(savepoint_name: str, names, *arrays) -> None:
    cp = _ACTIVE
    if cp is not None:
        cp(str(savepoint_name), **dict(zip(names, arrays)))


def checkpoint(savepoint_name: str, sizing=None, **arrays) -> None:
    """Record `arrays` at the named savepoint (jit-safe; see above).

    `sizing=(n, halo)` restricts capture to the compute domain
    [halo : halo+n+1] in x and y (covers staggered edges): padded wedge
    cells hold garbage whose run-to-run spread under perturbation is
    unbounded, so they must not enter threshold calibration/validation.
    """
    if _ACTIVE is None:
        return
    if sizing is not None:
        n, h = sizing
        arrays = {
            k: (v[:, h:h + n + 1, h:h + n + 1]
                if getattr(v, "ndim", 0) >= 3 else v)
            for k, v in arrays.items()
        }
    names = tuple(arrays.keys())
    jax.debug.callback(
        _dispatch, savepoint_name, names, *arrays.values(), ordered=True
    )


class NullCheckpointer(Checkpointer):
    def __call__(self, savepoint_name: str, **kwargs) -> None:
        pass


class SnapshotCheckpointer(Checkpointer):
    """Stores a copy of every array at every savepoint call, retrievable as
    {savepoint: {variable: [arrays over calls]}}."""

    def __init__(self):
        self._data: Dict[str, Dict[str, List[np.ndarray]]] = (
            collections.defaultdict(lambda: collections.defaultdict(list))
        )

    def __call__(self, savepoint_name: str, **kwargs) -> None:
        for name, arr in kwargs.items():
            self._data[savepoint_name][name].append(_to_numpy(arr).copy())

    @property
    def data(self):
        return self._data


@dataclasses.dataclass
class Threshold:
    relative: float
    absolute: float

    def merge(self, other: "Threshold") -> "Threshold":
        return Threshold(
            relative=max(self.relative, other.relative),
            absolute=max(self.absolute, other.absolute),
        )


@dataclasses.dataclass
class SavepointThresholds:
    savepoints: Dict[SavepointName, List[Dict[VariableName, Threshold]]]

    def save(self, path: str):
        payload = {
            sp: [
                {v: dataclasses.asdict(t) for v, t in call.items()}
                for call in calls
            ]
            for sp, calls in self.savepoints.items()
        }
        with open(path, "w") as f:
            json.dump(payload, f, indent=2)

    @classmethod
    def load(cls, path: str) -> "SavepointThresholds":
        with open(path) as f:
            payload = json.load(f)
        return cls(savepoints={
            sp: [
                {v: Threshold(**t) for v, t in call.items()}
                for call in calls
            ]
            for sp, calls in payload.items()
        })


class ThresholdCalibrationCheckpointer(Checkpointer):
    """Derives per-variable validation thresholds from the spread across
    perturbed trials (reference thresholds.py:59-200)."""

    def __init__(self, factor: float = 1.0):
        self._factor = factor
        self._minimums = collections.defaultdict(list)
        self._maximums = collections.defaultdict(list)
        self._sums = collections.defaultdict(list)
        self._n_trials = 0
        self._n_calls = collections.defaultdict(int)

    def __call__(self, savepoint_name: str, **kwargs) -> None:
        i = self._n_calls[savepoint_name]
        for store, init in ((self._minimums, np.inf),
                            (self._maximums, -np.inf),
                            (self._sums, 0.0)):
            if len(store[savepoint_name]) < i + 1:
                store[savepoint_name].append(
                    collections.defaultdict(lambda v=init: v)
                )
        for name, arr in kwargs.items():
            arr = _to_numpy(arr)
            mins = self._minimums[savepoint_name][i]
            maxs = self._maximums[savepoint_name][i]
            sums = self._sums[savepoint_name][i]
            mins[name] = np.minimum(mins.get(name, np.inf), arr)
            maxs[name] = np.maximum(maxs.get(name, -np.inf), arr)
            sums[name] = sums.get(name, 0.0) + np.abs(arr)
        self._n_calls[savepoint_name] += 1

    @contextlib.contextmanager
    def trial(self):
        self._n_calls.clear()
        yield
        self._n_trials += 1

    @property
    def thresholds(self) -> SavepointThresholds:
        if self._n_trials == 0:
            raise RuntimeError("no trials recorded")
        out: Dict[str, List[Dict[str, Threshold]]] = {}
        for sp in self._minimums:
            out[sp] = []
            for i in range(len(self._minimums[sp])):
                call = {}
                for name in self._minimums[sp][i]:
                    mn = self._minimums[sp][i][name]
                    mx = self._maximums[sp][i][name]
                    mean_abs = self._sums[sp][i][name] / self._n_trials
                    # padding cells hold NaN deterministically (see
                    # docs/KNOWN_ISSUES.md) — they carry no spread
                    finite = np.isfinite(mn) & np.isfinite(mx)
                    with np.errstate(invalid="ignore"):
                        spread = np.where(finite, mx - mn, 0.0)
                    abs_err = float(np.max(spread))
                    with np.errstate(divide="ignore", invalid="ignore"):
                        rel = np.where(finite & (mean_abs > 0),
                                       spread / mean_abs, 0.0)
                    call[name] = Threshold(
                        relative=self._factor * float(np.max(rel)),
                        absolute=self._factor * abs_err,
                    )
                out[sp].append(call)
        return SavepointThresholds(savepoints=out)


class InsufficientTrialsError(RuntimeError):
    pass


class ValidationCheckpointer(Checkpointer):
    """Asserts savepoint data matches reference arrays within thresholds
    (reference validation.py:61-200; reference data from an npz per
    savepoint instead of netCDF)."""

    def __init__(self, reference: Dict[str, List[Dict[str, np.ndarray]]],
                 thresholds: SavepointThresholds):
        self._reference = reference
        self._thresholds = thresholds
        self._n_calls = collections.defaultdict(int)

    def __call__(self, savepoint_name: str, **kwargs) -> None:
        i = self._n_calls[savepoint_name]
        ref_call = self._reference[savepoint_name][i]
        thr_call = self._thresholds.savepoints[savepoint_name][i]
        for name, arr in kwargs.items():
            arr = _to_numpy(arr)
            ref = ref_call[name]
            thr = thr_call[name]
            # NaN-aware (padding wedges hold NaN deterministically): cells
            # non-finite in BOTH agree; finiteness mismatch is an error
            both_bad = ~np.isfinite(arr) & ~np.isfinite(ref)
            if (~np.isfinite(arr) ^ ~np.isfinite(ref)).any():
                raise AssertionError(
                    f"{savepoint_name}[{i}].{name}: finiteness pattern "
                    f"differs from reference"
                )
            with np.errstate(divide="ignore", invalid="ignore",
                             over="ignore"):
                abs_err = np.where(both_bad, 0.0, np.abs(arr - ref))
                denom = np.abs(np.where(both_bad, 1.0, ref))
                rel_err = np.where(denom > 0, abs_err / denom, 0.0)
            if float(abs_err.max()) > thr.absolute and \
                    float(rel_err.max()) > thr.relative:
                raise AssertionError(
                    f"{savepoint_name}[{i}].{name}: abs err "
                    f"{float(abs_err.max())} > {thr.absolute} and rel err "
                    f"{float(rel_err.max())} > {thr.relative}"
                )
        self._n_calls[savepoint_name] += 1
