"""Numerical comparison and perturbation helpers for tests.

Mirrors the semantics of ai2cm/pace util/pace/util/testing/comparison.py:6-59
(relative error with a near-zero absolute floor) and perturbation.py:6.
"""

from __future__ import annotations

import numpy as np


def compare_arr(computed_data, ref_data):
    """Smooth error metric: relative error, with absolute error used where the
    reference magnitude is tiny."""
    if ref_data.dtype in (np.float64, np.int64, np.float32, np.int32):
        denom = np.abs(ref_data) + np.abs(computed_data)
        compare = np.asarray(2.0 * np.abs(computed_data - ref_data) / denom)
        compare[denom == 0] = 0.0
        return compare
    elif ref_data.dtype in (np.bool_, bool):
        return np.logical_xor(computed_data, ref_data)
    else:
        raise TypeError(f"recieved data with unexpected dtype {ref_data.dtype}")


def compare_scalar(computed_data: np.float64, ref_data: np.float64) -> np.float64:
    err_as_array = compare_arr(
        np.atleast_1d(computed_data), np.atleast_1d(ref_data)
    )
    return err_as_array[0]


def success_array(
    computed_data: np.ndarray,
    ref_data: np.ndarray,
    eps: float,
    ignore_near_zero_errors: bool,
    near_zero: float,
):
    # bit-identical values always pass: the relative metric yields NaN for
    # identical +/-inf pairs (inf - inf), which self-generated savepoints
    # can legitimately contain (log of zero-filled halo pressures); the
    # reference never hits this because serialized Fortran data is finite
    with np.errstate(invalid="ignore"):
        exact_equal = computed_data == ref_data
    success = np.logical_or(
        np.logical_or(
            exact_equal,
            np.logical_and(np.isnan(computed_data), np.isnan(ref_data)),
        ),
        compare_arr(computed_data, ref_data) < eps,
    )
    if ignore_near_zero_errors:
        small_number = near_zero
        success = np.logical_or(
            success,
            np.logical_and(
                np.abs(computed_data) < small_number,
                np.abs(ref_data) < small_number,
            ),
        )
    return success


def perturb(state: dict, scale: float = 1e-14, seed: int = 0):
    """Return a copy of a dict of arrays with round-off-level multiplicative
    noise applied (for threshold calibration)."""
    rng = np.random.RandomState(seed)
    out = {}
    for name, arr in state.items():
        arr = np.asarray(arr)
        if np.issubdtype(arr.dtype, np.floating):
            roundoff = scale * np.abs(arr)
            out[name] = arr + roundoff * (2.0 * rng.uniform(size=arr.shape) - 1.0)
        else:
            out[name] = arr.copy()
    return out
