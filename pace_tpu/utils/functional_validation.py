"""Selective-validation helpers.

Port of ai2cm/pace fv3core/pace/fv3core/utils/functional_validation.py
(get_subset_func, get_set_nan_func) and testing/validation.py
(get_selective_class): utilities to restrict comparisons to the region a
computation actually validates (compute domain plus a chosen halo depth),
nulling out everything else.  Operates on the whole-tile global view
(6, N, N, ...) instead of per-rank origin/domain windows.
"""

from __future__ import annotations

from typing import Callable, Sequence, Tuple

import numpy as np


def get_subset_func(
    sizing,
    dims: Sequence[str] = ("x", "y", "z"),
    n_halo: Tuple[Tuple[int, int], Tuple[int, int]] = ((0, 0), (0, 0)),
) -> Callable[[np.ndarray], np.ndarray]:
    """Returns subset(data) slicing the validated window of a global-view
    array: the compute domain (+1 on interface axes) extended by n_halo
    points on each side."""
    h, n = sizing.halo, sizing.n
    ni = n + (1 if "x_interface" in dims[0] else 0)
    nj = n + (1 if len(dims) > 1 and "y_interface" in dims[1] else 0)
    i0 = h - n_halo[0][0]
    i1 = h + ni + n_halo[0][1]
    j0 = h - n_halo[1][0]
    j1 = h + nj + n_halo[1][1]

    def subset(data):
        return data[:, i0:i1, j0:j1]

    return subset


def get_set_nan_func(sizing, dims=("x", "y", "z"),
                     n_halo=((0, 0), (0, 0))):
    """Returns set_nans(data) -> data with everything outside the
    validated window replaced by NaN (pure: returns a new array)."""
    h, n = sizing.halo, sizing.n
    N = sizing.N
    ni = n + (1 if "x_interface" in dims[0] else 0)
    nj = n + (1 if len(dims) > 1 and "y_interface" in dims[1] else 0)
    i0, i1 = h - n_halo[0][0], h + ni + n_halo[0][1]
    j0, j1 = h - n_halo[1][0], h + nj + n_halo[1][1]
    idx = np.arange(N)
    keep = ((idx >= i0) & (idx < i1))[:, None] \
        & ((idx >= j0) & (idx < j1))[None, :]

    def set_nans(data):
        data = np.array(data, dtype=float, copy=True)
        mask = keep.reshape((1,) + keep.shape + (1,) * (data.ndim - 3))
        return np.where(mask, data, np.nan)

    return set_nans


def selective_compare(a, b, sizing, dims=("x", "y", "z"),
                      n_halo=((0, 0), (0, 0)), rtol=1e-12, atol=0.0):
    """Compare two global-view arrays only over the validated window
    (the analogue of wrapping a component with get_selective_class and
    diffing its outputs)."""
    subset = get_subset_func(sizing, dims, n_halo)
    x = np.asarray(subset(np.asarray(a)))
    y = np.asarray(subset(np.asarray(b)))
    np.testing.assert_allclose(x, y, rtol=rtol, atol=atol)
