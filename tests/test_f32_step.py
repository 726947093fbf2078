"""float32 dycore step: the TPU production precision.

Regression for the float32-range failures in the del-n damping
coefficients ((damp_c*da_min)**(nord+1) ~ 1e44 overflows f32; the raw
del-n iterate ~ rarea**nord underflows) and the non-finite padded grid
metric cells — both poisoned u/v with NaN while f64 ran clean.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pace_tpu.grid.generation import generate_grid_data
from pace_tpu.models.fv3.config import DynamicalCoreConfig
from pace_tpu.models.fv3.dynamics import DynamicalCore
from pace_tpu.models.fv3.init.baroclinic import init_baroclinic_state
from pace_tpu.utils.gridtools import GridSizing


@pytest.fixture(scope="module")
def f32_step(c12_f32_run):
    # one shared jitted f32 run (tests/conftest.py) — state after step 1
    sizing, _, _, state0, states = c12_f32_run
    return state0, states[0], sizing


def test_f32_interior_finite(f32_step):
    _, out, sizing = f32_step
    h, n = sizing.halo, sizing.n
    for f in dataclasses.fields(out):
        a = getattr(out, f.name)
        if a.ndim < 3:
            continue
        sl = np.asarray(a)[:, h:h + n, h:h + n]
        assert np.isfinite(sl).all(), f.name


def test_f32_matches_f64_physics(f32_step):
    """The J&W zonal flow stays zonal in f32 too."""
    _, out, sizing = f32_step
    h, n = sizing.halo, sizing.n
    va = np.asarray(out.va)[:, h:h + n, h:h + n]
    assert np.abs(va).max() < 1.0
    ps = np.asarray(out.ps)[:, h:h + n, h:h + n]
    assert abs(ps.mean() - 1.0e5) < 5.0e3
