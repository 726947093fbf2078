"""Tropical cyclone initial condition: vortex structure sanity."""

import numpy as np
import pytest

from pace_tpu.models.fv3.init.tropical_cyclone import TC, init_tc_state
from pace_tpu.utils.gridtools import GridSizing


@pytest.fixture(scope="module")
def tc_state():
    sizing = GridSizing(24, 79)
    import jax.numpy as jnp

    return init_tc_state(sizing, dtype=jnp.float64), sizing


def _interior(a, sizing):
    h, n = sizing.halo, sizing.n
    return np.asarray(a)[:, h:h + n, h:h + n]


def test_finite(tc_state):
    state, sizing = tc_state
    for name in ("ps", "pt", "delp", "delz", "u", "v", "qvapor"):
        a = _interior(getattr(state, name), sizing)
        assert np.isfinite(a).all(), name


def test_surface_pressure_minimum_at_center(tc_state):
    """ps has a dp-deep depression at the storm center and approaches
    p_ref far away."""
    state, sizing = tc_state
    ps = _interior(state.ps, sizing)
    assert TC["p_ref"] - TC["dp"] - 50.0 < ps.min() < TC["p_ref"] - 500.0
    assert abs(ps.max() - TC["p_ref"]) < 50.0


def test_warm_core(tc_state):
    """Temperature is warmer in the storm core than the far field at the
    same level (warm-core vortex)."""
    state, sizing = tc_state
    ps = _interior(state.ps, sizing)
    pt = _interior(state.pt, sizing)
    t, i, j = np.unravel_index(np.argmin(ps), ps.shape)
    k = 60  # mid-troposphere
    core_t = pt[t, i, j, k]
    far_t = np.median(pt[..., k])
    assert core_t > far_t


def test_cyclonic_winds(tc_state):
    """Wind speed peaks near (not at) the center, is calm far away, and
    is zero above the tropopause."""
    state, sizing = tc_state
    u = _interior(state.u, sizing)
    assert np.abs(u[..., -1]).max() > 10.0  # strong surface vortex winds
    assert np.abs(u[..., 0]).max() < 1e-8  # calm above ztrop
    ua = _interior(state.ua, sizing)
    assert np.isfinite(ua).all()


def test_hydrostatic_consistency(tc_state):
    """delz matches the hypsometric equation by construction."""
    state, sizing = tc_state
    delz = _interior(state.delz, sizing)
    assert (delz < 0).all()
    total_depth = -delz.sum(-1)
    assert 20.0e3 < total_depth.min() and total_depth.max() < 90.0e3
