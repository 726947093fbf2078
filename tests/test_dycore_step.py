"""End-to-end dycore step test: baroclinic C12, one full fv_dynamics step.

Physical validity checks in the spirit of the reference's SafetyChecker
bounds (ai2cm/pace driver/pace/driver/safety_checks.py, registration
driver.py:536-539) plus a zonality check unique to the J&W initial
condition: the initial wind is purely zonal, so after one step va must
remain small everywhere — any error in halo rotation, staggering
transforms, or edge handling destroys this property.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from pace_tpu.grid.generation import generate_grid_data
from pace_tpu.models.fv3.config import DynamicalCoreConfig
from pace_tpu.models.fv3.dynamics import DynamicalCore
from pace_tpu.models.fv3.init.baroclinic import init_baroclinic_state
from pace_tpu.utils.gridtools import GridSizing

N, NZ, H = 12, 79, 3


@pytest.fixture(scope="module")
def stepped_state(c12_f64_run):
    # one shared jitted run (tests/conftest.py) — state after step 1
    _, _, _, states = c12_f64_run
    return states[0]


def compute(q):
    return np.asarray(q)[:, H:H + N, H:H + N]


class TestDycoreStep:
    def test_no_nans(self, stepped_state):
        for name in ("delp", "pt", "u", "v", "w", "delz", "ua", "va",
                     "qvapor", "ps", "omga", "pe", "peln", "pk", "pkz"):
            arr = compute(getattr(stepped_state, name))
            assert not np.isnan(arr).any(), name

    def test_safety_bounds(self, stepped_state):
        assert np.abs(compute(stepped_state.ua)).max() < 200
        assert np.abs(compute(stepped_state.va)).max() < 200
        pt = compute(stepped_state.pt)
        assert pt.min() > 100 and pt.max() < 380
        assert compute(stepped_state.delp).min() > 0
        assert compute(stepped_state.delz).max() < 0

    def test_zonality_preserved(self, stepped_state):
        """J&W initial state is zonal; one step must keep va near zero."""
        va = compute(stepped_state.va)
        ua = compute(stepped_state.ua)
        assert np.abs(va).max() < 1.0
        assert ua.min() > -1.0 and ua.max() < 40.0

    def test_surface_pressure_near_reference(self, stepped_state):
        ps = compute(stepped_state.ps)
        np.testing.assert_allclose(ps, 1.0e5, rtol=2e-3)

    def test_global_mass_conserved(self, stepped_state, c12_f64_run):
        """Total delp-weighted mass must be conserved to roundoff."""
        _, gd, state0, _ = c12_f64_run
        area = np.asarray(gd.horizontal.area)[:, H:H + N, H:H + N, None]
        m0 = (np.asarray(state0.delp)[:, H:H + N, H:H + N] * area).sum()
        m1 = (compute(stepped_state.delp) * area).sum()
        np.testing.assert_allclose(m1, m0, rtol=1e-10)


def test_91_level_step():
    """The 91-level ak/bk table drives a valid step (smaller smoke than
    the 79-level fixtures; one step, interior finite)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from pace_tpu.grid.generation import generate_grid_data
    from pace_tpu.models.fv3.config import DynamicalCoreConfig
    from pace_tpu.models.fv3.dynamics import DynamicalCore
    from pace_tpu.models.fv3.init.baroclinic import init_baroclinic_state
    from pace_tpu.utils.gridtools import GridSizing

    sizing = GridSizing(12, 91)
    gd = generate_grid_data(12, 91, dtype=jnp.float64)
    core = DynamicalCore(
        DynamicalCoreConfig(do_sat_adj=False), sizing, gd, timestep=225.0
    )
    state = init_baroclinic_state(sizing, dtype=jnp.float64)
    out = jax.jit(core.step_dynamics)(state)
    h, n = sizing.halo, sizing.n
    a = np.asarray(out.pt)[:, h:h + n, h:h + n]
    assert np.isfinite(a).all()
    assert 150.0 < a.min() and a.max() < 350.0
