"""External numerics anchor: long-horizon conservation drift.

The golden digests pin the dycore against its own history; this test
holds it to conservation laws the continuous equations satisfy exactly:

- **Dry air mass** (sum of area*delp): the flux-form delp updates in
  c_sw/d_sw, the tracer-advection dp update, and the vertical remap are
  all conservative, so global dry mass must be constant to rounding over
  a multi-day run.
- **Total water mass** (sum of area*delp*(qvapor+5 condensate
  species)): flux-form transport + conservative remap conserve it to
  rounding.  Vapor ALONE is deliberately not pinned: neg_adj3
  legitimately converts roundoff-negative condensate into vapor
  (reference fv3core stencils/neg_adj3.py), so single-species mass
  drifts at an amplified roundoff scale while total water holds.
- **Total energy**: with consv_te=0 there is no energy fixer (the
  reference refuses consv_te>0 the same way,
  ai2cm/pace fv3core/pace/fv3core/stencils/fv_dynamics.py:442), so
  energy is NOT exactly conserved — but over ~2 simulated days of a
  smooth baroclinic wave its drift must stay bounded at the
  dissipation scale, not grow catastrophically.

100 steps of C12/79 at dt=1800s ~ 2.1 simulated days, f64.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pace_tpu.grid.generation import generate_grid_data
from pace_tpu.models.fv3.config import DynamicalCoreConfig
from pace_tpu.models.fv3.dynamics import DynamicalCore
from pace_tpu.models.fv3.init.baroclinic import init_baroclinic_state
from pace_tpu.utils import constants
from pace_tpu.utils.gridtools import GridSizing

N, NZ, H = 12, 79, 3
N_STEPS = 100
DT = 1800.0


@pytest.fixture(scope="module")
def drift_series():
    sizing = GridSizing(N, NZ)
    gd = generate_grid_data(N, NZ, dtype=jnp.float64)
    config = DynamicalCoreConfig(k_split=1, n_split=2)
    core = DynamicalCore(config, sizing, gd, timestep=DT)
    state = init_baroclinic_state(sizing, dtype=jnp.float64)

    area = gd.horizontal.area[:, H:H + N, H:H + N, None]

    def diagnostics(s):
        delp = s.delp[:, H:H + N, H:H + N]
        pt = s.pt[:, H:H + N, H:H + N]
        qv = sum(
            getattr(s, name)[:, H:H + N, H:H + N]
            for name in ("qvapor", "qliquid", "qrain", "qice",
                         "qsnow", "qgraupel"))
        ua = s.ua[:, H:H + N, H:H + N]
        va = s.va[:, H:H + N, H:H + N]
        w = s.w[:, H:H + N, H:H + N]
        mass = jnp.sum(area * delp)
        vapor = jnp.sum(area * delp * qv)
        # energy proxy: sensible (cp*T from potential temperature is not
        # directly available; pt here is virtual potential temperature
        # scaled — use it as the thermal proxy) + kinetic.  This is a
        # DRIFT metric, not an absolute energy; only relative change
        # matters.
        thermal = jnp.sum(area * delp * constants.CP_AIR * pt)
        kinetic = jnp.sum(
            area * delp * 0.5 * (ua ** 2 + va ** 2 + w ** 2))
        return jnp.stack([mass, vapor, thermal + kinetic])

    def scan_step(s, _):
        s = core.step_dynamics(s)
        return s, diagnostics(s)

    @jax.jit
    def run(s):
        d0 = diagnostics(s)
        s, series = jax.lax.scan(scan_step, s, None, length=N_STEPS)
        return d0, series, s

    d0, series, final = run(state)
    return (np.asarray(d0), np.asarray(series),
            np.asarray(final.delp[:, H:H + N, H:H + N]))


@pytest.mark.slow
def test_state_stays_finite(drift_series):
    _, series, delp = drift_series
    assert np.isfinite(series).all()
    assert delp.min() > 0


@pytest.mark.slow
def test_dry_mass_conserved(drift_series):
    d0, series, _ = drift_series
    rel = np.abs(series[:, 0] / d0[0] - 1.0)
    assert rel.max() < 1e-11, rel.max()


@pytest.mark.slow
def test_total_water_mass_conserved(drift_series):
    d0, series, _ = drift_series
    rel = np.abs(series[:, 1] / d0[1] - 1.0)
    assert rel.max() < 1e-9, rel.max()


@pytest.mark.slow
def test_energy_drift_bounded(drift_series):
    """No fixer -> dissipation-scale drift only.  The bound (0.1% over
    ~2 days) is an order of magnitude above the measured drift, far
    below what any loss-of-conservation bug produces."""
    d0, series, _ = drift_series
    rel = np.abs(series[:, 2] / d0[2] - 1.0)
    assert rel.max() < 1e-3, rel.max()
