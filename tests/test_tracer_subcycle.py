"""Dynamic Courant-limited tracer subcycling (ops/tracer_advection.py
dynamic_subcycle): the in-graph analogue of the Fortran allreduce split
the reference commented out (tracer_2d_1l.py:312-338)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pace_tpu.grid.generation import generate_grid_data
from pace_tpu.ops import tracer_advection as tradv
from pace_tpu.parallel.topology import get_topology
from pace_tpu.utils.gridtools import GridSizing

N, NZ, H = 12, 7, 3


@pytest.fixture(scope="module")
def setup():
    sizing = GridSizing(N, NZ)
    # only horizontal geometry is consumed by tracer_advection; the eta
    # tables require nz in {79, 91}, so generate at 79 and carry nz=7
    # fields (fast)
    gd = generate_grid_data(N, 79, dtype=jnp.float64)
    topo = get_topology(N, H)
    rng = np.random.RandomState(0)
    shp = (6, sizing.N, sizing.N, NZ)
    dp1 = jnp.asarray(900.0 + 100.0 * rng.rand(*shp))
    tracers = {
        name: jnp.asarray(1e-3 * (1.0 + rng.rand(*shp)))
        for name in ("qa", "qb", "qc")
    }
    # smooth unit-scale courant/flux fields
    cr = jnp.asarray(np.sin(np.linspace(0, np.pi, sizing.N)))[None, :, None,
                                                              None]
    x_courant = jnp.broadcast_to(cr, shp)
    y_courant = jnp.broadcast_to(cr.swapaxes(1, 2), shp)
    mf = 50.0 * x_courant
    return sizing, gd, topo, tracers, dp1, x_courant, y_courant, mf


def _run(setup, scale, dynamic):
    sizing, gd, topo, tracers, dp1, cx, cy, mf = setup
    out = jax.jit(
        lambda tr: tradv.tracer_advection(
            tr, dp1, mf * scale, mf.swapaxes(1, 2) * scale,
            cx * scale, cy * scale, gd, topo, N, H, hord_tr=8,
            dynamic_subcycle=dynamic,
        )
    )(tracers)
    return out


def test_matches_static_when_courant_in_2_3(setup):
    """max|c| = 2.2 -> floor(1+cmax) = 3 substeps, the static count:
    both paths must agree to rounding."""
    a = _run(setup, 2.2, dynamic=False)
    b = _run(setup, 2.2, dynamic=True)
    for k in a:
        np.testing.assert_allclose(
            np.asarray(a[k]), np.asarray(b[k]), rtol=1e-12, atol=0
        )


def test_small_courant_conserves_mass(setup):
    """Quiescent flow: 1 substep; advection conserves sum(q*dp) over
    the cube to round-off (fluxes cancel pairwise across faces)."""
    sizing, gd, topo, tracers, dp1, cx, cy, mf = setup
    out = _run(setup, 0.3, dynamic=True)
    h = H
    area = gd.horizontal.area[..., None]
    for k in tracers:
        m0 = float(jnp.sum(
            (tracers[k] * dp1 * area)[:, h:h + N, h:h + N]
        ))
        # dp2 after one substep
        from pace_tpu.ops.stencil_utils import shift
        rarea = gd.horizontal.rarea[..., None]
        mfx, mfy = mf * 0.3, mf.swapaxes(1, 2) * 0.3
        dp2 = dp1 + (mfx - shift(mfx, 1) + mfy - shift(mfy, 0, 1)) * rarea
        m1 = float(jnp.sum((out[k] * dp2 * area)[:, h:h + N, h:h + N]))
        assert abs(m1 - m0) / abs(m0) < 1e-10, k


def test_dynamic_subcycle_in_dycore_step():
    """The full dycore step compiles and stays finite with the knob on."""
    from pace_tpu.models.fv3.config import DynamicalCoreConfig
    from pace_tpu.models.fv3.dynamics import DynamicalCore
    from pace_tpu.models.fv3.init.baroclinic import init_baroclinic_state

    sizing = GridSizing(12, 79)
    gd = generate_grid_data(12, 79, dtype=jnp.float64)
    config = DynamicalCoreConfig(
        do_sat_adj=False, dynamic_tracer_subcycle=True
    )
    core = DynamicalCore(config, sizing, gd, timestep=225.0)
    state = init_baroclinic_state(sizing, dtype=jnp.float64)
    out = jax.jit(core.step_dynamics)(state)
    h, n = sizing.halo, 12
    interior = np.asarray(out.qvapor[:, h:h + n, h:h + n])
    assert np.isfinite(interior).all()
    assert interior.min() >= 0.0
