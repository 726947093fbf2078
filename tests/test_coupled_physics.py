"""Coupled dycore + physics step: the full model loop of the reference
driver (dycore step -> DycoreToPhysics -> Physics -> UpdateAtmosphereState).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pace_tpu.grid.generation import generate_grid_data
from pace_tpu.models.coupler import DycoreToPhysics, UpdateAtmosphereState
from pace_tpu.models.fv3.config import DynamicalCoreConfig
from pace_tpu.models.fv3.dynamics import DynamicalCore
from pace_tpu.models.fv3.init.baroclinic import init_baroclinic_state
from pace_tpu.models.physics.config import PhysicsConfig
from pace_tpu.models.physics.physics import Physics
from pace_tpu.utils.gridtools import GridSizing

N_GRID = 12
NZ = 79
DT = 300.0


@pytest.fixture(scope="module")
def coupled_step():
    sizing = GridSizing(N_GRID, NZ)
    gd = generate_grid_data(N_GRID, NZ, dtype=jnp.float64)
    dyn_config = DynamicalCoreConfig(do_sat_adj=False)
    core = DynamicalCore(dyn_config, sizing, gd, timestep=DT)
    phys_config = PhysicsConfig(dt_atmos=DT, npz=NZ)
    ptop = float(np.asarray(jax.device_get(gd.vertical.ptop)))
    physics = Physics(phys_config, gd.horizontal.area, ptop, DT)
    d2p = DycoreToPhysics(sizing, dtype=jnp.float64)
    update = UpdateAtmosphereState(gd, core.topo, sizing, DT)
    state = init_baroclinic_state(sizing, dtype=jnp.float64)

    def step(s):
        s = core.step_dynamics(s)
        phy = d2p(s)
        phy = physics(phy)
        return update(s, phy)

    out = jax.jit(step)(state)
    return state, out, sizing


def _interior(a, sizing, stag=(0, 0)):
    h, n = sizing.halo, sizing.n
    return np.asarray(a)[:, h:h + n + stag[0], h:h + n + stag[1]]


def test_no_nans_interior(coupled_step):
    state, out, sizing = coupled_step
    import dataclasses
    for f in dataclasses.fields(out):
        a = getattr(out, f.name)
        if a.ndim < 3:
            continue
        assert not bool(
            jnp.isnan(jnp.asarray(_interior(a, sizing))).any()
        ), f.name


def test_fields_physical(coupled_step):
    state, out, sizing = coupled_step
    pt = _interior(out.pt, sizing)
    assert pt.min() > 150.0 and pt.max() < 350.0
    ps = _interior(out.ps[..., None], sizing)
    assert abs(ps.mean() - 1.0e5) < 5.0e3
    qv = _interior(out.qvapor, sizing)
    assert qv.min() >= 0.0


def test_winds_bounded(coupled_step):
    state, out, sizing = coupled_step
    u = _interior(out.u, sizing, (0, 1))
    va = _interior(out.va, sizing)
    assert np.abs(u).max() < 120.0
    # J&W zonal flow stays nearly zonal through the coupled step
    assert np.abs(va).max() < 2.0


def test_physics_changed_state_little(coupled_step):
    """With a dry baroclinic init the microphysics should fire at most
    weakly: temperature change from physics bounded by 1 K."""
    state, out, sizing = coupled_step
    pt0 = _interior(state.pt, sizing)
    pt1 = _interior(out.pt, sizing)
    assert np.abs(pt1 - pt0).max() < 10.0
