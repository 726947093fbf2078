"""In-dycore savepoint checkpointer flow: calibrate -> validate.

The reference's tier-3 test design (tests/savepoint/test_checkpoints.py:52
test_fv_dynamics, :105-121 --calibrate) runs the real DynamicalCore with a
ThresholdCalibrationCheckpointer over N round-off-perturbed trials
(util/pace/util/testing/perturbation.py), derives per-variable thresholds
(x safety factor), then a ValidationCheckpointer asserts state at named
checkpoints inside the dycore (fv_dynamics.py:321-422, dyn_core.py:626-668).

Here the same flow is self-calibrated (no Fortran data in the image): one
compiled C12 step serves calibration, snapshotting, and validation by
swapping the active checkpointer at run time (utils/checkpointer.py
`checkpointing`).
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
from pace_tpu.models.fv3.state import DycoreState
from pace_tpu.utils.checkpointer import (
    SnapshotCheckpointer,
    ThresholdCalibrationCheckpointer,
    ValidationCheckpointer,
    SavepointThresholds,
    checkpointing,
)
from pace_tpu.utils.gridtools import GridSizing
from pace_tpu.utils.testing import perturb

# every named in-model savepoint (reference checkpoint names)
SAVEPOINTS = [
    "FVDynamics-In", "C_SW-In", "C_SW-Out", "D_SW-In", "D_SW-Out",
    "Tracer2D1L-In", "Tracer2D1L-Out", "Remapping-In", "Remapping-Out",
    "FVDynamics-Out",
]

SCALE = 1e-7  # round-off for float32


def _perturbed(state: DycoreState, seed: int) -> DycoreState:
    d = {f.name: getattr(state, f.name) for f in dataclasses.fields(state)}
    out = perturb(d, scale=SCALE, seed=seed)
    return DycoreState(**{k: jnp.asarray(v, jnp.float32)
                          for k, v in out.items()})


@pytest.fixture(scope="module")
def setup():
    n, nz = 12, 79
    sizing = GridSizing(n, nz)
    grid_data = generate_grid_data(n, nz, dtype=jnp.float32)
    config = DynamicalCoreConfig(do_sat_adj=False, k_split=1, n_split=1)
    core = DynamicalCore(config, sizing, grid_data, timestep=225.0)
    state = init_baroclinic_state(sizing, dtype=jnp.float32)
    return core, state


def test_calibrate_then_validate(setup, tmp_path):
    core, state = setup

    # trace WITH checkpointing active so the hooks are in the graph; the
    # same compiled step then dispatches to whichever checkpointer is
    # active at run time
    cal = ThresholdCalibrationCheckpointer(factor=20.0)
    with checkpointing(cal):
        step = jax.jit(core.step_dynamics)
        for seed in range(3):
            with cal.trial():
                out = step(_perturbed(state, seed))
                jax.block_until_ready(out)
        thresholds = cal.thresholds

    for sp in SAVEPOINTS:
        assert sp in thresholds.savepoints, sp
        assert len(thresholds.savepoints[sp]) >= 1

    # thresholds JSON round-trip (reference thresholds yaml analogue)
    path = str(tmp_path / "fv_dynamics_thresholds.json")
    thresholds.save(path)
    thresholds = SavepointThresholds.load(path)

    # snapshot one trial as the validation reference
    snap = SnapshotCheckpointer()
    with checkpointing(snap):
        jax.block_until_ready(step(_perturbed(state, seed=0)))
    reference = {
        sp: [
            {name: arrs[i] for name, arrs in snap.data[sp].items()}
            for i in range(len(next(iter(snap.data[sp].values()))))
        ]
        for sp in snap.data
    }

    # a round-off-perturbed run must validate within calibrated thresholds
    val = ValidationCheckpointer(reference, thresholds)
    with checkpointing(val):
        jax.block_until_ready(step(_perturbed(state, seed=7)))

    # and a corrupted reference must fail (callback errors surface at sync)
    bad_reference = {
        sp: [dict(call) for call in calls] for sp, calls in reference.items()
    }
    bad_reference["D_SW-Out"][0]["pt"] = (
        bad_reference["D_SW-Out"][0]["pt"] + 1.0
    )
    val_bad = ValidationCheckpointer(bad_reference, thresholds)
    with checkpointing(val_bad):
        with pytest.raises(Exception, match="D_SW-Out"):
            jax.block_until_ready(step(_perturbed(state, seed=7)))


def test_no_checkpointer_traces_nothing(setup):
    """With no active checkpointer at trace time the hook is a literal
    no-op: the jaxpr contains no callbacks."""
    core, state = setup
    jaxpr = jax.make_jaxpr(core.step_dynamics)(state)

    def prims(jxp, acc):
        for e in jxp.eqns:
            acc.add(str(e.primitive))
            for v in e.params.values():
                inner = getattr(v, "jaxpr", None)
                if inner is not None:
                    prims(inner, acc)
        return acc

    names = prims(jaxpr.jaxpr, set())
    assert not any("callback" in p for p in names), names
