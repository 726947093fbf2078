"""Golden-digest regression: the C12 dycore step must reproduce the
recorded statistical digests (the savepoint-test analogue; regenerate
deliberately with tests/golden/make_golden.py after intentional numerics
changes)."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.golden.make_golden import state_digest

GOLDEN = os.path.join(os.path.dirname(__file__), "golden",
                      "c12_dycore_digest.json")


@pytest.mark.skipif(not os.path.exists(GOLDEN),
                    reason="golden digest not generated")
def test_c12_dycore_golden():
    from pace_tpu.grid.generation import generate_grid_data
    from pace_tpu.models.fv3.config import DynamicalCoreConfig
    from pace_tpu.models.fv3.dynamics import DynamicalCore
    from pace_tpu.models.fv3.init.baroclinic import init_baroclinic_state
    from pace_tpu.utils.gridtools import GridSizing

    with open(GOLDEN) as f:
        golden = json.load(f)
    sizing = GridSizing(12, 79)
    gd = generate_grid_data(12, 79, dtype=jnp.float64)
    core = DynamicalCore(
        DynamicalCoreConfig(do_sat_adj=False), sizing, gd, timestep=225.0
    )
    state = init_baroclinic_state(sizing, dtype=jnp.float64)
    step = jax.jit(core.step_dynamics)
    for i in range(1, 5):
        state = step(state)
        if f"step{i}" not in golden:
            continue
        digest = state_digest(state, sizing)
        for name, ref in golden[f"step{i}"].items():
            got = digest[name]
            scale = max(abs(ref["max"]), abs(ref["min"]), 1e-30)
            for stat in ("mean", "std", "min", "max"):
                assert abs(got[stat] - ref[stat]) <= 1e-9 * scale, (
                    f"step{i}.{name}.{stat}: {got[stat]} != {ref[stat]}"
                )
            np.testing.assert_allclose(
                got["samples"], ref["samples"], rtol=1e-9,
                atol=1e-9 * scale,
                err_msg=f"step{i}.{name}.samples",
            )
