"""Generate the golden digest for the C12 baroclinic dycore step.

Records compact statistical digests (moments + strided samples of the
compute domain) of every DycoreState field after 1 and 4 steps in f64 on
CPU.  tests/test_golden.py compares future runs against this file —
the savepoint-regression analogue (reference translate tests) without
multi-MB binary baselines.

Regenerate deliberately after intentional numerics changes:
    python tests/golden/make_golden.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))


def state_digest(state, sizing):
    import dataclasses

    import numpy as np

    h, n = sizing.halo, sizing.n
    digest = {}
    for f in dataclasses.fields(state):
        a = np.asarray(getattr(state, f.name), dtype=np.float64)
        if a.ndim >= 3:
            a = a[:, h:h + n, h:h + n]
        flat = a.ravel()
        samples = flat[:: max(1, flat.size // 64)][:64]
        digest[f.name] = dict(
            mean=float(flat.mean()),
            std=float(flat.std()),
            min=float(flat.min()),
            max=float(flat.max()),
            samples=[float(x) for x in samples],
        )
    return digest


def run():
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from pace_tpu.grid.generation import generate_grid_data
    from pace_tpu.models.fv3.config import DynamicalCoreConfig
    from pace_tpu.models.fv3.dynamics import DynamicalCore
    from pace_tpu.models.fv3.init.baroclinic import init_baroclinic_state
    from pace_tpu.utils.gridtools import GridSizing

    sizing = GridSizing(12, 79)
    gd = generate_grid_data(12, 79, dtype=jnp.float64)
    core = DynamicalCore(
        DynamicalCoreConfig(do_sat_adj=False), sizing, gd, timestep=225.0
    )
    state = init_baroclinic_state(sizing, dtype=jnp.float64)
    step = jax.jit(core.step_dynamics)
    out = {"config": "C12/79 f64 baroclinic, do_sat_adj=False, dt=225"}
    for i in range(1, 5):
        state = step(state)
        if i in (1, 4):
            out[f"step{i}"] = state_digest(state, sizing)
    path = os.path.join(os.path.dirname(__file__), "c12_dycore_digest.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", path)


if __name__ == "__main__":
    run()
