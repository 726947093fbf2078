"""Benchmark: per-step wall time of the jitted FV3 dycore on the local
accelerator (TPU under axon; CPU otherwise).

Prints one JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.
The headline number is simulated days per wall-clock day for the C48
nonhydrostatic baroclinic configuration (dt=450s), the reference's own
SYPD-style metric (ai2cm/pace driver/pace/driver/performance/report.py:116).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _sync(arr):
    """Force completion: on the axon-tunneled TPU platform,
    jax.block_until_ready returns before execution finishes, so a
    device->host transfer is the only reliable fence."""
    import numpy as np
    import jax

    np.asarray(jax.device_get(arr.ravel()[0]))


def main():
    import jax
    import jax.numpy as jnp

    from pace_tpu.grid.generation import generate_grid_data
    from pace_tpu.models.fv3.config import DynamicalCoreConfig
    from pace_tpu.models.fv3.dynamics import DynamicalCore
    from pace_tpu.models.fv3.init.baroclinic import init_baroclinic_state
    from pace_tpu.utils.gridtools import GridSizing

    n = int(os.environ.get("PACE_BENCH_N", "48"))
    nz = 79
    dt_atmos = 450.0
    sizing = GridSizing(n, nz)
    grid_data = generate_grid_data(n, nz, dtype=jnp.float32)
    config = DynamicalCoreConfig(do_sat_adj=False, k_split=1, n_split=2)
    core = DynamicalCore(config, sizing, grid_data, timestep=dt_atmos)
    state = init_baroclinic_state(sizing, dtype=jnp.float32)

    step = jax.jit(core.step_dynamics)
    # compile + warmup
    state = step(state)
    _sync(state.delp)

    n_steps = int(os.environ.get("PACE_BENCH_STEPS", "10"))
    t0 = time.perf_counter()
    for _ in range(n_steps):
        state = step(state)
    _sync(state.delp)
    elapsed = time.perf_counter() - t0
    per_step = elapsed / n_steps
    simulated_days_per_day = dt_atmos / per_step

    # sanity: perf on garbage does not count
    h = sizing.halo
    interior = state.delp[:, h:h + n, h:h + n]
    assert bool(jnp.isfinite(interior).all()), "NaN in benchmark state"

    print(json.dumps({
        "metric": f"c{n}_simulated_days_per_day",
        "value": round(simulated_days_per_day, 2),
        "unit": "days/day",
        "vs_baseline": round(simulated_days_per_day, 2),
        "per_step_ms": round(per_step * 1000, 2),
        "platform": jax.devices()[0].platform,
    }))


if __name__ == "__main__":
    main()
