"""Jablonowski & Williamson (2006) baroclinic wave validation run.

The canonical deterministic dycore test: a 1 m/s zonal-wind perturbation
at (20E, 40N) on a balanced zonal state amplifies through baroclinic
instability — the surface-pressure minimum stays near 1000 hPa until
day ~4 and then deepens explosively, reaching ~960-970 hPa by day 9 at
medium resolution (JW06 Figs. 6-8).

Result on one real TPU chip (float32, C24/79, dt=300s, n_split=4,
2026-08-16, 77 s wall per simulated day):

    day 1: ps_min  999.35 hPa   max|va|  2.6 m/s
    day 4: ps_min  998.27 hPa   max|va|  5.2 m/s
    day 6: ps_min  994.97 hPa   max|va|  9.6 m/s
    day 8: ps_min  977.58 hPa   max|va| 22.4 m/s
    day 9: ps_min  963.08 hPa   max|va| 28.8 m/s

matching the published evolution. Run: python jw_baroclinic_wave.py [days]
"""

import sys
import time

import numpy as np


def main(days: int = 9, n: int = 24, nz: int = 79, dt: float = 300.0):
    import jax
    import jax.numpy as jnp

    from pace_tpu.grid.generation import generate_grid_data
    from pace_tpu.models.fv3.config import DynamicalCoreConfig
    from pace_tpu.models.fv3.dynamics import DynamicalCore
    from pace_tpu.models.fv3.init.baroclinic import init_baroclinic_state
    from pace_tpu.utils.gridtools import GridSizing

    sizing = GridSizing(n, nz)
    gd = generate_grid_data(n, nz, dtype=jnp.float32)
    cfg = DynamicalCoreConfig(do_sat_adj=False, k_split=1, n_split=4)
    core = DynamicalCore(cfg, sizing, gd, timestep=dt)
    state = init_baroclinic_state(sizing, dtype=jnp.float32)
    step = jax.jit(core.step_dynamics)
    h = sizing.halo
    steps_per_day = int(86400 / dt)
    state = step(state)
    jax.block_until_ready(state.delp)
    for day in range(1, days + 1):
        t1 = time.perf_counter()
        for _ in range(steps_per_day - (1 if day == 1 else 0)):
            state = step(state)
        jax.block_until_ready(state.delp)
        ps = np.asarray(state.ps)[:, h:h + n, h:h + n]
        va = np.asarray(state.va)[:, h:h + n, h:h + n]
        print(
            f"day {day}: ps_min {ps.min()/100:.2f} hPa, "
            f"ps_max {ps.max()/100:.2f} hPa, "
            f"max|va| {np.abs(va).max():.2f} m/s, "
            f"wall {time.perf_counter()-t1:.0f}s", flush=True,
        )
    assert np.isfinite(ps).all()
    if days >= 9:
        assert ps.min() / 100 < 985.0, "baroclinic wave failed to amplify"


if __name__ == "__main__":
    main(days=int(sys.argv[1]) if len(sys.argv) > 1 else 9)
