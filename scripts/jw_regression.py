"""Generate the committed JW baroclinic-wave day-9 regression artifact.

Runs the Jablonowski & Williamson (2006) baroclinic-wave case (C24/79,
f32, dt=300s, n_split=4 — the configuration of
examples/validation/jw_baroclinic_wave.py) for 9 simulated days and
writes per-day metrics (ps min/max, max |va|, surface-pressure-minimum
position) to tests/golden/jw_day9.json.  The committed artifact is
validated against published JW06 windows by tests/test_jw_regression.py;
regenerate it on the TPU chip after any numerics change with:

    python scripts/jw_regression.py

(CPU works too, ~10x slower.)
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(days: int = 9, n: int = 24, nz: int = 79, dt: float = 300.0):
    import jax
    import jax.numpy as jnp

    from pace_tpu.grid.generation import generate_grid_data
    from pace_tpu.models.fv3.config import DynamicalCoreConfig
    from pace_tpu.models.fv3.dynamics import DynamicalCore
    from pace_tpu.models.fv3.init.baroclinic import init_baroclinic_state
    from pace_tpu.utils.backend import wait_for_backend
    from pace_tpu.utils.gridtools import GridSizing

    cache_dir = os.environ.get(
        "PACE_XLA_CACHE", os.path.expanduser("~/.cache/pace_tpu_xla"))
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    wait_for_backend()

    sizing = GridSizing(n, nz)
    gd = generate_grid_data(n, nz, dtype=jnp.float32)
    cfg = DynamicalCoreConfig(do_sat_adj=False, k_split=1, n_split=4)
    core = DynamicalCore(cfg, sizing, gd, timestep=dt)
    state = init_baroclinic_state(sizing, dtype=jnp.float32)

    steps_per_day = int(86400 / dt)

    def run_day(s):
        return jax.lax.fori_loop(
            0, steps_per_day, lambda i, x: core.step_dynamics(x), s)

    run_day_jit = jax.jit(run_day, donate_argnums=0)
    h = sizing.halo
    aglon = np.asarray(gd.horizontal.lon_agrid)[:, h:h + n, h:h + n]
    aglat = np.asarray(gd.horizontal.lat_agrid)[:, h:h + n, h:h + n]

    results = []
    for day in range(1, days + 1):
        t0 = time.perf_counter()
        state = run_day_jit(state)
        ps = np.asarray(jax.device_get(state.ps))[:, h:h + n, h:h + n]
        va = np.asarray(jax.device_get(state.va))[:, h:h + n, h:h + n]
        wall = time.perf_counter() - t0
        idx = np.unravel_index(np.argmin(ps), ps.shape)
        rec = {
            "day": day,
            "ps_min_hpa": round(float(ps.min()) / 100.0, 3),
            "ps_max_hpa": round(float(ps.max()) / 100.0, 3),
            "max_abs_va": round(float(np.abs(va).max()), 3),
            "ps_min_lon_deg": round(float(np.degrees(aglon[idx])), 2),
            "ps_min_lat_deg": round(float(np.degrees(aglat[idx])), 2),
        }
        results.append(rec)
        print(f"day {day}: ps_min {rec['ps_min_hpa']} hPa  "
              f"max|va| {rec['max_abs_va']} m/s  wall {wall:.0f}s",
              flush=True)

    out = {
        "config": {"n": n, "nz": nz, "dt": dt, "n_split": 4, "k_split": 1,
                   "dtype": "float32"},
        "platform": jax.devices()[0].platform,
        "days": results,
    }
    # PACE_JW_OUT redirects the output (e.g. for flag-variant runs such
    # as the fused-d_sw trajectory validation) so experiment runs never
    # clobber the committed artifact.
    path = os.environ.get("PACE_JW_OUT") or os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tests", "golden", "jw_day9.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {path}")


if __name__ == "__main__":
    main(days=int(sys.argv[1]) if len(sys.argv) > 1 else 9)
