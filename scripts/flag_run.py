"""Run N C48 f32 dycore steps under the current PACE_* env flags and
print one JSON line: per-step ms + a state digest for cross-config
numeric comparison.  Used by scripts/flag_matrix.sh to validate the
opt-in Pallas kernels (SIM1/spline/fused-d_sw/fillz/c_sw) on real TPU
hardware and pick defaults.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from bench import _wait_for_backend, _sync  # noqa: E402


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
        pass

    _wait_for_backend()

    from pace_tpu.grid.generation import generate_grid_data
    from pace_tpu.models.fv3.config import DynamicalCoreConfig
    from pace_tpu.models.fv3.dynamics import DynamicalCore
    from pace_tpu.models.fv3.init.baroclinic import init_baroclinic_state
    from pace_tpu.utils.gridtools import GridSizing

    n = int(os.environ.get("PACE_BENCH_N", "48"))
    nz = 79
    sizing = GridSizing(n, nz)
    grid_data = generate_grid_data(n, nz, dtype=jnp.float32)
    # k_split/n_split knobs: whole-config differentials are the reliable
    # per-section measurement on the tunneled chip (docs/ROADMAP.md)
    config = DynamicalCoreConfig(
        do_sat_adj=False,
        k_split=int(os.environ.get("PACE_BENCH_KSPLIT", "1")),
        n_split=int(os.environ.get("PACE_BENCH_NSPLIT", "2")),
    )
    # advective CFL: scale the step with grid spacing exactly like
    # bench.py (C48 -> 450 s, C96 -> 225 s); a fixed 450 s at C96 blows
    # up physically within a few steps (measured: NaN by step 10).
    core = DynamicalCore(config, sizing, grid_data,
                         timestep=450.0 * (48.0 / n))

    def run_n(state, n_steps):
        return jax.lax.fori_loop(
            0, n_steps, lambda i, s: core.step_dynamics(s), state
        )

    run_n_jit = jax.jit(run_n, static_argnums=1, donate_argnums=0)
    n_steps = int(os.environ.get("PACE_BENCH_STEPS", "10"))

    warm = None
    t_compile0 = time.perf_counter()
    for attempt in range(3):
        try:
            fresh = init_baroclinic_state(sizing, dtype=jnp.float32)
            warm = run_n_jit(fresh, n_steps)
            _sync(warm.delp)
            break
        except Exception as e:
            if attempt == 2:
                raise
            print(f"# warmup attempt {attempt+1} failed: {type(e).__name__}: "
                  f"{str(e)[:200]}", file=sys.stderr)
            time.sleep(5.0)
    t_compile = time.perf_counter() - t_compile0

    t0 = time.perf_counter()
    state = run_n_jit(warm, n_steps)
    _sync(state.delp)
    per_step_ms = (time.perf_counter() - t0) / n_steps * 1000

    # digest after 2*n_steps: interior means of key prognostics.
    # State layout is (tile, x, y, z) — z LAST (models/fv3/state.py:31
    # FIELD_METADATA; ops/xppm.py x_flux shifts axis 1).
    # Staggered fields use their true extents (u: (X, YI) -> (n, n+1),
    # v: (XI, Y) -> (n+1, n)) so the digest covers the complete compute
    # domain of every field.
    h = sizing.halo
    extents = {"delp": (n, n), "pt": (n, n), "w": (n, n),
               "qvapor": (n, n), "u": (n, n + 1), "v": (n + 1, n)}
    dig = {}
    finite = True
    for name, (ey, ex) in extents.items():
        a = getattr(state, name)
        v = a[:, h:h + ey, h:h + ex]
        dig[name] = [float(jnp.mean(v)), float(jnp.mean(jnp.abs(v))),
                     float(jnp.max(jnp.abs(v)))]
        finite = finite and bool(jnp.isfinite(v).all())

    flags = {k: v for k, v in os.environ.items() if k.startswith("PACE_")
             and k not in ("PACE_XLA_CACHE",)}
    print(json.dumps({
        "flags": flags, "per_step_ms": round(per_step_ms, 2),
        "compile_s": round(t_compile, 1), "finite": finite,
        "digest": dig,
    }), flush=True)


if __name__ == "__main__":
    main()
