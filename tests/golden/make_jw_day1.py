"""Generate the CPU-verifiable JW day-1 anchor (VERDICT r4 next #7).

The 9-day JW artifact (tests/golden/jw_day9.json) can only be
regenerated on the TPU chip, so code drift that alters the trajectory
passes CI until someone reruns it there.  This anchor closes the loop
in-suite: one simulated day of the C12/79 **f64** JW baroclinic wave on
CPU (192 steps at dt=450 — the n_split=4 JW acoustic load), digested to
interior moments per field.  tests/test_jw_cpu_anchor.py (slow tier)
reruns the exact same segment through `run_day1()` and compares at a
calibrated threshold, so any numerics change turns CI red without chip
access.

Threshold calibration: f64 CPU reruns of the same program are
bit-reproducible; XLA-version / fusion-order reassociation drifts land
around 1e-12..1e-9 after one day of chaotic amplification (measured for
the round-3/4 reformulations: shared-pad shift ~8e-5 relative, pt-join
f64 <1e-9); genuine discretization changes land >=1e-4.  The 1e-7 gate
separates the two regimes.

Regenerate deliberately after intentional numerics changes:
    python tests/golden/make_jw_day1.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

N, NZ, H = 12, 79, 3
DT = 450.0
STEPS = 192  # one simulated day
PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                    "jw_day1_c12_f64.json")

FIELDS = ("delp", "pt", "w", "delz", "qvapor", "u", "v", "ps")


def run_day1():
    """Run the segment and return {field: [mean, mean|.|, max|.|]} over
    the interior, plus ps extrema in hPa.  Shared by the generator and
    the regression test so both execute the identical program."""
    import jax

    # persistent compile cache: the 192-step C12 f64 jit costs >1 h to
    # compile on constrained hosts; generator and --check reruns share
    # this entry (same env -> same executable)
    cache_dir = os.environ.get(
        "PACE_XLA_CACHE", os.path.expanduser("~/.cache/pace_tpu_xla"))
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp
    import numpy as np

    from pace_tpu.grid.generation import generate_grid_data
    from pace_tpu.models.fv3.config import DynamicalCoreConfig
    from pace_tpu.models.fv3.dynamics import DynamicalCore
    from pace_tpu.models.fv3.init.baroclinic import init_baroclinic_state
    from pace_tpu.utils.gridtools import GridSizing

    sizing = GridSizing(N, NZ)
    gd = generate_grid_data(N, NZ, dtype=jnp.float64)
    config = DynamicalCoreConfig(k_split=1, n_split=4)
    core = DynamicalCore(config, sizing, gd, timestep=DT)
    state = init_baroclinic_state(sizing, dtype=jnp.float64)

    @jax.jit
    def run(s):
        return jax.lax.fori_loop(
            0, STEPS, lambda i, x: core.step_dynamics(x), s)

    out = run(state)
    dig = {}
    for name in FIELDS:
        a = np.asarray(getattr(out, name), np.float64)
        v = a[:, H:H + N, H:H + N]
        dig[name] = [float(v.mean()), float(np.abs(v).mean()),
                     float(np.abs(v).max())]
    ps = np.asarray(out.ps)[:, H:H + N, H:H + N] / 100.0
    dig["ps_minmax_hpa"] = [float(ps.min()), float(ps.max())]
    return dig


RTOL = 1e-7


def check() -> int:
    """Rerun the segment and compare against the committed record at the
    calibrated threshold; returns a process exit code.  Run in its own
    process with the SAME environment main() uses (single CPU device) so
    generator and checker share one persistent-cache entry — under the
    test suite's 8-virtual-device conftest the compile would not hit the
    generator's cache (tests/test_jw_cpu_anchor.py invokes this via
    subprocess for exactly that reason)."""
    with open(PATH) as f:
        ref = json.load(f)["digest"]
    got = run_day1()
    rc = 0
    for name, vals in ref.items():
        for i, (a, b) in enumerate(zip(vals, got[name])):
            scale = max(abs(a), abs(b), 1e-30)
            rel = abs(a - b) / scale
            if rel > RTOL:
                print(f"MISMATCH {name}[{i}]: committed {a!r} vs rerun "
                      f"{b!r} (rel {rel:.3e} > {RTOL})")
                rc = 1
    print("jw day-1 anchor:", "FAIL" if rc else "OK")
    return rc


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    if "--check" in sys.argv:
        sys.exit(check())
    dig = run_day1()
    out = {
        "config": {"n": N, "nz": NZ, "dt": DT, "steps": STEPS,
                   "k_split": 1, "n_split": 4, "dtype": "float64"},
        "digest": dig,
    }
    with open(PATH, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {PATH}")
    for k, v in dig.items():
        print(k, v)


if __name__ == "__main__":
    main()
