"""Large-grid feasibility: AOT-compile the step sharded over an
(tile, x, y) mesh of virtual CPU devices and report XLA's per-device
memory analysis.

BASELINE.md north stars 4-5 are "C192 54-rank-equivalent decomposition
sharded via shard_map on a single TPU slice" and "C384 multi-host pod
run with an ML microphysics emulator in the step loop".  Real pods are
not reachable from this environment, so this proves the two things that
can be proven without one: (a) the full step partitions under GSPMD at
scale, and (b) the per-device footprint fits a v5e/v5p chip.  The
partitioner and memory analysis are backend-independent, so the CPU
backend suffices.

Usage (layout and grid via argv / env):

  python scripts/c384_memory.py                 # C384 coupled, (6,4,4)
  python scripts/c384_memory.py 6 2 2           # C384 coupled, (6,2,2)
  PACE_MEM_N=192 PACE_MEM_COUPLED=0 python scripts/c384_memory.py 6 2 2

Prints a human-readable table plus one machine-readable JSON line
(consumed by tests/test_memory_feasibility.py).
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# optional layout override: python scripts/c384_memory.py 6 8 8
if len(sys.argv) == 1:
    _LAYOUT = (6, 4, 4)
elif len(sys.argv) == 4:
    _LAYOUT = tuple(int(a) for a in sys.argv[1:4])
else:
    sys.exit("usage: c384_memory.py [tile x y]  (exactly 3 layout args)")
_NDEV = _LAYOUT[0] * _LAYOUT[1] * _LAYOUT[2]

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + f" --xla_force_host_platform_device_count={_NDEV}"
    ).strip()

import jax  # noqa: E402

# the environment's sitecustomize registers the tunneled-TPU platform and
# overrides JAX_PLATFORMS, so force the CPU backend via the config API too
jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P  # noqa: E402


def analyze(n, nz, layout, coupled, cache_dir=None):
    """AOT-compile the (optionally coupled) step on an abstract sharded
    state and return the per-device memory analysis in GiB."""
    if cache_dir is None:
        cache_dir = os.environ.get(
            "PACE_XLA_CACHE", os.path.expanduser("~/.cache/pace_tpu_xla")
        )
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from pace_tpu.grid.generation import generate_grid_data
    from pace_tpu.models.fv3.config import DynamicalCoreConfig
    from pace_tpu.models.fv3.dynamics import DynamicalCore
    from pace_tpu.models.fv3.state import DycoreState
    from pace_tpu.utils.gridtools import GridSizing

    dt = 112.5 if n >= 384 else 225.0
    sizing = GridSizing(n, nz)
    gd = generate_grid_data(n, nz, dtype=jnp.float32)
    n_split = 6 if n >= 192 else 2
    config = DynamicalCoreConfig(do_sat_adj=False, k_split=1, n_split=n_split)
    core = DynamicalCore(config, sizing, gd, timestep=dt)

    if coupled:
        from pace_tpu.models.coupler import (
            DycoreToPhysics,
            UpdateAtmosphereState,
        )
        from pace_tpu.models.physics.config import PhysicsConfig
        from pace_tpu.models.physics.emulator import MLPEmulatorConfig
        from pace_tpu.models.physics.physics import Physics

        phys_config = PhysicsConfig(
            dt_atmos=dt, npz=nz, microphysics_scheme="emulator",
            emulator=MLPEmulatorConfig(),
        )
        ptop = float(np.asarray(jax.device_get(gd.vertical.ptop)))
        physics = Physics(phys_config, gd.horizontal.area, ptop, dt)
        d2p = DycoreToPhysics(sizing, dtype=jnp.float32)
        update = UpdateAtmosphereState(
            gd, core.topo, sizing, dt, c2l_order=config.c2l_ord
        )

        def step(state):
            state = core.step_dynamics(state)
            phy = d2p(state)
            phy = physics(phy)
            return update(state, phy)
    else:
        step = core.step_dynamics

    devices = np.array(jax.devices()[: np.prod(layout)]).reshape(layout)
    mesh = Mesh(devices, ("tile", "x", "y"))

    # abstract sharded inputs: no real full-size arrays are materialized
    from pace_tpu.models.fv3.state import FIELD_METADATA, Z, ZI

    example = {}
    for name, (_, dims, _) in FIELD_METADATA.items():
        shape = [6, sizing.N, sizing.N]
        if dims[-1] == Z:
            shape.append(nz)
        elif dims[-1] == ZI:
            shape.append(nz + 1)
        spec = P("tile", "x", "y")
        example[name] = jax.ShapeDtypeStruct(
            tuple(shape), jnp.float32,
            sharding=NamedSharding(mesh, spec),
        )
    state = DycoreState(**example)

    lowered = jax.jit(step, donate_argnums=0).lower(state)
    compiled = lowered.compile()
    ma = compiled.memory_analysis()
    gib = 1024.0 ** 3
    peak = (
        ma.temp_size_in_bytes + ma.output_size_in_bytes
        + ma.argument_size_in_bytes - ma.alias_size_in_bytes
    ) / gib
    return {
        "n": n, "nz": nz, "layout": list(layout), "coupled": coupled,
        "temp_gib": round(ma.temp_size_in_bytes / gib, 3),
        "output_gib": round(ma.output_size_in_bytes / gib, 3),
        "args_gib": round(ma.argument_size_in_bytes / gib, 3),
        "alias_gib": round(ma.alias_size_in_bytes / gib, 3),
        "peak_gib": round(peak, 3),
    }


def main():
    n = int(os.environ.get("PACE_MEM_N", "384"))
    nz = int(os.environ.get("PACE_MEM_NZ", "79"))
    coupled = os.environ.get("PACE_MEM_COUPLED", "1") == "1"
    r = analyze(n, nz, _LAYOUT, coupled)
    kind = "coupled step + emulator" if coupled else "dycore step"
    print(f"C{n}/{nz} {kind} on {tuple(_LAYOUT)} mesh ({_NDEV} devices):")
    print(f"  temp   {r['temp_gib']:.2f} GiB/device")
    print(f"  output {r['output_gib']:.2f} GiB/device")
    print(f"  args   {r['args_gib']:.2f} GiB/device "
          f"(donated/aliased: {r['alias_gib']:.2f})")
    print(f"  peak ~= {r['peak_gib']:.2f} GiB/device "
          f"(v5e HBM: 15.75; v5p: 95)")
    print(json.dumps(r))


if __name__ == "__main__":
    main()
