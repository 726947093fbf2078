"""C384 multi-host feasibility: AOT-compile the coupled step (dycore +
physics with the ML microphysics emulator) sharded over a 96-device
(6, 4, 4) mesh and report XLA's per-device memory analysis.

BASELINE.md north star 5 is "C384 multi-host pod run with an ML
microphysics emulator in the step loop".  Real pods are not reachable
from this environment, so this proves the two things that can be proven
without one: (a) the full coupled step partitions under GSPMD at C384
scale, and (b) the per-device footprint fits a v5e/v5p chip.  Run on
the CPU backend (the partitioner and memory analysis are
backend-independent):

  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=96 \
      python scripts/c384_memory.py
"""

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


def main():
    from pace_tpu.grid.generation import generate_grid_data
    from pace_tpu.models.coupler import DycoreToPhysics, UpdateAtmosphereState
    from pace_tpu.models.fv3.config import DynamicalCoreConfig
    from pace_tpu.models.fv3.dynamics import DynamicalCore
    from pace_tpu.models.fv3.state import DycoreState
    from pace_tpu.models.physics.config import PhysicsConfig
    from pace_tpu.models.physics.emulator import MLPEmulatorConfig
    from pace_tpu.models.physics.physics import Physics
    from pace_tpu.utils.gridtools import GridSizing

    n, nz, dt = 384, 79, 112.5
    layout = _LAYOUT
    sizing = GridSizing(n, nz)
    gd = generate_grid_data(n, nz, dtype=jnp.float32)
    config = DynamicalCoreConfig(do_sat_adj=False, k_split=1, n_split=6)
    core = DynamicalCore(config, sizing, gd, timestep=dt)
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

    devices = np.array(jax.devices()[: np.prod(layout)]).reshape(layout)
    mesh = Mesh(devices, ("tile", "x", "y"))

    def step(state):
        state = core.step_dynamics(state)
        phy = d2p(state)
        phy = physics(phy)
        return update(state, phy)

    # abstract sharded inputs: no real C384 arrays are materialized
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
    print(f"C384/{nz} coupled step + emulator on {layout} mesh "
          f"({np.prod(layout)} devices):")
    print(f"  temp   {ma.temp_size_in_bytes / gib:.2f} GiB/device")
    print(f"  output {ma.output_size_in_bytes / gib:.2f} GiB/device")
    print(f"  args   {ma.argument_size_in_bytes / gib:.2f} GiB/device "
          f"(donated/aliased: {ma.alias_size_in_bytes / gib:.2f})")
    peak = (
        ma.temp_size_in_bytes + ma.output_size_in_bytes
        + ma.argument_size_in_bytes - ma.alias_size_in_bytes
    ) / gib
    print(f"  peak ~= {peak:.2f} GiB/device (v5e HBM: 15.75; v5p: 95)")


if __name__ == "__main__":
    main()
