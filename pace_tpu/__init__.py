"""pace_tpu: TPU-native FV3GFS/SHiELD atmospheric model.

Public API (the analogue of the reference's `pace`, `pace.fv3core`,
`pace.physics`, `pace.util`, `pace.driver` namespaces):

    from pace_tpu import (
        DynamicalCore, DynamicalCoreConfig, DycoreState,
        Physics, PhysicsConfig,
        Driver, DriverConfig,
        GridSizing, generate_grid_data,
    )
"""

__version__ = "0.1.0"


def __getattr__(name):
    # lazy imports keep `import pace_tpu` light (no jax initialization)
    if name in ("DynamicalCore", "DynamicalCoreConfig"):
        from pace_tpu.models.fv3 import config, dynamics

        return {
            "DynamicalCore": dynamics.DynamicalCore,
            "DynamicalCoreConfig": config.DynamicalCoreConfig,
        }[name]
    if name == "DycoreState":
        from pace_tpu.models.fv3.state import DycoreState

        return DycoreState
    if name in ("Physics", "PhysicsConfig", "PhysicsState"):
        from pace_tpu.models.physics import config as pconfig
        from pace_tpu.models.physics import physics, physics_state

        return {
            "Physics": physics.Physics,
            "PhysicsConfig": pconfig.PhysicsConfig,
            "PhysicsState": physics_state.PhysicsState,
        }[name]
    if name in ("Driver", "DriverConfig"):
        from pace_tpu.driver import driver

        return {
            "Driver": driver.Driver, "DriverConfig": driver.DriverConfig,
        }[name]
    if name == "GridSizing":
        from pace_tpu.utils.gridtools import GridSizing

        return GridSizing
    if name == "generate_grid_data":
        from pace_tpu.grid.generation import generate_grid_data

        return generate_grid_data
    if name == "Quantity":
        from pace_tpu.utils.quantity import Quantity

        return Quantity
    raise AttributeError(f"module 'pace_tpu' has no attribute {name!r}")
