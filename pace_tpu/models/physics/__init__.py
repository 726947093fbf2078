from pace_tpu.models.physics.config import PhysicsConfig  # noqa: F401
