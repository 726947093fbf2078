"""Test configuration: run everything on CPU with 8 virtual devices and
float64 enabled, so multi-chip sharding logic and numerics can be validated
without TPU hardware."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["JAX_PLATFORMS"] = "cpu"  # force: the env presets the TPU tunnel
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "1")

import jax  # noqa: E402

# The environment's sitecustomize imports jax and registers the tunneled TPU
# ("axon") platform before this file runs, so the env vars above are not
# enough on their own — force the platform via the config API too.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_num_cpu_devices", 8)
