"""Accelerator backend readiness probe.

The axon-tunneled TPU platform initializes lazily at the first device op
and can fail transiently (UNAVAILABLE / INTERNAL / 'not in the list of
known backends') while the remote service restarts.  Probe it explicitly
with retries before any real work — on local backends (cpu) the probe is
a no-op costing microseconds.
"""

from __future__ import annotations

import sys
import time

TRANSIENT_KEYS = (
    "INTERNAL", "remote_compile", "UNAVAILABLE", "DEADLINE_EXCEEDED",
    "response body", "backend setup", "Unable to initialize backend",
    "not in the list of known backends",
)


def is_transient(e: Exception) -> bool:
    return any(key in str(e) for key in TRANSIENT_KEYS)


def wait_for_backend(max_wait_s: float = 1800.0):
    """Block until the default jax backend answers a trivial op."""
    import jax.numpy as jnp

    deadline = time.monotonic() + max_wait_s
    delay = 5.0
    while True:
        try:
            jnp.zeros((8, 128)).block_until_ready()
            return
        except Exception as e:
            if not is_transient(e) or time.monotonic() > deadline:
                raise
            print(f"# backend unavailable ({type(e).__name__}); "
                  f"retrying in {delay:.0f}s", file=sys.stderr)
            time.sleep(delay)
            delay = min(delay * 2, 60.0)
