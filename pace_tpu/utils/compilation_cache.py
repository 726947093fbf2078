"""Persistent XLA compilation cache setup.

The C12+ whole-step jit takes minutes to compile from scratch; caching
compiled executables across processes makes the driver CLI, bench, and
test suite start warm.  Analogue of the reference's gt4py/DaCe build
cache (ai2cm/pace dsl/pace/dsl/dace/build.py), which persists generated
backends under .gt_cache for the same reason.
"""

from __future__ import annotations

import os


def enable_persistent_cache(cache_dir: str | None = None) -> str:
    """Point jax at a persistent on-disk compilation cache.

    Respects ``PACE_XLA_CACHE`` (default ``~/.cache/pace_tpu_xla``).
    Safe to call more than once.  Returns the cache directory used.
    """
    import jax

    if cache_dir is None:
        cache_dir = os.environ.get(
            "PACE_XLA_CACHE", os.path.expanduser("~/.cache/pace_tpu_xla")
        )
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    return cache_dir
