"""Named accumulating timers (analogue of ai2cm/pace util/pace/util/_timing.py:9).

On accelerator backends each stop() blocks on outstanding device work so the
accumulated times are honest wall-clock sections.
"""

from __future__ import annotations

import time
from typing import Dict

import jax


class Timer:
    def __init__(self, sync: bool = True):
        self._clock_starts: Dict[str, float] = {}
        self._accumulated: Dict[str, float] = {}
        self._hits: Dict[str, int] = {}
        self._enabled = True
        self._sync = sync

    def start(self, name: str):
        if not self._enabled:
            return
        if name in self._clock_starts:
            raise ValueError(f"timer {name!r} started twice without stop")
        if self._sync:
            _device_sync()
        self._clock_starts[name] = time.perf_counter()

    def stop(self, name: str):
        if not self._enabled:
            return
        if self._sync:
            _device_sync()
        elapsed = time.perf_counter() - self._clock_starts.pop(name)
        self._accumulated[name] = self._accumulated.get(name, 0.0) + elapsed
        self._hits[name] = self._hits.get(name, 0) + 1

    def clock(self, name: str):
        return _TimerContext(self, name)

    @property
    def times(self) -> Dict[str, float]:
        return dict(self._accumulated)

    @property
    def hits(self) -> Dict[str, int]:
        return dict(self._hits)

    def reset(self):
        if self._clock_starts:
            raise ValueError("cannot reset while timers are running")
        self._accumulated.clear()
        self._hits.clear()

    def enable(self):
        self._enabled = True

    def disable(self):
        if self._clock_starts:
            raise ValueError("cannot disable while timers are running")
        self._enabled = False

    @property
    def enabled(self) -> bool:
        return self._enabled


class NullTimer(Timer):
    """A Timer that does nothing and cannot be enabled."""

    def __init__(self):
        super().__init__(sync=False)
        self._enabled = False

    def enable(self):
        raise NotImplementedError("NullTimer cannot be enabled")


class _TimerContext:
    def __init__(self, timer: Timer, name: str):
        self._timer, self._name = timer, name

    def __enter__(self):
        self._timer.start(self._name)
        return self

    def __exit__(self, *exc):
        self._timer.stop(self._name)


def _device_sync():
    try:
        fence(jax.device_put(0.0) + 0)
    except Exception:
        pass


def fence(arr):
    """Reliable completion fence: device->host transfer of one element.

    On the axon-tunneled TPU platform jax.block_until_ready returns
    before execution finishes, so timers fenced with it attribute work
    to whichever later call first transfers data.  Device execution is
    stream-ordered, so fetching one element of `arr` (enqueued after
    the producing computation) is a true fence on every backend.  Costs
    one host round trip (~dispatch latency on the tunnel) — use only on
    profiling paths, never in production step loops.
    """
    import numpy as np

    np.asarray(jax.device_get(arr.ravel()[0]))
