"""Performance collection: per-step timings, SYPD, JSON reports.

Port of ai2cm/pace driver/pace/driver/performance/{config,collector,
report}.py: a PerformanceConfig builds a collector that times each step
and writes a JSON report with simulated-years-per-day (SYPD).
"""

from __future__ import annotations

import dataclasses
import json
import time
from typing import List, Optional

from pace_tpu.utils.timing import NullTimer, Timer


@dataclasses.dataclass
class PerformanceConfig:
    """performance_mode enables timing collection; profile_dir (if set)
    wraps the time loop in a jax.profiler trace (view with TensorBoard /
    xprof) — the analogue of the reference's cProfile + NVTX hooks."""

    performance_mode: bool = True
    experiment_name: str = "test"
    json_all_rank_threshold: int = 1
    profile_dir: Optional[str] = None
    # sections=True splits the step into DynCore / TracerAdvection /
    # Remapping (+ Physics) jits with host timing per phase — the
    # reference's per-section timers (collector.py:60-153).  Costs extra
    # dispatches and loses cross-phase fusion/donation: measure-only mode.
    sections: bool = False

    def build(self):
        if self.performance_mode:
            return PerformanceCollector(self.experiment_name)
        return NullPerformanceCollector()

    def build_profiler(self):
        if self.profile_dir:
            return JaxProfiler(self.profile_dir)
        return NullProfiler()


class JaxProfiler:
    def __init__(self, logdir: str):
        self.logdir = logdir

    def enable(self):
        import jax

        jax.profiler.start_trace(self.logdir)

    def dump_stats(self, *_args):
        import jax

        jax.profiler.stop_trace()


class NullProfiler:
    def enable(self):
        pass

    def dump_stats(self, *_args):
        pass


class PerformanceCollector:
    def __init__(self, experiment_name: str = "test"):
        self.experiment_name = experiment_name
        self.total_timer = Timer()
        self.timestep_timer = Timer()
        self.times_per_step: List[dict] = []
        self._t0: Optional[float] = None

    def start_step(self):
        self._t0 = time.perf_counter()

    def end_step(self):
        dt = time.perf_counter() - self._t0
        self.times_per_step.append(
            dict(mainloop=dt, **self.timestep_timer.times)
        )
        self.timestep_timer.reset()

    def sypd(self, dt_atmos: float) -> float:
        """Simulated years per wall-clock day, excluding the first
        (compile) step."""
        steps = self.times_per_step[1:] or self.times_per_step
        if not steps:
            return 0.0
        wall = sum(s["mainloop"] for s in steps)
        simulated = dt_atmos * len(steps)
        return (simulated / wall) * (86400.0 / (365.0 * 86400.0))

    def write_out_performance(self, backend: str, dt_atmos: float,
                              path: str = "."):
        report = dict(
            experiment_name=self.experiment_name,
            backend=backend,
            dt_atmos=dt_atmos,
            sypd=self.sypd(dt_atmos),
            times_per_step=self.times_per_step,
            total_times=self.total_timer.times,
        )
        fname = f"{path}/{self.experiment_name}_perf.json"
        with open(fname, "w") as f:
            json.dump(report, f, indent=2)
        return report


class NullPerformanceCollector(PerformanceCollector):
    def __init__(self):
        super().__init__("null")
        self.total_timer = NullTimer()
        self.timestep_timer = NullTimer()

    def start_step(self):
        pass

    def end_step(self):
        pass

    def write_out_performance(self, backend, dt_atmos, path="."):
        return {}
