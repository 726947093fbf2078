"""Model analysis tools.

Analogue of ai2cm/pace driver/pace/driver/tools.py + dsl/dace/utils.py
(memory_static_analysis, kernel_theoretical_timing): uses XLA's compiled
memory/cost analysis of the jitted model step instead of DaCe SDFG
inspection.

Usage:
  python -m pace_tpu.driver.tools memory <config.yaml> [--platform cpu]
  python -m pace_tpu.driver.tools cost   <config.yaml> [--platform cpu]
"""

from __future__ import annotations

import argparse
import sys


def _build_lowered(config_path: str):
    import jax

    from pace_tpu.driver.driver import Driver, DriverConfig

    config = DriverConfig.from_yaml(config_path)
    driver = Driver(config)
    lowered = jax.jit(driver._step).lower(driver.state.dycore_state)
    return lowered


def memory_static_analysis(config_path: str) -> dict:
    """Compile the model step and report XLA's memory analysis."""
    compiled = _build_lowered(config_path).compile()
    mem = compiled.memory_analysis()
    report = {}
    for attr in ("argument_size_in_bytes", "output_size_in_bytes",
                 "temp_size_in_bytes", "generated_code_size_in_bytes",
                 "alias_size_in_bytes"):
        if hasattr(mem, attr):
            report[attr] = getattr(mem, attr)
    return report


def kernel_theoretical_timing(config_path: str) -> dict:
    """Compile the model step and report XLA's cost analysis (flops,
    bytes accessed -> roofline-style theoretical time)."""
    compiled = _build_lowered(config_path).compile()
    cost = compiled.cost_analysis()
    if isinstance(cost, list):
        cost = cost[0] if cost else {}
    return dict(cost) if cost else {}


def main(argv=None):
    parser = argparse.ArgumentParser(prog="python -m pace_tpu.driver.tools")
    parser.add_argument("action", choices=["memory", "cost"])
    parser.add_argument("config_path")
    parser.add_argument("--platform", default=None)
    args = parser.parse_args(argv)
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    if args.action == "memory":
        report = memory_static_analysis(args.config_path)
        for k, v in report.items():
            print(f"{k}: {v / 1024**2:.2f} MiB"
                  if "bytes" in k else f"{k}: {v}")
    else:
        report = kernel_theoretical_timing(args.config_path)
        for k in sorted(report):
            print(f"{k}: {report[k]:.4g}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
