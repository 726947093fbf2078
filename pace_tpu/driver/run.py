"""CLI entry point: python -m pace_tpu.driver.run <config.yaml>

Port of ai2cm/pace driver/pace/driver/run.py (the click-based `pace run`
command; plain argparse here to avoid the dependency).
"""

from __future__ import annotations

import argparse
import logging
import sys


def main(argv=None):
    parser = argparse.ArgumentParser(
        prog="python -m pace_tpu.driver.run",
        description="Run the pace_tpu model from a yaml configuration.",
    )
    parser.add_argument("config_path", help="path to a yaml driver config")
    parser.add_argument(
        "--log-level", default="INFO",
        choices=["DEBUG", "INFO", "WARNING", "ERROR"],
    )
    parser.add_argument(
        "--platform", default=None,
        help="force a jax platform (e.g. cpu) before initialization",
    )
    args = parser.parse_args(argv)
    logging.basicConfig(
        level=getattr(logging, args.log_level),
        format="%(asctime)s %(name)s %(levelname)s %(message)s",
    )
    logger = logging.getLogger("pace_tpu.driver")

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from pace_tpu.utils.compilation_cache import enable_persistent_cache

    cache_dir = enable_persistent_cache()
    logger.info("XLA compilation cache: %s", cache_dir)

    # tunneled-TPU backends can fail transiently during init; probe with
    # retries before building the model (no-op on local backends)
    from pace_tpu.utils.backend import wait_for_backend

    wait_for_backend()

    from pace_tpu.driver.driver import Driver, DriverConfig

    config = DriverConfig.from_yaml(args.config_path)
    logger.info("initializing driver (n=%d, nz=%d, dt=%gs, %d steps)",
                config.nx_tile, config.nz, config.dt_atmos,
                config.n_timesteps())
    driver = Driver(config)
    logger.info("stepping %d timesteps", config.n_timesteps())
    try:
        driver.step_all()
    finally:
        # flush perf JSON / diagnostics / restart even on a crash, so a
        # failed run leaves a resumable state behind (reference
        # driver/pace/driver/run.py:89-92 try/finally cleanup)
        report = driver.cleanup()
        if report:
            logger.info("SYPD: %.4f", report.get("sypd", 0.0))
    logger.info("done")
    return 0


if __name__ == "__main__":
    sys.exit(main())
