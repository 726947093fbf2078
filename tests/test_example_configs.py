"""Every example yaml must hydrate through the strict DriverConfig loader
(the analogue of the reference's tests/main/test_example_configs.py, which
validates every driver/examples/configs/*.yaml)."""

import glob
import os

import pytest

CONFIG_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "examples", "configs",
)
CONFIGS = sorted(glob.glob(os.path.join(CONFIG_DIR, "*.yaml")))


@pytest.mark.parametrize(
    "path", CONFIGS, ids=[os.path.basename(p) for p in CONFIGS]
)
def test_example_config_hydrates(path):
    from pace_tpu.driver.driver import DriverConfig

    config = DriverConfig.from_yaml(path)
    assert config.nx_tile >= 12
    assert config.n_timesteps() > 0
    # every referenced diagnostic name must be a real state field
    import dataclasses

    from pace_tpu.models.fv3.state import DycoreState

    fields = {f.name for f in dataclasses.fields(DycoreState)} | {"ps"}
    for name in config.diagnostics_config.names:
        assert name in fields, f"{os.path.basename(path)}: {name}"


def test_config_dir_nonempty():
    assert len(CONFIGS) >= 4
