"""Driver configuration: yaml/dict hydration, registry, and components."""

import dataclasses

import numpy as np
import pytest

from pace_tpu.driver._from_dict import ConfigError, from_dict
from pace_tpu.driver.driver import DriverConfig
from pace_tpu.driver.initialization import BaroclinicInit
from pace_tpu.driver.performance import PerformanceCollector
from pace_tpu.driver.registry import Registry
from pace_tpu.driver.safety_checks import SafetyChecker


BASE = dict(
    nx_tile=12, nz=79, dt_atmos=225.0, minutes=15,
    initialization={"type": "baroclinic"},
)


def test_from_dict_basic():
    cfg = DriverConfig.from_dict(dict(BASE))
    assert cfg.nx_tile == 12
    assert cfg.n_timesteps() == 4
    assert isinstance(cfg.initialization.config, BaroclinicInit)
    assert cfg.initialization.start_time.year == 2000


def test_from_dict_rejects_unknown_keys():
    bad = dict(BASE, not_a_real_option=3)
    with pytest.raises(ConfigError, match="not_a_real_option"):
        DriverConfig.from_dict(bad)


def test_from_dict_rejects_missing_required():
    bad = dict(BASE)
    del bad["nx_tile"]
    with pytest.raises(ConfigError, match="nx_tile"):
        DriverConfig.from_dict(bad)


def test_from_dict_nested_dycore_config():
    cfg = DriverConfig.from_dict(
        dict(BASE, dycore_config={"k_split": 2, "n_split": 3})
    )
    assert cfg.dycore_config.k_split == 2
    assert cfg.dycore_config.n_split == 3


def test_from_dict_type_check():
    with pytest.raises(ConfigError, match="nx_tile"):
        DriverConfig.from_dict(dict(BASE, nx_tile="twelve"))


def test_registry_unknown_type():
    reg = Registry()

    @reg.register("a")
    @dataclasses.dataclass
    class A:
        x: int = 0

    assert reg.from_dict({"type": "a", "config": {"x": 2}}).x == 2
    with pytest.raises(ConfigError, match="unknown type"):
        reg.from_dict({"type": "b"})


def test_diagnostics_config_requires_path():
    from pace_tpu.driver.diagnostics import DiagnosticsConfig

    with pytest.raises(ValueError, match="path"):
        DiagnosticsConfig(names=["pt"])


def test_safety_checker_bounds():
    SafetyChecker.clear_all_checks()
    SafetyChecker.register_variable("pt", minimum_value=0.0,
                                    maximum_value=1.0)

    class FakeState:
        pt = np.array([[[0.5, 2.0]]])

    with pytest.raises(RuntimeError, match="outside"):
        SafetyChecker().check_state(FakeState())
    SafetyChecker.clear_all_checks()


def test_performance_collector_sypd():
    pc = PerformanceCollector("t")
    for dt in (10.0, 1.0, 1.0):  # first step is compile, excluded
        pc.start_step()
        pc._t0 -= dt  # simulate elapsed wall time
        pc.end_step()
    # 2 steps x 225 s simulated in 2 s wall -> 225 sim-s per wall-s
    sypd = pc.sypd(dt_atmos=225.0)
    assert abs(sypd - 225.0 / 365.0) < 1e-6


def test_restart_init_roundtrip(tmp_path):
    """RestartInit loads what write_restart saved (npy fast path)."""
    import dataclasses

    import jax.numpy as jnp

    from pace_tpu.driver.initialization import RestartInit
    from pace_tpu.driver.restart import write_restart
    from pace_tpu.models.fv3.init.baroclinic import init_baroclinic_state
    from pace_tpu.utils.gridtools import GridSizing

    sizing = GridSizing(12, 79)
    state = init_baroclinic_state(sizing, dtype=jnp.float64)
    write_restart(state, "2000-01-02", str(tmp_path / "R"))
    loaded = RestartInit(path=str(tmp_path / "R")).get_dycore_state(
        sizing, jnp.float64
    )
    for f in dataclasses.fields(state):
        a = np.asarray(getattr(state, f.name))
        b = np.asarray(getattr(loaded, f.name))
        both_nan = np.isnan(a) & np.isnan(b)
        assert ((a == b) | both_nan).all(), f.name


def test_mesh_config_build():
    """MeshConfig builds a (tile, x, y) Mesh over the virtual devices;
    dcn_mesh_shape must divide layout (multi-host placement contract)."""
    import jax

    from pace_tpu.driver.driver import MeshConfig

    assert MeshConfig(layout=(1, 1, 1)).build() is None
    if len(jax.devices()) >= 8:
        mesh = MeshConfig(layout=(2, 2, 2)).build()
        assert mesh.axis_names == ("tile", "x", "y")
        assert mesh.devices.shape == (2, 2, 2)
    with pytest.raises(ValueError, match="divide"):
        MeshConfig(layout=(6, 1, 1), dcn_mesh_shape=(4, 1, 1)).build()


def test_config_rejects_unsupported_modes():
    from pace_tpu.models.fv3.config import DynamicalCoreConfig
    from pace_tpu.models.fv3.dynamics import DynamicalCore
    from pace_tpu.utils.gridtools import GridSizing

    sizing = GridSizing(12, 79)
    with pytest.raises(NotImplementedError, match="hydrostatic"):
        DynamicalCore(DynamicalCoreConfig(hydrostatic=True), sizing,
                      None, 225.0)
    with pytest.raises(NotImplementedError, match="consv_te"):
        DynamicalCore(DynamicalCoreConfig(consv_te=0.7), sizing,
                      None, 225.0)
