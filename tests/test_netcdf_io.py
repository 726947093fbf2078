"""NetCDF3 interop: dataset round-trip, chunked time-series monitor,
state restart round-trip, and netcdf diagnostics — the scipy-based
analogue of the reference's xarray/netCDF4 I/O (ai2cm/pace
util/pace/util/io.py:11-60, monitor/netcdf_monitor.py:104)."""

import numpy as np
import pytest

from pace_tpu.utils.netcdf import (
    NetCDFMonitor,
    read_attrs,
    read_dataset,
    read_state,
    write_dataset,
    write_state,
)


def test_dataset_round_trip(tmp_path):
    path = str(tmp_path / "ds.nc")
    variables = {
        "a": np.arange(24, dtype=np.float64).reshape(2, 3, 4),
        "b": np.ones((2, 3), dtype=np.float32),
        "c": np.arange(5, dtype=np.int64),
        "flag": np.array([True, False]),
    }
    write_dataset(path, variables, attrs={"note": "hello"})
    out = read_dataset(path)
    np.testing.assert_array_equal(out["a"], variables["a"])
    assert out["a"].dtype == np.float64
    np.testing.assert_array_equal(out["b"], variables["b"])
    assert out["b"].dtype == np.float32
    np.testing.assert_array_equal(out["c"], variables["c"])  # int32 ok
    np.testing.assert_array_equal(out["flag"], [1, 0])
    assert read_attrs(path)["note"] == "hello"


def test_dataset_shared_dims_conflict(tmp_path):
    path = str(tmp_path / "bad.nc")
    with pytest.raises(ValueError, match="conflicting"):
        write_dataset(
            path,
            {"a": np.zeros((3,)), "b": np.zeros((4,))},
            dims={"a": ("x",), "b": ("x",)},
        )


def test_state_round_trip(tmp_path):
    path = str(tmp_path / "state.nc")
    state = {
        "time": "2000-01-01 00:00:00",
        "delp": np.random.RandomState(0).rand(6, 8, 8, 4),
        "ps": np.random.RandomState(1).rand(6, 8, 8),
    }
    write_state(state, path)
    out = read_state(path)
    assert out["time"] == "2000-01-01 00:00:00"
    np.testing.assert_array_equal(out["delp"], state["delp"])
    np.testing.assert_array_equal(out["ps"], state["ps"])


def test_state_requires_time(tmp_path):
    with pytest.raises(ValueError, match="time"):
        write_state({"delp": np.zeros((6, 2, 2))}, str(tmp_path / "x.nc"))


def test_monitor_chunked_series(tmp_path):
    path = str(tmp_path / "series")
    mon = NetCDFMonitor(path, time_chunk_size=2)
    rs = np.random.RandomState(0)
    truth = []
    for t in range(5):
        state = {"time": f"t{t}", "q": rs.rand(6, 4, 4)}
        truth.append(state)
        mon.store(state)
    mon.cleanup()  # flushes the trailing odd chunk
    import os

    files = sorted(f for f in os.listdir(path) if f.endswith(".nc"))
    assert files == ["state_000000.nc", "state_000002.nc",
                     "state_000004.nc"]
    times, states = NetCDFMonitor.read(path)
    assert times == [f"t{t}" for t in range(5)]
    for got, want in zip(states, truth):
        np.testing.assert_array_equal(got["q"], want["q"])


def test_restart_netcdf_round_trip(tmp_path):
    """Driver restart written as NetCDF loads back identically
    (VERDICT r1 item 5)."""
    import jax.numpy as jnp

    from pace_tpu.driver.restart import load_restart_arrays, write_restart
    from pace_tpu.models.fv3.init.baroclinic import init_baroclinic_state
    from pace_tpu.utils.gridtools import GridSizing

    sizing = GridSizing(12, 79)
    state = init_baroclinic_state(sizing, dtype=jnp.float32)
    path = str(tmp_path / "R")
    write_restart(state, "2000-01-02 00:00:00", path, format="netcdf")
    arrays = load_restart_arrays(path)
    np.testing.assert_array_equal(arrays["delp"], np.asarray(state.delp))
    np.testing.assert_array_equal(arrays["u"], np.asarray(state.u))
    assert read_attrs(
        str(tmp_path / "R" / "dycore_state.nc")
    )["time"].startswith("2000-01-02")


def test_netcdf_diagnostics_with_derived(tmp_path):
    """output_format: netcdf diagnostics produce readable series files
    including a column-integrated water derived field."""
    import jax.numpy as jnp

    from pace_tpu.driver.diagnostics import DiagnosticsConfig
    from pace_tpu.models.fv3.init.baroclinic import init_baroclinic_state
    from pace_tpu.utils.constants import GRAV
    from pace_tpu.utils.gridtools import GridSizing

    sizing = GridSizing(12, 79)
    state = init_baroclinic_state(sizing, dtype=jnp.float64)
    config = DiagnosticsConfig(
        path=str(tmp_path / "diag"),
        output_format="netcdf",
        names=["ps"],
        derived_names=["column_integrated_qvapor"],
    )
    diag = config.diagnostics_factory(sizing)
    diag.store("2000-01-01", state)
    diag.cleanup()
    times, states = NetCDFMonitor.read(str(tmp_path / "diag"))
    assert times == ["2000-01-01"]
    n = sizing.n
    assert states[0]["ps"].shape == (6, n, n)
    ciw = states[0]["column_integrated_qvapor"]
    assert ciw.shape == (6, n, n)
    # cross-check against the direct formula on the compute domain
    h = sizing.halo
    q = np.asarray(state.qvapor)[:, h:h + n, h:h + n]
    delp = np.asarray(state.delp)[:, h:h + n, h:h + n]
    np.testing.assert_allclose(ciw, (q * delp).sum(-1) / GRAV, rtol=1e-12)
    assert ciw.min() >= 0.0 and ciw.max() < 100.0  # physical kg/m**2


def test_unsupported_derived_name_rejected():
    from pace_tpu.driver.diagnostics import DiagnosticsConfig

    with pytest.raises(ValueError, match="unsupported derived"):
        DiagnosticsConfig(path="/tmp/x", derived_names=["not_a_thing"])
