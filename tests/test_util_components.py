"""util components: namelist parser, checkpointers, nudging, monitors."""

import os

import numpy as np
import pytest

from pace_tpu.utils.checkpointer import (
    SnapshotCheckpointer,
    ThresholdCalibrationCheckpointer,
    ValidationCheckpointer,
)
from pace_tpu.utils.monitor import NpzMonitor, read_state, write_state
from pace_tpu.utils.namelist import Namelist, parse_namelist
from pace_tpu.utils.nudging import apply_nudging, get_nudging_tendencies

NML_TEXT = """
! FV3 input.nml excerpt
&fv_core_nml
  npx = 49
  npy = 49
  npz = 79
  k_split = 2        ! remap loop
  n_split = 6
  do_sat_adj = .true.
  rf_fast = .F.
  tau = 10.d0
  dddmp = 0.2
  layout = 2, 2
/
&coupler_nml
  dt_atmos = 450
  days = 1
/
"""


def test_parse_namelist():
    groups = parse_namelist(NML_TEXT)
    fv = groups["fv_core_nml"]
    assert fv["npx"] == 49
    assert fv["k_split"] == 2
    assert fv["do_sat_adj"] is True
    assert fv["rf_fast"] is False
    assert fv["tau"] == 10.0
    assert fv["layout"] == [2, 2]
    assert groups["coupler_nml"]["dt_atmos"] == 450


def test_namelist_from_f90nml():
    nml = Namelist.from_f90nml(parse_namelist(NML_TEXT))
    assert nml.npx == 49
    assert nml.k_split == 2
    assert nml.layout == (2, 2)
    assert nml.dt_atmos == 450
    assert nml.days == 1
    kwargs = nml.dycore_config_kwargs()
    from pace_tpu.models.fv3.config import DynamicalCoreConfig

    cfg = DynamicalCoreConfig(**kwargs)
    assert cfg.n_split == 6 and cfg.dddmp == 0.2


def test_snapshot_checkpointer():
    cp = SnapshotCheckpointer()
    cp("sp1", a=np.ones(3))
    cp("sp1", a=2 * np.ones(3))
    assert len(cp.data["sp1"]["a"]) == 2
    np.testing.assert_array_equal(cp.data["sp1"]["a"][1], 2.0)


def test_threshold_calibration_and_validation():
    cal = ThresholdCalibrationCheckpointer(factor=2.0)
    rng = np.random.RandomState(0)
    base = rng.randn(4)
    for trial in range(3):
        with cal.trial():
            cal("sp", x=base + 1e-6 * rng.randn(4))
    thr = cal.thresholds
    assert thr.savepoints["sp"][0]["x"].absolute < 1e-4

    # round-trip thresholds through json
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "thr.json")
        thr.save(p)
        thr2 = type(thr).load(p)
    assert thr2.savepoints["sp"][0]["x"].absolute == \
        thr.savepoints["sp"][0]["x"].absolute

    val = ValidationCheckpointer(
        reference={"sp": [{"x": base}]}, thresholds=thr
    )
    val("sp", x=base + 1e-8)  # within thresholds
    val2 = ValidationCheckpointer(
        reference={"sp": [{"x": base}]}, thresholds=thr
    )
    with pytest.raises(AssertionError, match="sp"):
        val2("sp", x=base + 1.0)


def test_nudging():
    state = {"pt": np.full(4, 280.0)}
    ref = {"pt": np.full(4, 290.0)}
    from datetime import timedelta

    tend = get_nudging_tendencies(
        state, ref, {"pt": timedelta(seconds=100.0)}
    )
    np.testing.assert_allclose(tend["pt"], 0.1)
    new_state, _ = apply_nudging(
        state, ref, {"pt": timedelta(seconds=100.0)},
        timedelta(seconds=10.0),
    )
    np.testing.assert_allclose(new_state["pt"], 281.0)
    with pytest.raises(ValueError):
        apply_nudging(state, ref, {"nope": timedelta(seconds=1)}, 1.0)


def test_npz_monitor_roundtrip(tmp_path):
    mon = NpzMonitor(str(tmp_path / "series"))
    mon.store({"time": "t0", "a": np.arange(3)})
    mon.store({"time": "t1", "a": np.arange(3) + 1})
    times, states = NpzMonitor.read(str(tmp_path / "series"))
    assert times == ["t0", "t1"]
    np.testing.assert_array_equal(states[1]["a"], [1, 2, 3])


def test_state_io_roundtrip(tmp_path):
    p = str(tmp_path / "state.npz")
    write_state({"time": "2000-01-01", "pt": np.ones((2, 2))}, p)
    state = read_state(p)
    assert state["time"] == "2000-01-01"
    np.testing.assert_array_equal(state["pt"], 1.0)
    with pytest.raises(ValueError):
        write_state({"pt": np.ones(2)}, p)


def test_fastpack_roundtrip(tmp_path):
    from pace_tpu._native import (
        fastpack_available,
        read_npy,
        write_npy,
        write_state_npys,
    )

    rng = np.random.RandomState(1)
    a = rng.randn(3, 5).astype(np.float32)
    p = str(tmp_path / "a.npy")
    write_npy(p, a)
    np.testing.assert_array_equal(np.load(p), a)  # numpy-readable
    np.testing.assert_array_equal(read_npy(p), a)
    state = {"x": a, "y": rng.randn(4).astype(np.float64)}
    write_state_npys(str(tmp_path / "s"), state)
    for k, v in state.items():
        np.testing.assert_array_equal(
            np.load(str(tmp_path / "s" / f"{k}.npy")), v
        )


def test_restart_npy_roundtrip(tmp_path):
    from pace_tpu.driver.restart import load_restart_arrays, write_restart

    class FakeState:
        import dataclasses

    import dataclasses

    @dataclasses.dataclass
    class S:
        pt: np.ndarray
        delp: np.ndarray

    s = S(pt=np.ones((2, 3)), delp=np.full((2, 3), 5.0))
    write_restart(s, "2000-01-01", str(tmp_path / "R"))
    arrays = load_restart_arrays(str(tmp_path / "R"))
    np.testing.assert_array_equal(arrays["pt"], 1.0)
    np.testing.assert_array_equal(arrays["delp"], 5.0)


def test_functional_validation():
    from pace_tpu.utils.functional_validation import (
        get_set_nan_func,
        get_subset_func,
        selective_compare,
    )
    from pace_tpu.utils.gridtools import GridSizing

    sizing = GridSizing(12, 4)
    N = sizing.N
    data = np.arange(6 * N * N * 4, dtype=float).reshape(6, N, N, 4)
    subset = get_subset_func(sizing, ("x", "y", "z"))
    assert subset(data).shape == (6, 12, 12, 4)
    subset_u = get_subset_func(sizing, ("x", "y_interface", "z"))
    assert subset_u(data).shape == (6, 12, 13, 4)
    subset_h = get_subset_func(
        sizing, ("x", "y", "z"), n_halo=((1, 1), (1, 1))
    )
    assert subset_h(data).shape == (6, 14, 14, 4)

    set_nans = get_set_nan_func(sizing, ("x", "y", "z"))
    nulled = set_nans(data)
    assert np.isnan(nulled[:, 0, 0]).all()  # halo nulled
    assert np.isfinite(nulled[:, 3:15, 3:15]).all()  # interior kept

    # selective comparison ignores halo differences
    other = data.copy()
    other[:, 0, 0] += 999.0
    selective_compare(data, other, sizing)
    with pytest.raises(AssertionError):
        other2 = data.copy()
        other2[:, 5, 5] += 1.0
        selective_compare(data, other2, sizing)


def test_pair_debug():
    """Pair-debug compares a function under two shardings (here: tile
    mesh vs replicated, which is exact; see KNOWN_ISSUES for why
    inner-axis CPU meshes would fail this)."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh, PartitionSpec as P

    from pace_tpu.utils.pair_debug import (
        PairDebugMismatch,
        compare_under_shardings,
        mesh_placement,
        replicated,
    )

    devices = np.array(jax.devices()[:6]).reshape(6, 1, 1)
    mesh = Mesh(devices, ("tile", "x", "y"))

    def fn(x):
        return x * 2.0 + jnp.roll(x, 1, axis=1)

    x = jnp.arange(6 * 8 * 8 * 2, dtype=jnp.float32).reshape(6, 8, 8, 2)
    report = compare_under_shardings(
        fn, (x,), replicated, mesh_placement(mesh, P("tile", "x", "y"))
    )
    assert max(report.values()) == 0.0

    def bad_fn(x):
        # sharding-dependent result: device-count-scaled output
        return x + float(len(jax.devices()))

    # same function both ways -> equal; simulate a mismatch by comparing
    # two different functions through the shardings
    with pytest.raises(PairDebugMismatch):
        compare_under_shardings(
            lambda x: x, (x,), replicated,
            lambda args: tuple(a + 1.0 for a in args),
        )
