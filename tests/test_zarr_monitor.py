"""Zarr v2 monitor round trip (reference ZarrMonitor analogue,
utils/zarrlite.py — dependency-free v2 store writer)."""

import json
import os

import numpy as np

from pace_tpu.utils.zarrlite import ZarrMonitor, read_zarr_array


def test_zarr_store_roundtrip(tmp_path):
    store = str(tmp_path / "state.zarr")
    mon = ZarrMonitor(store)
    rng = np.random.RandomState(5)
    frames = []
    for t in range(3):
        state = {
            "time": f"2000-01-01T0{t}:00:00",
            "pt": rng.randn(6, 12, 12, 7).astype(np.float32),
            "ps": rng.randn(6, 12, 12).astype(np.float64),
        }
        frames.append(state)
        mon.store(state)
    mon.cleanup()

    # store layout: zarr v2 group with one array dir per variable
    assert json.load(open(os.path.join(store, ".zgroup")))["zarr_format"] == 2
    meta = json.load(open(os.path.join(store, "pt", ".zarray")))
    assert meta["shape"] == [3, 6, 12, 12, 7]
    assert meta["chunks"] == [1, 1, 12, 12, 7]
    assert meta["compressor"] is None
    attrs = json.load(open(os.path.join(store, "pt", ".zattrs")))
    assert attrs["_ARRAY_DIMENSIONS"][:2] == ["time", "tile"]

    pt = read_zarr_array(os.path.join(store, "pt"))
    for t in range(3):
        np.testing.assert_array_equal(pt[t], frames[t]["pt"])
    ps = read_zarr_array(os.path.join(store, "ps"))
    np.testing.assert_array_equal(ps[2], frames[2]["ps"])


def test_zarr_diagnostics_config():
    from pace_tpu.driver.diagnostics import DiagnosticsConfig

    cfg = DiagnosticsConfig(path="/tmp/x", output_format="zarr",
                            names=["pt"])
    assert cfg.output_format == "zarr"
