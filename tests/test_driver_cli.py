"""End-to-end CLI smoke test: yaml -> Driver -> step loop -> outputs.

The reference covers this path with driver/tests (TestDriver /
test_driver.py: config hydration, main loop, diagnostics and restart
output, cleanup-on-exit).  Here `pace_tpu.driver.run.main` runs a
2-step C12 baroclinic dycore from a yaml file and every driver-owned
artifact is checked: npz diagnostics, perf JSON (SYPD), and the
intermediate restart written by the try/finally cleanup path.
"""

import json
import os

import numpy as np
import pytest
import yaml


def _config(tmp_path):
    return {
        "nx_tile": 12,
        "nz": 79,
        "dt_atmos": 225,
        "seconds": 450,  # 2 steps
        "dtype": "float32",
        "initialization": {"type": "baroclinic"},
        "dycore_config": {
            "do_sat_adj": False,
            "n_split": 1,
            "k_split": 1,
        },
        "performance_config": {
            "performance_mode": True,
            "experiment_name": "cli_smoke",
        },
        "diagnostics_config": {
            "path": str(tmp_path / "output"),
            "names": ["ua", "va", "pt", "ps"],
            "derived_names": ["column_integrated_qvapor"],
            "output_frequency": 1,
            "output_initial_state": True,
        },
        "restart_config": {
            "save_restart": True,
            "path": str(tmp_path / "RESTART"),
        },
        "safety_check_frequency": 2,
    }


def test_cli_two_steps(tmp_path, monkeypatch):
    from pace_tpu.driver.run import main

    cfg = _config(tmp_path)
    cfg_path = tmp_path / "config.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))

    monkeypatch.chdir(tmp_path)  # perf JSON is written to CWD
    rc = main([str(cfg_path), "--log-level", "WARNING"])
    assert rc == 0

    # diagnostics: initial state + 2 steps at frequency 1
    out_files = sorted(os.listdir(tmp_path / "output"))
    assert len(out_files) >= 2, out_files
    first = np.load(tmp_path / "output" / out_files[-1])
    for name in ("ua", "va", "pt", "ps", "column_integrated_qvapor"):
        assert name in first.files, (name, first.files)
        assert np.isfinite(first[name]).all(), name

    # perf JSON with an SYPD number (reference performance/report.py)
    perf_path = tmp_path / "cli_smoke_perf.json"
    assert perf_path.exists(), "no perf JSON written"
    report = json.loads(perf_path.read_text())
    assert report.get("sypd", 0.0) > 0.0

    # restart written by cleanup (resumable state)
    restart_dir = tmp_path / "RESTART"
    assert restart_dir.exists() and os.listdir(restart_dir)


def test_sectioned_perf_report(tmp_path, monkeypatch):
    """performance_config.sections: true splits the step into DynCore /
    TracerAdvection / Remapping jits and reports each section per step —
    the reference's per-section timers (ai2cm/pace
    driver/pace/driver/performance/collector.py:60-153,
    fv_dynamics.py:497-610 timer sections)."""
    from pace_tpu.driver.run import main

    cfg = _config(tmp_path)
    cfg["performance_config"] = {
        "performance_mode": True,
        "experiment_name": "sectioned",
        "sections": True,
    }
    cfg["dycore_config"]["k_split"] = 2  # sections accumulate over k_split
    cfg_path = tmp_path / "config.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))

    monkeypatch.chdir(tmp_path)
    rc = main([str(cfg_path), "--log-level", "WARNING"])
    assert rc == 0

    report = json.loads((tmp_path / "sectioned_perf.json").read_text())
    steps = report["times_per_step"]
    assert len(steps) == 2
    for step in steps:
        for key in ("mainloop", "DynCore", "TracerAdvection", "Remapping"):
            assert key in step, (key, sorted(step))
            assert step[key] > 0.0
        # the sections are disjoint sub-intervals of the step
        assert (step["DynCore"] + step["TracerAdvection"]
                + step["Remapping"]) <= step["mainloop"] * 1.05

    # sectioned mode must not change the numerics: diagnostics finite
    out_files = sorted(os.listdir(tmp_path / "output"))
    last = np.load(tmp_path / "output" / out_files[-1])
    for name in ("ua", "pt", "ps"):
        assert np.isfinite(last[name]).all(), name
