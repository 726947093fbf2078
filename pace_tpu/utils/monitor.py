"""Time-appending model output monitors and state I/O.

Port of ai2cm/pace util/pace/util/monitor/ (ZarrMonitor / NetCDFMonitor)
and util/pace/util/io.py (write_state / read_state), using npz storage
(one file per store call, an index json for the series) since the image
has no zarr/netCDF4/xarray.
"""

from __future__ import annotations

import json
import os
from typing import Optional

import jax
import numpy as np


from pace_tpu.utils.netcdf import (  # noqa: F401  (re-export: interop path)
    NetCDFMonitor,
    read_state as read_state_netcdf,
    write_state as write_state_netcdf,
)


class Monitor:
    def store(self, state: dict) -> None:
        raise NotImplementedError

    def cleanup(self):
        pass


class DummyMonitor(Monitor):
    def store(self, state: dict) -> None:
        pass


class NpzMonitor(Monitor):
    """Appends states to a time series directory: one npz per call plus an
    index.json with times and filenames."""

    def __init__(self, path: str):
        self.path = path
        os.makedirs(path, exist_ok=True)
        self._times = []
        self._files = []

    def store(self, state: dict) -> None:
        index = len(self._files)
        fname = f"step_{index:06d}.npz"
        arrays = {}
        time = None
        for name, value in state.items():
            if name == "time":
                time = value
                continue
            arrays[name] = np.asarray(jax.device_get(value))
        np.savez(os.path.join(self.path, fname), **arrays)
        self._times.append(str(time) if time is not None else None)
        self._files.append(fname)
        self._write_index()

    def _write_index(self):
        with open(os.path.join(self.path, "index.json"), "w") as f:
            json.dump({"times": self._times, "files": self._files}, f)

    @classmethod
    def read(cls, path: str):
        """Returns (times, list of {name: array} dicts)."""
        with open(os.path.join(path, "index.json")) as f:
            index = json.load(f)
        states = []
        for fname in index["files"]:
            data = np.load(os.path.join(path, fname))
            states.append({k: data[k] for k in data.files})
        return index["times"], states


def write_state(state: dict, filename: str) -> None:
    """Write a model state dict (must include 'time') to one npz file
    (reference io.py:11-38)."""
    if "time" not in state:
        raise ValueError('state must include a value for "time"')
    arrays = {
        name: np.asarray(jax.device_get(value))
        for name, value in state.items() if name != "time"
    }
    arrays["__time__"] = np.asarray(str(state["time"]))
    np.savez(filename, **arrays)


def read_state(filename: str) -> dict:
    """Read a model state written by write_state (reference io.py:40-60)."""
    data = np.load(filename)
    state = {}
    for name in data.files:
        if name == "__time__":
            state["time"] = str(data[name])
        else:
            state[name] = data[name]
    return state
