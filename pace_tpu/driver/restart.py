"""Restart save/load.

Port of the reference's RestartConfig / Restart (driver/pace/driver/
driver.py:198-240 and util restart IO), using npz for the state payload.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Optional

import jax
import numpy as np


@dataclasses.dataclass
class RestartConfig:
    save_restart: bool = False
    intermediate_restart: list = dataclasses.field(default_factory=list)
    path: str = "RESTART"
    # "npz" (native fastpack/npy payload) or "netcdf" (NetCDF3 interop,
    # reference util/pace/util/io.py:11 write_state)
    format: str = "npz"

    def __post_init__(self):
        if self.format not in ("npz", "netcdf"):
            raise ValueError(
                f"restart format must be 'npz' or 'netcdf', got {self.format}"
            )

    def write_final_if_enabled(self, state, time, path: Optional[str] = None):
        if self.save_restart:
            write_restart(
                state.dycore_state, time, path or self.path, self.format
            )

    def write_intermediate_if_enabled(self, state, step: int, time):
        if step in self.intermediate_restart:
            write_restart(
                state.dycore_state, time,
                os.path.join(self.path, f"step_{step:06d}"), self.format,
            )


def write_restart(dycore_state, time, path: str, format: str = "npz"):
    import dataclasses as dc

    os.makedirs(path, exist_ok=True)
    arrays = {
        f.name: np.asarray(jax.device_get(getattr(dycore_state, f.name)))
        for f in dc.fields(dycore_state)
    }
    if format == "netcdf":
        from pace_tpu.utils.netcdf import write_dataset

        write_dataset(
            os.path.join(path, "dycore_state.nc"), arrays,
            attrs={"time": str(time) if time else ""},
        )
        with open(os.path.join(path, "time.json"), "w") as f:
            json.dump({"time": str(time) if time else None}, f)
        return
    try:
        # native threaded writer (pace_tpu/_native/fastpack.cpp)
        from pace_tpu._native import fastpack_available, write_state_npys

        if fastpack_available():
            write_state_npys(
                os.path.join(path, "dycore_state"), arrays, n_threads=4
            )
        else:
            raise ImportError
    except Exception:
        np.savez(os.path.join(path, "dycore_state.npz"), **arrays)
    with open(os.path.join(path, "time.json"), "w") as f:
        json.dump({"time": str(time) if time else None}, f)


def load_restart_arrays(path: str) -> dict:
    nc_path = os.path.join(path, "dycore_state.nc")
    if os.path.exists(nc_path):
        from pace_tpu.utils.netcdf import read_dataset

        return read_dataset(nc_path)
    npy_dir = os.path.join(path, "dycore_state")
    if os.path.isdir(npy_dir):
        from pace_tpu._native import read_npy

        return {
            fname[:-4]: read_npy(os.path.join(npy_dir, fname))
            for fname in sorted(os.listdir(npy_dir))
            if fname.endswith(".npy")
        }
    data = np.load(os.path.join(path, "dycore_state.npz"))
    return {k: data[k] for k in data.files}
