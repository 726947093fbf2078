"""Diagnostics output.

Port of ai2cm/pace driver/pace/driver/diagnostics.py (DiagnosticsConfig,
Diagnostics, ZSelect): saves selected state variables at a configurable
frequency.  Output format is npz (one file per output time) — the image
has no zarr/netCDF4/xarray, and npz round-trips losslessly.
"""

from __future__ import annotations

import dataclasses
import os
from typing import List, Optional

import jax
import numpy as np


@dataclasses.dataclass
class ZSelect:
    level: int
    names: List[str]


@dataclasses.dataclass
class DiagnosticsConfig:
    """
    Attributes:
        path: directory to save diagnostics into; no diagnostics are stored
            if unset
        output_format: "npz" or "netcdf" (NetCDF3 64-bit-offset via scipy,
            chunked time-series files as in the reference NetCDFMonitor)
        names: state variables to save
        derived_names: derived diagnostics to save; supported:
            column_integrated_<tracer> (kg/m**2, reference
            driver/pace/driver/diagnostics.py:227-252)
        z_select: save a vertical slice of a 3D state
        output_initial_state: save the state before the first step
        output_frequency: timesteps between outputs
    """

    path: Optional[str] = None
    output_format: str = "npz"
    names: List[str] = dataclasses.field(default_factory=list)
    derived_names: List[str] = dataclasses.field(default_factory=list)
    z_select: List[ZSelect] = dataclasses.field(default_factory=list)
    output_initial_state: bool = False
    output_frequency: int = 1

    def __post_init__(self):
        if (self.names or self.derived_names) and self.path is None:
            raise ValueError(
                "DiagnosticsConfig.path must be given to enable diagnostics"
            )
        if self.output_format not in ("npz", "netcdf", "zarr"):
            raise ValueError(
                "output_format must be 'npz', 'netcdf' or 'zarr', "
                f"got {self.output_format}"
            )
        for name in self.derived_names:
            if not name.startswith("column_integrated_"):
                raise ValueError(
                    f"unsupported derived diagnostic {name!r}; supported: "
                    "column_integrated_<tracer>"
                )
            # fail at config time, not hours into the run at the first
            # output boundary
            from pace_tpu.models.fv3.state import DycoreState

            tracer = name[len("column_integrated_"):]
            fields = {f.name for f in dataclasses.fields(DycoreState)}
            if tracer not in fields:
                raise ValueError(
                    f"derived diagnostic {name!r} references unknown "
                    f"tracer {tracer!r} (not a DycoreState field)"
                )

    def diagnostics_factory(self, sizing=None) -> "Diagnostics":
        if self.path is None:
            return NullDiagnostics()
        if self.output_format == "netcdf":
            return NetCDFDiagnostics(self, sizing)
        if self.output_format == "zarr":
            return ZarrDiagnostics(self, sizing)
        return NpzDiagnostics(self, sizing)


class Diagnostics:
    def store(self, time, state):
        raise NotImplementedError

    def store_grid(self, grid_data):
        raise NotImplementedError

    def cleanup(self):
        pass


class NullDiagnostics(Diagnostics):
    def store(self, time, state):
        pass

    def store_grid(self, grid_data):
        pass


class NpzDiagnostics(Diagnostics):
    def __init__(self, config: DiagnosticsConfig, sizing=None):
        self.config = config
        self.sizing = sizing
        os.makedirs(config.path, exist_ok=True)
        self._index = 0

    def _compute_domain(self, arr, name=None):
        """Slice off the halo+padding: users get exactly the compute
        domain — n cells, or n+1 points on a staggered (interface) axis,
        determined from the state's dims metadata."""
        if self.sizing is None or arr.ndim < 3:
            return arr
        h, n = self.sizing.halo, self.sizing.n
        ni = nj = n
        try:
            from pace_tpu.models.fv3.state import FIELD_METADATA

            dims = FIELD_METADATA[name][1]
            if "x_interface" in dims[0]:
                ni = n + 1
            if "y_interface" in dims[1]:
                nj = n + 1
        except (KeyError, ImportError, TypeError):
            pass
        return arr[:, h:h + ni, h:h + nj]

    def _collect(self, state):
        """Gather the configured (and derived) variables, halo-stripped."""
        out = {}
        for name in self.config.names:
            arr = np.asarray(jax.device_get(getattr(state, name)))
            out[name] = self._compute_domain(arr, name)
        for name in self.config.derived_names:
            tracer = name[len("column_integrated_"):]
            out[name] = self._compute_domain(
                _column_integral(
                    getattr(state, tracer), state.delp
                ),
                tracer,
            )
        for zs in self.config.z_select:
            for name in zs.names:
                arr = np.asarray(jax.device_get(getattr(state, name)))
                out[f"{name}_z{zs.level}"] = self._compute_domain(
                    arr[..., zs.level], name
                )
        return out

    def store(self, time, state):
        out = self._collect(state)
        if time is not None:
            out["time"] = np.asarray(str(time))
        fname = os.path.join(
            self.config.path, f"state_{self._index:06d}.npz"
        )
        np.savez(fname, **out)
        self._index += 1

    def store_grid(self, grid_data):
        hz = grid_data.horizontal
        np.savez(
            os.path.join(self.config.path, "grid.npz"),
            lon=np.asarray(jax.device_get(hz.lon)),
            lat=np.asarray(jax.device_get(hz.lat)),
            lon_agrid=np.asarray(jax.device_get(hz.lon_agrid)),
            lat_agrid=np.asarray(jax.device_get(hz.lat_agrid)),
            area=np.asarray(jax.device_get(hz.area)),
        )


def _column_integral(q, delp) -> np.ndarray:
    """Column-integrated tracer path in kg/m**2: sum_k q*delp / g
    (reference driver/pace/driver/diagnostics.py:227-252)."""
    from pace_tpu.utils.constants import GRAV

    q = np.asarray(jax.device_get(q))
    delp = np.asarray(jax.device_get(delp))
    return (q * delp).sum(axis=-1) / GRAV


class NetCDFDiagnostics(NpzDiagnostics):
    """Diagnostics through the chunked NetCDF3 time-series monitor
    (reference monitor/netcdf_monitor.py:104); shares variable collection
    (incl. derived and z-select) with the npz path."""

    def __init__(self, config: DiagnosticsConfig, sizing=None):
        from pace_tpu.utils.netcdf import NetCDFMonitor

        super().__init__(config, sizing)
        self._monitor = NetCDFMonitor(config.path)

    def store(self, time, state):
        out = self._collect(state)
        out["time"] = time
        self._monitor.store(out)

    def store_grid(self, grid_data):
        from pace_tpu.utils.netcdf import write_dataset

        hz = grid_data.horizontal
        write_dataset(
            os.path.join(self.config.path, "grid.nc"),
            {
                name: np.asarray(jax.device_get(getattr(hz, name)))
                for name in ("lon", "lat", "lon_agrid", "lat_agrid", "area")
            },
        )

    def cleanup(self):
        self._monitor.cleanup()


class ZarrDiagnostics(NpzDiagnostics):
    """Diagnostics into a Zarr v2 store (dependency-free writer,
    utils/zarrlite.py; reference monitor/zarr_monitor.py:37 layout:
    one (time, tile, x, y[, z]) array per variable)."""

    def __init__(self, config: DiagnosticsConfig, sizing=None):
        from pace_tpu.utils.zarrlite import ZarrMonitor

        super().__init__(config, sizing)
        self._monitor = ZarrMonitor(os.path.join(config.path, "state.zarr"))

    def store(self, time, state):
        out = self._collect(state)
        out["time"] = time
        self._monitor.store(out)

    def store_grid(self, grid_data):
        from pace_tpu.utils.zarrlite import ZarrMonitor

        hz = grid_data.horizontal
        grid_store = ZarrMonitor(os.path.join(self.config.path, "grid.zarr"))
        grid_store.store({
            name: np.asarray(jax.device_get(getattr(hz, name)))
            for name in ("lon", "lat", "lon_agrid", "lat_agrid", "area")
        })
