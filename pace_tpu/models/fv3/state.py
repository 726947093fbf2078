"""Prognostic/diagnostic state of the FV3 dynamical core, as a JAX pytree.

Mirrors the reference DycoreState
(ai2cm/pace fv3core/pace/fv3core/initialization/dycore_state.py:11): 30
fields with dims/units metadata.  Here each field is a raw jnp array in the
global padded layout (6, N, N[, nz]) so the whole state flows through
`jax.jit` / sharding untouched; metadata lives in `FIELD_METADATA`.

Unlike the reference (which pads every array to nz+1), vertical sizes are
exact: nz for layer quantities, nz+1 for interface quantities.
"""

from __future__ import annotations

import dataclasses
from typing import Dict

import jax
import jax.numpy as jnp

from pace_tpu.utils import constants
from pace_tpu.utils.gridtools import GridSizing

X = constants.X_DIM
XI = constants.X_INTERFACE_DIM
Y = constants.Y_DIM
YI = constants.Y_INTERFACE_DIM
Z = constants.Z_DIM
ZI = constants.Z_INTERFACE_DIM

# name -> (standard_name, dims, units)
FIELD_METADATA: Dict[str, tuple] = {
    "u": ("x_wind", (X, YI, Z), "m/s"),
    "v": ("y_wind", (XI, Y, Z), "m/s"),
    "w": ("vertical_wind", (X, Y, Z), "m/s"),
    "ua": ("eastward_wind", (X, Y, Z), "m/s"),
    "va": ("northward_wind", (X, Y, Z), "m/s"),
    "uc": ("x_wind_on_c_grid", (XI, Y, Z), "m/s"),
    "vc": ("y_wind_on_c_grid", (X, YI, Z), "m/s"),
    "delp": ("pressure_thickness_of_atmospheric_layer", (X, Y, Z), "Pa"),
    "delz": ("vertical_thickness_of_atmospheric_layer", (X, Y, Z), "m"),
    "ps": ("surface_pressure", (X, Y), "Pa"),
    "pe": ("interface_pressure", (X, Y, ZI), "Pa"),
    "pt": ("air_temperature", (X, Y, Z), "degK"),
    "peln": ("logarithm_of_interface_pressure", (X, Y, ZI), "ln(Pa)"),
    "pk": ("interface_pressure_raised_to_power_of_kappa", (X, Y, ZI), "unknown"),
    "pkz": ("layer_mean_pressure_raised_to_power_of_kappa", (X, Y, Z), "unknown"),
    "qvapor": ("specific_humidity", (X, Y, Z), "kg/kg"),
    "qliquid": ("cloud_water_mixing_ratio", (X, Y, Z), "kg/kg"),
    "qice": ("cloud_ice_mixing_ratio", (X, Y, Z), "kg/kg"),
    "qrain": ("rain_mixing_ratio", (X, Y, Z), "kg/kg"),
    "qsnow": ("snow_mixing_ratio", (X, Y, Z), "kg/kg"),
    "qgraupel": ("graupel_mixing_ratio", (X, Y, Z), "kg/kg"),
    "qo3mr": ("ozone_mixing_ratio", (X, Y, Z), "kg/kg"),
    "qsgs_tke": ("turbulent_kinetic_energy", (X, Y, Z), "m**2/s**2"),
    "qcld": ("cloud_fraction", (X, Y, Z), ""),
    "q_con": ("total_condensate_mixing_ratio", (X, Y, Z), "kg/kg"),
    "omga": ("vertical_pressure_velocity", (X, Y, Z), "Pa/s"),
    "mfxd": ("accumulated_x_mass_flux", (XI, Y, Z), "unknown"),
    "mfyd": ("accumulated_y_mass_flux", (X, YI, Z), "unknown"),
    "cxd": ("accumulated_x_courant_number", (XI, Y, Z), "unknown"),
    "cyd": ("accumulated_y_courant_number", (X, YI, Z), "unknown"),
    "diss_estd": (
        "dissipation_estimate_from_heat_source", (X, Y, Z), "unknown"
    ),
    "phis": ("surface_geopotential", (X, Y), "m**2 s**-2"),
}

# the advected tracers, in the order the reference's tracer-advection
# loops over them (dsl/pace/dsl/gt4py_utils.py:24 tracer_variables)
TRACER_NAMES = (
    "qvapor", "qliquid", "qrain", "qice", "qsnow", "qgraupel", "qo3mr",
    "qsgs_tke", "qcld",
)
NQ = 8  # number of tracers advected by tracer_2d_1l (excludes qcld... see
# reference fv_dynamics.py: NQ=8 advected in dyn, 9 remapped)


def _field(name):
    return dataclasses.field(metadata=dict(info=FIELD_METADATA[name]))


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class DycoreState:
    u: jnp.ndarray
    v: jnp.ndarray
    w: jnp.ndarray
    ua: jnp.ndarray
    va: jnp.ndarray
    uc: jnp.ndarray
    vc: jnp.ndarray
    delp: jnp.ndarray
    delz: jnp.ndarray
    ps: jnp.ndarray
    pe: jnp.ndarray
    pt: jnp.ndarray
    peln: jnp.ndarray
    pk: jnp.ndarray
    pkz: jnp.ndarray
    qvapor: jnp.ndarray
    qliquid: jnp.ndarray
    qice: jnp.ndarray
    qrain: jnp.ndarray
    qsnow: jnp.ndarray
    qgraupel: jnp.ndarray
    qo3mr: jnp.ndarray
    qsgs_tke: jnp.ndarray
    qcld: jnp.ndarray
    q_con: jnp.ndarray
    omga: jnp.ndarray
    mfxd: jnp.ndarray
    mfyd: jnp.ndarray
    cxd: jnp.ndarray
    cyd: jnp.ndarray
    diss_estd: jnp.ndarray
    phis: jnp.ndarray

    @classmethod
    def init_zeros(cls, sizing: GridSizing, dtype=jnp.float32) -> "DycoreState":
        kw = {}
        for name, (_, dims, _) in FIELD_METADATA.items():
            shape = [constants.N_TILES, sizing.N, sizing.N]
            if dims[-1] == Z:
                shape.append(sizing.nz)
            elif dims[-1] == ZI:
                shape.append(sizing.nz + 1)
            kw[name] = jnp.zeros(tuple(shape), dtype)
        return cls(**kw)

    @classmethod
    def from_numpy(cls, arrays: dict, dtype=jnp.float32) -> "DycoreState":
        kw = {
            name: jnp.asarray(arrays[name], dtype) for name in FIELD_METADATA
        }
        return cls(**kw)

    def replace(self, **kwargs) -> "DycoreState":
        return dataclasses.replace(self, **kwargs)

    def tracers(self, names=TRACER_NAMES):
        return {name: getattr(self, name) for name in names}
