"""Physics state container.

jnp port of ai2cm/pace physics/pace/physics/physics_state.py `PhysicsState`:
a registered-dataclass pytree of plain arrays (shape (..., nz) for 3D
fields, (...,) for 2D) instead of Quantity storages.  `physics_updated_*`
fields hold the forward-Euler-updated values the coupler consumes.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class PhysicsState:
    qvapor: jnp.ndarray
    qliquid: jnp.ndarray
    qrain: jnp.ndarray
    qice: jnp.ndarray
    qsnow: jnp.ndarray
    qgraupel: jnp.ndarray
    qo3mr: jnp.ndarray
    qsgs_tke: jnp.ndarray
    qcld: jnp.ndarray
    pt: jnp.ndarray
    delp: jnp.ndarray
    delz: jnp.ndarray
    ua: jnp.ndarray
    va: jnp.ndarray
    w: jnp.ndarray
    omga: jnp.ndarray
    # physics-updated prognostics (reference physics_state.py:137-260)
    physics_updated_specific_humidity: jnp.ndarray
    physics_updated_qliquid: jnp.ndarray
    physics_updated_qrain: jnp.ndarray
    physics_updated_qice: jnp.ndarray
    physics_updated_qsnow: jnp.ndarray
    physics_updated_qgraupel: jnp.ndarray
    physics_updated_cloud_fraction: jnp.ndarray
    physics_updated_pt: jnp.ndarray
    physics_updated_ua: jnp.ndarray
    physics_updated_va: jnp.ndarray
    # diagnostic/auxiliary (reference physics_state.py:260-330)
    delprsi: jnp.ndarray  # GFS-mass layer thickness
    phii: jnp.ndarray  # interface geopotential, (..., nz+1)
    phil: jnp.ndarray  # layer geopotential
    dz: jnp.ndarray
    wmp: jnp.ndarray
    prsi: jnp.ndarray  # interface pressure, (..., nz+1)
    prsik: jnp.ndarray  # log/exner hybrid per reference statein
    land: jnp.ndarray  # 2D land fraction

    @classmethod
    def init_zeros(cls, shape3, dtype=jnp.float32):
        """shape3 = (..., nz)."""
        nz = shape3[-1]
        shape2 = shape3[:-1]
        shapei = shape2 + (nz + 1,)
        z3 = jnp.zeros(shape3, dtype)
        zi = jnp.zeros(shapei, dtype)
        z2 = jnp.zeros(shape2, dtype)
        kwargs = {}
        for f in dataclasses.fields(cls):
            if f.name in ("phii", "prsi"):
                kwargs[f.name] = zi
            elif f.name == "land":
                kwargs[f.name] = z2
            else:
                kwargs[f.name] = z3
        return cls(**kwargs)
