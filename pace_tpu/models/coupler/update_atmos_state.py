"""Dycore <-> physics coupling.

jnp port of ai2cm/pace stencils/pace/stencils/update_atmos_state.py:
`DycoreToPhysics` (copy_dycore_to_physics) and `UpdateAtmosphereState`
(fill_gfs_delp, prepare_tendencies_and_update_tracers +
ApplyPhysicsToDycore).

Whole-tile global-view note: physics columns are independent, so the
physics runs over the full padded (6, N, N, nz) arrays.  Padded columns
(outside the active n x n region) carry zeros from initialization, which
would produce 0/0; DycoreToPhysics substitutes a benign reference column
there, and UpdateAtmosphereState masks all writes back to the interior.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from pace_tpu.models.coupler.fv_update_phys import apply_physics_to_dycore
from pace_tpu.models.physics.physics_state import PhysicsState


def interior_mask(N: int, n: int, h: int):
    """(1, N, N, 1) mask of the active cell-center columns."""
    idx = np.arange(N)
    cells = (idx >= h) & (idx < h + n)
    return jnp.asarray(cells[:, None] & cells[None, :]).reshape(1, N, N, 1)


def fill_gfs_delp(delp, q, q_min: float):
    """Vertical borrowing to enforce q >= q_min (reference
    update_atmos_state.py:20-37 fill_gfs_delp; only q is modified)."""
    nz = q.shape[-1]

    # backward pass: if q[k+1] < q_min, borrow from q[k] (descending k,
    # using the already-updated q[k+1])
    def bwd(carry, x):
        q_below, dp_below = carry
        q_k, dp_k = x
        q_new = q_k + jnp.where(
            q_below < q_min, (q_below - q_min) * dp_below / dp_k, 0.0
        )
        return (q_new, dp_k), q_new

    xs = tuple(
        jnp.moveaxis(a[..., ::-1], -1, 0)
        for a in (q[..., :-1], delp[..., :-1])
    )
    _, ys = lax.scan(bwd, (q[..., -1], delp[..., -1]), xs)
    q = jnp.concatenate(
        [jnp.moveaxis(ys, 0, -1)[..., ::-1], q[..., -1:]], -1
    )

    # clamp all but the top level to q_min
    q = jnp.concatenate(
        [q[..., :1], jnp.maximum(q[..., 1:], q_min)], -1
    )

    # forward pass: propagate any remaining negative mass downward
    def fwd(carry, x):
        q_above, dp_above = carry
        q_k, dp_k = x
        q_new = q_k + jnp.where(
            q_above < 0.0, q_above * dp_above / dp_k, 0.0
        )
        return (q_new, dp_k), q_new

    xs = tuple(jnp.moveaxis(a, -1, 0) for a in (q[..., 1:], delp[..., 1:]))
    _, ys = lax.scan(fwd, (q[..., 0], delp[..., 0]), xs)
    q = jnp.concatenate([q[..., :1], jnp.moveaxis(ys, 0, -1)], -1)
    return jnp.maximum(q, 0.0)


def prepare_tendencies_and_update_tracers(
    u_dt, v_dt, pt_dt, phy: PhysicsState, dyc: dict, rdt: float,
):
    """Gather wind/temperature tendencies and convert the GFS-updated
    tracers back to FV3 (total-mass) mixing ratios, adjusting delp
    (reference update_atmos_state.py:40-94).  Returns
    (u_dt, v_dt, pt_dt, new_tracers dict, new_delp)."""
    u_dt = u_dt + (phy.physics_updated_ua - phy.ua) * rdt
    v_dt = v_dt + (phy.physics_updated_va - phy.va) * rdt
    pt_dt = pt_dt + (phy.physics_updated_pt - phy.pt) * rdt
    dp = phy.prsi[..., 1:] - phy.prsi[..., :-1]
    qwat = {
        "qvapor": dp * phy.physics_updated_specific_humidity,
        "qliquid": dp * phy.physics_updated_qliquid,
        "qrain": dp * phy.physics_updated_qrain,
        "qsnow": dp * phy.physics_updated_qsnow,
        "qice": dp * phy.physics_updated_qice,
        "qgraupel": dp * phy.physics_updated_qgraupel,
    }
    qt = sum(qwat.values())
    q_sum = (
        dyc["qvapor"] + dyc["qliquid"] + dyc["qrain"] + dyc["qsnow"]
        + dyc["qice"] + dyc["qgraupel"]
    )
    q0 = dyc["delp"] * (1.0 - q_sum) + qt
    new_tracers = {name: w / q0 for name, w in qwat.items()}
    return u_dt, v_dt, pt_dt, new_tracers, q0


class DycoreToPhysics:
    """Copies dycore prognostics into a PhysicsState (reference
    DycoreToPhysics, update_atmos_state.py:151-233).  When
    do_dry_convective_adjust is set, runs fv_subgridz first via
    `dry_convective_adjust` (call it before this; the reference gates it
    on fv_sg_adj > 0)."""

    def __init__(self, sizing, dtype=jnp.float32, dycore_only=False):
        self.sizing = sizing
        self.dycore_only = dycore_only
        self._mask = interior_mask(sizing.N, sizing.n, sizing.halo)
        self.dtype = dtype

    def __call__(self, dycore_state, land=None) -> PhysicsState:
        s = dycore_state
        m = self._mask

        def safe(x, fill):
            return jnp.where(m, x, jnp.asarray(fill, x.dtype))

        shape3 = s.pt.shape
        phys = PhysicsState.init_zeros(shape3, dtype=s.pt.dtype)
        import dataclasses

        return dataclasses.replace(
            phys,
            qvapor=safe(s.qvapor, 0.0), qliquid=safe(s.qliquid, 0.0),
            qrain=safe(s.qrain, 0.0), qice=safe(s.qice, 0.0),
            qsnow=safe(s.qsnow, 0.0), qgraupel=safe(s.qgraupel, 0.0),
            qo3mr=safe(s.qo3mr, 0.0), qsgs_tke=safe(s.qsgs_tke, 0.0),
            qcld=safe(s.qcld, 0.0), pt=safe(s.pt, 273.0),
            delp=safe(s.delp, 1.0e3), delz=safe(s.delz, -100.0),
            ua=safe(s.ua, 0.0), va=safe(s.va, 0.0), w=safe(s.w, 0.0),
            omga=safe(s.omga, 0.0),
            land=(land if land is not None
                  else jnp.zeros(shape3[:-1], s.pt.dtype)),
        )


class UpdateAtmosphereState:
    """Applies physics tendencies and rebuilds a consistent prognostic
    state (reference UpdateAtmosphereState, update_atmos_state.py:235-349;
    Fortran atmosphere_state_update)."""

    def __init__(self, grid_data, topo, sizing, timestep: float,
                 c2l_order: int = 4, dycore_only: bool = False,
                 apply_tendencies: bool = True):
        self.gd = grid_data
        self.topo = topo
        self.sizing = sizing
        self.timestep = timestep
        self.c2l_order = c2l_order
        self.dycore_only = dycore_only
        self.apply_tendencies = apply_tendencies
        self._rdt = 1.0 / timestep
        self._mask = interior_mask(sizing.N, sizing.n, sizing.halo)

    def __call__(self, dycore_state, phy_state: PhysicsState,
                 u_dt0=None, v_dt0=None, pt_dt0=None):
        """Returns the updated DycoreState.  u_dt0/v_dt0/pt_dt0 seed the
        tendency accumulators (e.g. from fv_subgridz)."""
        import dataclasses

        s = {
            f.name: getattr(dycore_state, f.name)
            for f in dataclasses.fields(dycore_state)
        }
        n, h = self.sizing.n, self.sizing.halo
        m = self._mask
        if self.dycore_only:
            s["qvapor"] = jnp.where(
                m, fill_gfs_delp(s["delp"], s["qvapor"], 1.0e-9),
                s["qvapor"],
            )
            return dataclasses.replace(dycore_state, qvapor=s["qvapor"])

        qv_up = fill_gfs_delp(
            s["delp"], phy_state.physics_updated_specific_humidity, 1.0e-9
        )
        phy_state = dataclasses.replace(
            phy_state, physics_updated_specific_humidity=qv_up
        )
        u_dt = u_dt0 if u_dt0 is not None else jnp.zeros_like(s["pt"])
        v_dt = v_dt0 if v_dt0 is not None else jnp.zeros_like(s["pt"])
        pt_dt = pt_dt0 if pt_dt0 is not None else jnp.zeros_like(s["pt"])
        u_dt, v_dt, pt_dt, new_tracers, new_delp = (
            prepare_tendencies_and_update_tracers(
                u_dt, v_dt, pt_dt, phy_state, s, self._rdt
            )
        )
        # all writes masked to the interior (padded physics columns are
        # synthetic; see module docstring)
        for name, val in new_tracers.items():
            s[name] = jnp.where(m, val, s[name])
        s["delp"] = jnp.where(m, new_delp, s["delp"])
        u_dt = jnp.where(m, u_dt, 0.0)
        v_dt = jnp.where(m, v_dt, 0.0)
        pt_dt = jnp.where(m, pt_dt, 0.0)

        if self.apply_tendencies:
            s, u_srf, v_srf = apply_physics_to_dycore(
                s, u_dt, v_dt, pt_dt, self.gd, self.topo, n, h,
                self.c2l_order, self.timestep,
            )
        return type(dycore_state)(**s)
