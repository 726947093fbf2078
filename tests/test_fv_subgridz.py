"""Dry convective adjustment (fv_subgridz): conservation and mixing."""

import jax.numpy as jnp
import numpy as np
import pytest

from pace_tpu.ops.fv_subgridz import TRACERS, dry_convective_adjustment
from pace_tpu.utils import constants as con

NZ = 30
KBOT = 24


def _make_state(unstable=True, nx=3, ny=2):
    shape = (nx, ny, NZ)
    p_mid = np.linspace(1.0e3, 9.5e4, NZ)
    dp = np.gradient(p_mid)
    if unstable:
        # potential temperature DECREASING with height in the sponge:
        # warm air under cold air -> convectively unstable
        theta = np.linspace(340.0, 420.0, NZ)
    else:
        theta = np.linspace(420.0, 340.0, NZ)
    pkz = (p_mid / 1.0e5) ** con.KAPPA
    t = theta * pkz
    rho = p_mid / (con.RDGAS * t)
    dz = -dp / (con.GRAV * rho)
    pe = np.concatenate([[max(p_mid[0] - dp[0] / 2, 10.0)],
                         p_mid + dp / 2])
    peln = np.log(pe)

    def a(x, extra=0):
        return jnp.asarray(
            np.broadcast_to(x, shape[:-1] + (NZ + extra,)).copy()
        )

    s = dict(
        pt=a(t), delp=a(dp), delz=a(dz), pkz=a(pkz),
        peln=a(peln, 1), pe=a(pe, 1),
        ua=a(np.linspace(30.0, -5.0, NZ)), va=a(np.zeros(NZ)),
        w=a(np.zeros(NZ)),
    )
    for name in TRACERS:
        s[name] = a(np.zeros(NZ))
    s["qvapor"] = a(np.full(NZ, 1.0e-5))
    return s


def test_unstable_column_mixes():
    s = _make_state(unstable=True)
    out, u_dt, v_dt = dry_convective_adjustment(
        s, timestep=225.0, fv_sg_adj=3600.0, n_sponge=KBOT
    )
    dpt = np.asarray(out["pt"] - s["pt"])
    assert np.abs(dpt[..., :KBOT]).max() > 0.01  # mixing happened
    assert np.abs(dpt[..., KBOT:]).max() == 0.0  # below sponge untouched
    assert np.abs(np.asarray(u_dt)).max() > 0.0


def test_stable_column_unchanged():
    s = _make_state(unstable=False)
    out, u_dt, v_dt = dry_convective_adjustment(
        s, timestep=225.0, fv_sg_adj=3600.0, n_sponge=KBOT
    )
    assert float(jnp.abs(out["pt"] - s["pt"]).max()) < 1e-8
    assert float(jnp.abs(u_dt).max()) == 0.0


def test_tracer_and_momentum_conservation():
    """The 2-layer mixing moves mass-weighted quantities between adjacent
    levels only: column integrals of dp*q and dp*u are conserved."""
    s = _make_state(unstable=True)
    out, u_dt, v_dt = dry_convective_adjustment(
        s, timestep=225.0, fv_sg_adj=225.0, n_sponge=KBOT
    )
    dp = np.asarray(s["delp"])
    for name in ("qvapor", "ua"):
        before = (dp * np.asarray(s[name])).sum(-1)
        after = (dp * np.asarray(out[name])).sum(-1)
        np.testing.assert_allclose(after, before, rtol=1e-12, atol=1e-10)


def test_energy_conservation():
    """Total (internal + geopotential + kinetic) energy is conserved by
    the mixing (fv_sg_adj large enough that no relaxation blending)."""
    s = _make_state(unstable=True)
    out, _, _ = dry_convective_adjustment(
        s, timestep=225.0, fv_sg_adj=225.0, n_sponge=KBOT
    )
    dp = np.asarray(s["delp"])

    def total_energy(st):
        qv = np.asarray(st["qvapor"])
        cvm = (1.0 - qv) * con.CV_AIR + qv * con.CV_VAP
        # recompute sponge-relative gz as the scheme does
        delz = np.asarray(st["delz"])[..., :KBOT]
        gzh_below = -con.GRAV * np.cumsum(delz[..., ::-1], -1)[..., ::-1]
        gz = gzh_below + con.GRAV * delz - 0.5 * con.GRAV * delz
        ke = 0.5 * (np.asarray(st["ua"])[..., :KBOT] ** 2
                    + np.asarray(st["va"])[..., :KBOT] ** 2
                    + np.asarray(st["w"])[..., :KBOT] ** 2)
        te = (cvm[..., :KBOT] * np.asarray(st["pt"])[..., :KBOT]
              + gz + ke)
        return (dp[..., :KBOT] * te).sum(-1)

    np.testing.assert_allclose(
        total_energy(out), total_energy(s), rtol=1e-10
    )


def test_small_sponge_noop():
    s = _make_state(unstable=True)
    out, u_dt, v_dt = dry_convective_adjustment(
        s, timestep=225.0, fv_sg_adj=3600.0, n_sponge=2
    )
    assert out is s or float(jnp.abs(out["pt"] - s["pt"]).max()) == 0.0
