"""Pallas cubic-spline interface solve vs the lax.scan reference
(ops/pallas/spline_pallas.py vs ops/remap_profile._spline_interfaces)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pace_tpu.ops import remap_profile
from pace_tpu.ops.pallas import spline_pallas


def _inputs(rng, ni, nj, nz, dtype):
    shape = (6, ni, nj, nz)
    a1 = jnp.asarray(250.0 + 40.0 * rng.rand(*shape), dtype)
    delp = jnp.asarray(300.0 + 1500.0 * rng.rand(*shape), dtype)
    qs = jnp.asarray(rng.randn(6, ni, nj), dtype)
    return a1, delp, qs


@pytest.mark.parametrize("iv", [-2, 0, 1])
@pytest.mark.parametrize("nz", [7, 16])
def test_spline_pallas_matches_scan_f64(monkeypatch, iv, nz):
    monkeypatch.setenv("PACE_PALLAS_SPLINE", "0")
    rng = np.random.RandomState(5)
    a1, delp, qs = _inputs(rng, 8, 8, nz, jnp.float64)

    q_ref, _ = remap_profile._spline_interfaces(a1, delp, qs, iv)
    q_p, _ = spline_pallas.spline_interfaces_pallas(
        a1, delp, qs, iv, interpret=True
    )
    scale = float(jnp.abs(q_ref).max()) + 1e-30
    err = float(jnp.abs(q_ref - q_p).max()) / scale
    assert err < 1e-13, f"iv={iv}: rel err {err}"


def test_spline_pallas_under_vmap(monkeypatch):
    """map_single_stacked vmaps remap_profile over the tracer stack;
    pallas_call must batch correctly (vmap -> leading grid dim)."""
    monkeypatch.setenv("PACE_PALLAS_SPLINE", "0")
    rng = np.random.RandomState(6)
    nz = 7
    a_stack = jnp.asarray(rng.rand(3, 6, 8, 8, nz), jnp.float64)
    delp = jnp.asarray(300.0 + 1500.0 * rng.rand(6, 8, 8, nz), jnp.float64)
    qs = jnp.zeros((6, 8, 8), jnp.float64)

    ref = jax.vmap(
        lambda a: remap_profile._spline_interfaces(a, delp, qs, 0)[0]
    )(a_stack)
    got = jax.vmap(
        lambda a: spline_pallas.spline_interfaces_pallas(
            a, delp, qs, 0, interpret=True)[0]
    )(a_stack)
    scale = float(jnp.abs(ref).max()) + 1e-30
    err = float(jnp.abs(ref - got).max()) / scale
    assert err < 1e-13, f"vmap rel err {err}"


def test_full_remap_profile_with_pallas_spline(monkeypatch):
    """End-to-end remap_profile with the kernel enabled matches the
    scan path (the limiter cascade consumes the kernel's q)."""
    rng = np.random.RandomState(8)
    nz = 16
    a1, delp, qs = _inputs(rng, 8, 8, nz, jnp.float64)

    monkeypatch.setenv("PACE_PALLAS_SPLINE", "0")
    ref = remap_profile.remap_profile(qs, a1, delp, 8, 3, 9, 0)

    # force the kernel path in interpret mode (real Mosaic compile needs
    # the TPU): enabled() is made dtype-blind and the call interpreted
    real = spline_pallas.spline_interfaces_pallas
    monkeypatch.setattr(spline_pallas, "enabled", lambda dtype=None: True)
    monkeypatch.setattr(
        spline_pallas, "spline_interfaces_pallas",
        lambda a1_, delp_, qs_, iv_, interpret=False: real(
            a1_, delp_, qs_, iv_, interpret=True),
    )
    got = remap_profile.remap_profile(qs, a1, delp, 8, 3, 9, 0)
    for r, g in zip(ref, got):
        scale = float(jnp.abs(r).max()) + 1e-30
        assert float(jnp.abs(r - g).max()) / scale < 1e-13
