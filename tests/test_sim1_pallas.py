"""Pallas SIM1 vertical solver vs the lax.scan reference
(ops/pallas/sim1_pallas.py vs ops/riemann.sim1_solver scan path).

Interpret mode on CPU; the real Mosaic compile is exercised on TPU by the
bench/driver runs (the kernel is on by default there for f32)."""

import numpy as np
import pytest

import jax.numpy as jnp

from pace_tpu.ops import riemann
from pace_tpu.ops.pallas import sim1_pallas


def _inputs(rng, ni, nj, nz, dtype):
    """Physically-plausible solver inputs (positive masses, negative dz)."""
    shape = (6, ni, nj, nz)
    dm = jnp.asarray(10.0 + rng.rand(*shape) * 5.0, dtype)
    cappa = jnp.asarray(0.28 + 0.01 * rng.rand(*shape), dtype)
    gm = 1.0 / (1.0 - cappa)
    dz = jnp.asarray(-(200.0 + 100.0 * rng.rand(*shape)), dtype)
    pt = jnp.asarray(250.0 + 40.0 * rng.rand(*shape), dtype)
    pm = jnp.asarray(5e4 + 1e4 * rng.rand(*shape), dtype)
    pem = jnp.asarray(
        np.concatenate(
            [np.full((6, ni, nj, 1), 300.0),
             300.0 + np.cumsum(900.0 + 100.0 * rng.rand(*shape), -1)], -1,
        ), dtype,
    )
    w = jnp.asarray(rng.randn(*shape), dtype)
    ws = jnp.asarray(0.1 * rng.randn(6, ni, nj), dtype)
    return w, dm, gm, dz, pt, pm, pem, ws


@pytest.mark.parametrize("nz", [7, 16])
def test_sim1_pallas_matches_scan_f64(monkeypatch, nz):
    """Algorithmic equivalence: in f64 the kernel reproduces the scan
    path to round-off (1e-13 of scale)."""
    monkeypatch.setenv("PACE_PALLAS_SIM1", "0")
    rng = np.random.RandomState(7)
    ni = nj = 8
    dt, p_fac = 112.5, 0.05
    args = _inputs(rng, ni, nj, nz, jnp.float64)

    w_ref, dz_ref, pe_ref = riemann.sim1_solver(*args, dt, p_fac)
    w_p, dz_p, pe_p = sim1_pallas.sim1_pallas(
        *args, dt, p_fac, interpret=True
    )

    for name, a, b in (("w", w_ref, w_p), ("dz", dz_ref, dz_p),
                       ("pe", pe_ref, pe_p)):
        scale = float(jnp.abs(a).max()) + 1e-30
        err = float(jnp.abs(a - b).max()) / scale
        assert err < 1e-13, f"{name}: rel err {err}"


@pytest.mark.parametrize("nz", [7, 16])
def test_sim1_pallas_f32_accuracy(monkeypatch, nz):
    """f32 production precision: both the kernel and the scan path are
    compared against the f64 scan truth — the kernel must not be
    meaningfully less accurate than the scan at f32 (pure reordering)."""
    monkeypatch.setenv("PACE_PALLAS_SIM1", "0")
    rng = np.random.RandomState(7)
    ni = nj = 8
    dt, p_fac = 112.5, 0.05
    args64 = _inputs(rng, ni, nj, nz, jnp.float64)
    args32 = tuple(a.astype(jnp.float32) for a in args64)

    truth = riemann.sim1_solver(*args64, dt, p_fac)
    scan32 = riemann.sim1_solver(*args32, dt, p_fac)
    pall32 = sim1_pallas.sim1_pallas(*args32, dt, p_fac, interpret=True)

    for i, name in enumerate(("w", "dz", "pe")):
        scale = float(jnp.abs(truth[i]).max()) + 1e-30
        err_scan = float(jnp.abs(truth[i] - scan32[i]).max()) / scale
        err_pall = float(
            jnp.abs(truth[i] - pall32[i].astype(jnp.float64)).max()
        ) / scale
        assert err_pall < 3.0 * err_scan + 1e-6, (
            f"{name}: pallas f32 err {err_pall} vs scan f32 err {err_scan}"
        )


def test_sim1_pallas_f64_falls_back():
    """f64 always takes the scan path (Mosaic has no 64-bit); enabled()
    must refuse f64 regardless of the env override."""
    import os

    old = os.environ.get("PACE_PALLAS_SIM1")
    os.environ["PACE_PALLAS_SIM1"] = "1"
    try:
        assert not sim1_pallas.enabled(jnp.float64)
        assert sim1_pallas.enabled(jnp.float32)
    finally:
        if old is None:
            del os.environ["PACE_PALLAS_SIM1"]
        else:
            os.environ["PACE_PALLAS_SIM1"] = old
