"""Pallas fillz vs the lax.scan reference (ops/pallas/fillz_pallas.py
vs ops/fillz.fix_tracer)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pace_tpu.ops import fillz
from pace_tpu.ops.pallas import fillz_pallas


def _inputs(rng, ni, nj, nz, dtype, neg_frac=0.3):
    shape = (6, ni, nj, nz)
    q = rng.rand(*shape)
    q[rng.rand(*shape) < neg_frac] *= -0.5  # sprinkle negatives
    dp = 300.0 + 1500.0 * rng.rand(*shape)
    return jnp.asarray(q, dtype), jnp.asarray(dp, dtype)


@pytest.mark.parametrize("nz", [7, 16])
def test_fillz_pallas_matches_scan_f64(monkeypatch, nz):
    monkeypatch.setenv("PACE_PALLAS_FILLZ", "0")
    rng = np.random.RandomState(9)
    q, dp = _inputs(rng, 8, 8, nz, jnp.float64)
    ref = fillz.fix_tracer(q, dp)
    got = fillz_pallas.fix_tracer_pallas(q, dp, interpret=True)
    scale = float(jnp.abs(ref).max()) + 1e-30
    err = float(jnp.abs(ref - got).max()) / scale
    assert err < 1e-13, f"rel err {err}"
    # the fix must leave levels 1.. non-negative where the scan does
    assert (np.asarray(got)[..., 1:] >= -1e-12).all() == (
        np.asarray(ref)[..., 1:] >= -1e-12).all()


def test_fillz_pallas_under_vmap(monkeypatch):
    """remapping vmaps fix_tracer over the tracer stack."""
    monkeypatch.setenv("PACE_PALLAS_FILLZ", "0")
    rng = np.random.RandomState(10)
    nz = 7
    qs = jnp.asarray(rng.rand(4, 6, 8, 8, nz) - 0.2, jnp.float64)
    dp = jnp.asarray(300.0 + 1500.0 * rng.rand(6, 8, 8, nz), jnp.float64)
    ref = jax.vmap(lambda q: fillz.fix_tracer(q, dp))(qs)
    got = jax.vmap(
        lambda q: fillz_pallas.fix_tracer_pallas(q, dp, interpret=True)
    )(qs)
    scale = float(jnp.abs(ref).max()) + 1e-30
    assert float(jnp.abs(ref - got).max()) / scale < 1e-13
