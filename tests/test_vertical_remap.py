"""Vertical remap: the O(nz) cumulative-integral lagrangian_contributions
must match the O(nz^2) overlap-scan reference form (map_single.py) on
PPM-consistent coefficients."""

import jax
import jax.numpy as jnp
import numpy as np

from pace_tpu.ops.map_single import (
    lagrangian_contributions,
    lagrangian_contributions_scan,
)


def _column_set(rng, shape, nz, jitter):
    ptop = 300.0
    ps = 1.0e5 * (1 + 0.05 * rng.standard_normal(shape))[..., None]
    f = np.linspace(0, 1, nz + 1) ** 1.5

    def interfaces():
        base = ptop + (ps - ptop) * f
        mid = base[..., 1:-1] + jitter * rng.standard_normal(
            shape + (nz - 1,)
        ) * np.diff(base, axis=-1)[..., :-1]
        mid = np.sort(mid, axis=-1)
        return np.concatenate([base[..., :1], mid, base[..., -1:]], -1)

    pe1 = interfaces()
    pe2 = interfaces()
    pe2[..., 0] = pe1[..., 0]
    pe2[..., -1] = pe1[..., -1]
    return pe1, pe2


def test_cumulative_matches_scan():
    rng = np.random.default_rng(3)
    shape, nz = (6, 10, 10), 79
    pe1, pe2 = _column_set(rng, shape, nz, jitter=0.3)
    dp1 = np.diff(pe1, axis=-1)
    a1 = 300.0 * (1 + 0.3 * rng.standard_normal(shape + (nz,)))
    a2 = a1 + 10 * rng.standard_normal(shape + (nz,))
    a3 = a1 + 10 * rng.standard_normal(shape + (nz,))
    # PPM consistency: the reconstruction's mean equals the cell mean
    a4 = 3.0 * (2.0 * a1 - (a2 + a3))

    args = [jnp.asarray(x, jnp.float64)
            for x in (pe1, pe2, a1, a2, a3, a4, dp1)]
    ref = np.asarray(jax.jit(lagrangian_contributions_scan)(*args))
    new = np.asarray(jax.jit(lagrangian_contributions)(*args))
    scale = np.abs(ref).max()
    assert np.abs(new - ref).max() / scale < 1e-12

    # f32 accuracy stays at roundoff scale (compensated prefix)
    args32 = [jnp.asarray(x, jnp.float32)
              for x in (pe1, pe2, a1, a2, a3, a4, dp1)]
    new32 = np.asarray(jax.jit(lagrangian_contributions)(*args32))
    assert np.abs(new32 - ref).max() / scale < 5e-4
    den = np.maximum(np.abs(ref), scale * 1e-3)
    assert np.percentile(np.abs(new32 - ref) / den, 99) < 2e-5


def test_identity_when_grids_match():
    """pe2 == pe1 must return the cell means exactly (s telescopes)."""
    rng = np.random.default_rng(5)
    shape, nz = (6, 8, 8), 63
    pe1, _ = _column_set(rng, shape, nz, jitter=0.2)
    dp1 = np.diff(pe1, axis=-1)
    a1 = 300.0 * (1 + 0.3 * rng.standard_normal(shape + (nz,)))
    a2 = a1 + 10 * rng.standard_normal(shape + (nz,))
    a3 = a1 + 10 * rng.standard_normal(shape + (nz,))
    a4 = 3.0 * (2.0 * a1 - (a2 + a3))
    args = [jnp.asarray(x, jnp.float64)
            for x in (pe1, pe1, a1, a2, a3, a4, dp1)]
    out = np.asarray(jax.jit(lagrangian_contributions)(*args))
    np.testing.assert_allclose(out, a1, rtol=1e-11)


def test_multi_space_contraction_matches_single():
    """map_single_spaces with a log-pressure second space must equal the
    per-space map_single calls to f64 rounding (the indicator is
    order-identical under the monotone transform and the gathers are
    one-hot-exact; vmap changes the fusion of the limiter cascade, so
    individual elements can reassociate at the ~1e-11-relative level)."""
    from pace_tpu.ops.map_single import map_single, map_single_spaces

    rng = np.random.default_rng(11)
    shape, nz, n, h = (6, 14, 14), 79, 8, 3
    pe1, pe2 = _column_set(rng, shape, nz, jitter=0.25)
    q_a = 300.0 * (1 + 0.2 * rng.standard_normal(shape + (nz,)))
    q_b = np.abs(rng.standard_normal(shape + (nz,)))
    q_pt = 250.0 * (1 + 0.1 * rng.standard_normal(shape + (nz,)))

    pe1j = jnp.asarray(pe1, jnp.float64)
    pe2j = jnp.asarray(pe2, jnp.float64)
    ln1, ln2 = jnp.log(pe1j), jnp.log(pe2j)
    qa, qb, qpt = (jnp.asarray(x, jnp.float64) for x in (q_a, q_b, q_pt))

    (got_ab,), (got_pt,) = jax.jit(
        lambda a, b, p: map_single_spaces(
            [
                (pe1j, pe2j, [(jnp.stack([a, b]), 8, 0, None, 0.0)]),
                (ln1, ln2, [(p, 8, 1, None, 184.0)]),
            ], n, h,
        )
    )(qa, qb, qpt)

    want_a = np.asarray(map_single(qa, pe1j, pe2j, n, h, 8, 0))
    want_b = np.asarray(map_single(qb, pe1j, pe2j, n, h, 8, 0))
    want_pt = np.asarray(map_single(qpt, ln1, ln2, n, h, 8, 1, qmin=184.0))

    np.testing.assert_allclose(np.asarray(got_ab[0]), want_a, rtol=1e-10)
    np.testing.assert_allclose(np.asarray(got_ab[1]), want_b, rtol=1e-10)
    np.testing.assert_allclose(np.asarray(got_pt), want_pt, rtol=1e-10)
