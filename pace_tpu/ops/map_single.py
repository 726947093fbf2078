"""Conservative vertical remapping of a single field (map_single).

jnp port of ai2cm/pace fv3core/pace/fv3core/stencils/map_single.py.  The
reference's per-column `lev` bookkeeping with a data-dependent while loop
becomes a vectorized overlap-integral: for every (target, source) layer
pair, integrate the PPM reconstruction over the pressure overlap — a
TPU-friendly dense contraction over the source-layer axis via lax.scan.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from pace_tpu.ops.remap_profile import remap_profile


def lagrangian_contributions_scan(pe1, pe2, q4_1, q4_2, q4_3, q4_4, dp1):
    """O(nz^2) overlap-scan form, kept as the numerical reference for
    lagrangian_contributions (tests/test_pallas_transport.py style
    pinning).  Each of the nz scan iterations re-reads the full target
    arrays from HBM, so on TPU this moves ~nz x the fundamental bytes."""
    nz = q4_1.shape[-1]
    lo_t = pe2[..., :-1]
    hi_t = pe2[..., 1:]

    def body(acc, xs):
        p_l, p_r, dpl, c2, c3, c4 = xs
        lo = jnp.maximum(lo_t, p_l[..., None])
        hi = jnp.minimum(hi_t, p_r[..., None])
        dp_ov = jnp.maximum(hi - lo, 0.0)
        s1 = (lo - p_l[..., None]) / dpl[..., None]
        s2 = (hi - p_l[..., None]) / dpl[..., None]
        delta = c3 - c2
        mean = (
            c2[..., None]
            + 0.5 * (delta + c4)[..., None] * (s1 + s2)
            - c4[..., None] * (s1 * s1 + s1 * s2 + s2 * s2) / 3.0
        )
        return acc + dp_ov * mean, None

    kf = lambda q: jnp.moveaxis(q, -1, 0)  # noqa: E731
    xs = (
        kf(pe1[..., :-1]), kf(pe1[..., 1:]), kf(dp1),
        kf(q4_2), kf(q4_3), kf(q4_4),
    )
    total, _ = jax.lax.scan(body, jnp.zeros_like(q4_1), xs)
    return total / (hi_t - lo_t)


def lagrangian_contributions(pe1, pe2, q4_1, q4_2, q4_3, q4_4, dp1):
    """Mean of the PPM subgrid reconstruction over each Eulerian layer.

    pe1/pe2 (..., nz+1) Lagrangian/Eulerian interface pressures (pe1 and
    pe2 must span the same total column); q4_* / dp1 (..., nz).
    Returns q on Eulerian layers (..., nz).

    O(nz) cumulative-integral form: with F(p) the integral of the PPM
    reconstruction from column top to pressure p, each Eulerian layer mean
    is (F(pe2[k+1]) - F(pe2[k])) / dp2[k].  F at a target interface is an
    exclusive prefix sum of whole-layer integrals plus one partial-layer
    polynomial integral.  The prefix is O(column mass) while layer
    integrals are ~100x smaller, so the prefix is carried as a compensated
    double-float (hi from cumsum, lo from the accumulated Fast2Sum rounding
    errors); the hi-part differences of nearby interfaces are exact by
    Sterbenz and the lo part restores the cancelled bits -- f32 accuracy
    matches the overlap-scan form to ~1e-7 relative.
    """
    nz = q4_1.shape[-1]
    # source layer index containing each target interface:
    # j[k] = #{m in 1..nz-1 : pe1[m] <= pe2[k]} in [0, nz-1]
    interior = pe1[..., 1:-1]
    j = jnp.sum(
        (interior[..., None, :] <= pe2[..., :, None]).astype(jnp.int32),
        axis=-1,
    )

    # Gather layer quantities at j via a one-hot MXU contraction.  A
    # take_along_axis gather along the minor (lane) axis serializes on TPU
    # (~17 ms per 7-array batch at C48) while the contraction is one MXU
    # pass (~3 ms) and is EXACT at HIGHEST precision: each output has
    # exactly one nonzero 0/1 weight, and the f32 operand splitting makes
    # the lone product round once.
    dt = q4_1.dtype
    ind = (
        j[..., :, None]
        == jax.lax.broadcasted_iota(jnp.int32, j.shape + (nz,), j.ndim)
    ).astype(dt)

    def take_many(*arrs):
        stacked = jnp.stack(arrs, 0)
        out = jnp.einsum(
            "...km,c...m->c...k", ind, stacked,
            precision=jax.lax.Precision.HIGHEST,
        )
        return tuple(out)

    # whole-layer integrals of the reconstruction (its own analytic
    # integral, not q4_1*dp1 -- exact even where the PPM constraints leave
    # q4_* inconsistent with the cell mean) and compensated exclusive prefix
    integ = dp1 * (
        q4_2 + 0.5 * (q4_3 - q4_2 + q4_4) - q4_4 / 3.0
    )
    z = jnp.zeros_like(integ[..., :1])
    c_hi = jnp.concatenate([z, jnp.cumsum(integ, -1)], -1)
    err = (c_hi[..., 1:] - c_hi[..., :-1]) - integ
    c_lo = -jnp.concatenate([z, jnp.cumsum(err, -1)], -1)

    p_l, dpl, c2, delta, c4, f_hi, f_lo0 = take_many(
        pe1[..., :-1], dp1, q4_2, q4_3 - q4_2, q4_4,
        c_hi[..., :-1], c_lo[..., :-1],
    )

    # partial integral inside layer j up to the target interface
    s = jnp.clip((pe2 - p_l) / dpl, 0.0, 1.0)
    partial = dpl * s * (c2 + 0.5 * (delta + c4) * s - c4 * (s * s) / 3.0)

    f_lo = f_lo0 + partial
    num = (f_hi[..., 1:] - f_hi[..., :-1]) + (f_lo[..., 1:] - f_lo[..., :-1])
    return num / (pe2[..., 1:] - pe2[..., :-1])


def map_single(q1, pe1, pe2, n, h, kord, mode, qs=None, qmin: float = 0.0):
    """Remap q1 from Lagrangian levels pe1 to Eulerian levels pe2."""
    dp1 = pe1[..., 1:] - pe1[..., :-1]
    if qs is None:
        qs = jnp.zeros(q1.shape[:-1], q1.dtype)
    a1, a2, a3, a4 = remap_profile(qs, q1, dp1, n, h, kord, mode, qmin)
    return lagrangian_contributions(pe1, pe2, a1, a2, a3, a4, dp1)
