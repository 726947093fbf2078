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


def lagrangian_contributions(pe1, pe2, q4_1, q4_2, q4_3, q4_4, dp1):
    """Mean of the PPM subgrid reconstruction over each Eulerian layer.

    pe1/pe2 (..., nz+1) Lagrangian/Eulerian interface pressures (pe1 and
    pe2 must span the same total column); q4_* / dp1 (..., nz).
    Returns q on Eulerian layers (..., nz).
    """
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


def map_single(q1, pe1, pe2, n, h, kord, mode, qs=None, qmin: float = 0.0):
    """Remap q1 from Lagrangian levels pe1 to Eulerian levels pe2."""
    dp1 = pe1[..., 1:] - pe1[..., :-1]
    if qs is None:
        qs = jnp.zeros(q1.shape[:-1], q1.dtype)
    a1, a2, a3, a4 = remap_profile(qs, q1, dp1, n, h, kord, mode, qmin)
    return lagrangian_contributions(pe1, pe2, a1, a2, a3, a4, dp1)
