"""Fix negative tracer values by borrowing mass vertically (fillz).

jnp port of ai2cm/pace fv3core/pace/fv3core/stencils/fillz.py
`FillNegativeTracerValues`: the sequential forward borrow pass becomes a
lax.scan over k.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def fix_tracer(q, dp):
    """q/dp (..., nz). Returns fixed q."""
    from pace_tpu.ops.pallas import fillz_pallas

    if q.ndim == 4 and fillz_pallas.enabled(q.dtype, q.shape[1]):
        return fillz_pallas.fix_tracer_pallas(q, dp)

    nz = q.shape[-1]
    kf = lambda a: jnp.moveaxis(a, -1, 0)  # noqa: E731
    kl = lambda a: jnp.moveaxis(a, 0, -1)  # noqa: E731
    qk = kf(q)
    dpk = kf(dp)

    # fix_top (single concat: leading-axis .at sets materialize the full
    # stack per update)
    q1 = jnp.where(qk[0] < 0.0, qk[1] + qk[0] * dpk[0] / dpk[1], qk[1])
    q0 = jnp.maximum(qk[0], 0.0)
    qk = jnp.concatenate([q0[None], q1[None], qk[2:]], 0)

    # fix_interior: forward scan k = 1..nz-2
    def body2(carry, xs):
        q_prev, dp_prev, low_prev = carry
        q_k, dp_k, q_next_orig, dp_next = xs
        q_k = jnp.where(low_prev != 0.0, q_k - low_prev / dp_k, q_k)
        neg0 = q_k < 0.0
        can_up = jnp.logical_and(neg0, q_prev > 0.0)
        dq_up = jnp.minimum(q_prev * dp_prev, -(q_k * dp_k))
        q_k1 = jnp.where(can_up, q_k + dq_up / dp_k, q_k)
        upper_fix_k = jnp.where(can_up, dq_up, 0.0)
        still_neg = jnp.logical_and(q_k1 < 0.0, q_next_orig > 0.0)
        dq_lo = jnp.minimum(q_next_orig * dp_next, -(q_k1 * dp_k))
        q_k2 = jnp.where(still_neg, q_k1 + dq_lo / dp_k, q_k1)
        lower_fix_k = jnp.where(still_neg, dq_lo, 0.0)
        return (q_k2, dp_k, lower_fix_k), (q_k2, upper_fix_k, lower_fix_k,
                                           neg0)

    xs = (qk[1:nz - 1], dpk[1:nz - 1], qk[2:nz], dpk[2:nz])
    (q_last_mid, _, low_last), (q_mid, upper_fix_mid, lower_fix_mid, neg_mid) \
        = jax.lax.scan(body2, (qk[0], dpk[0], jnp.zeros_like(qk[0])), xs)

    zeros = jnp.zeros_like(qk[0])
    q_new = jnp.concatenate([qk[0][None], q_mid, qk[nz - 1][None]], 0)
    upper_fix = jnp.concatenate([zeros[None], upper_fix_mid, zeros[None]], 0)
    lower_fix = jnp.concatenate([zeros[None], lower_fix_mid, zeros[None]], 0)
    zfix_any = jnp.concatenate(
        [jnp.zeros_like(qk[0], bool)[None], neg_mid,
         jnp.zeros_like(qk[0], bool)[None]], 0,
    )

    # account for upward borrows: q_k -= upper_fix[k+1]/dp_k for k < nz-1
    q_new = jnp.concatenate(
        [q_new[:nz - 1] - upper_fix[1:] / dpk[:nz - 1], q_new[nz - 1:]], 0
    )

    # fix_bottom
    q_bot = q_new[nz - 1]
    q_bot = jnp.where(
        lower_fix[nz - 2] != 0.0, q_bot - lower_fix[nz - 2] / dpk[nz - 1],
        q_bot,
    )
    qup = q_new[nz - 2] * dpk[nz - 2]
    qly = -q_bot * dpk[nz - 1]
    dup = jnp.minimum(qup, qly)
    bot_fix = jnp.logical_and(q_bot < 0.0, q_new[nz - 2] > 0.0)
    q_bot = jnp.where(bot_fix, q_bot + dup / dpk[nz - 1], q_bot)
    q_nz2 = jnp.where(bot_fix, q_new[nz - 2] - dup / dpk[nz - 2],
                      q_new[nz - 2])
    q_new = jnp.concatenate([q_new[:nz - 2], q_nz2[None], q_bot[None]], 0)
    zfix_any = jnp.concatenate([zfix_any[:nz - 1], bot_fix[None]], 0)

    dm = q_new * dpk
    dm_pos = jnp.maximum(dm, 0.0)
    sum0 = jnp.sum(dm[1:], 0)
    sum1 = jnp.sum(dm_pos[1:], 0)
    zfix = jnp.any(zfix_any, 0)
    fac = jnp.where(sum0 > 0.0, sum0 / jnp.where(sum1 == 0.0, 1.0, sum1), 0.0)
    apply = jnp.logical_and(zfix, fac > 0.0)
    q_final = jnp.where(
        apply[None], jnp.maximum(fac[None] * dm / dpk, 0.0), q_new
    )
    q_final = jnp.concatenate([q_new[:1], q_final[1:]], 0)
    return kl(q_final)


def fill_negative_tracers(dp2, tracers: dict, names):
    return {
        name: (fix_tracer(tracers[name], dp2) if name in names
               else tracers[name])
        for name in tracers
    }
