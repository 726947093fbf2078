"""Monotone cubic (PPM) vertical subgrid reconstruction (cs_profile).

jnp port of ai2cm/pace fv3core/pace/fv3core/stencils/remap_profile.py
`RemapProfile`: cubic-spline interface values via a vertical tridiagonal
solve (lax.scan), then kord/iv-dependent monotonicity constraints.

All arrays have k LAST: a4_1/delp (..., nz).  Returns (a4_1..a4_4).
Supported kord: <9, 9, 10; iv (mode): -2, -1, 0, 1, 2.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _kf(q):
    return jnp.moveaxis(q, -1, 0)


def _kl(q):
    return jnp.moveaxis(q, 0, -1)


def _spline_interfaces(a1, delp, qs, iv):
    """Interface values by tridiagonal cubic spline (set_initial_vals).
    a1/delp (..., nz); qs (...). Returns q (..., nz+1), gam (..., nz+1).

    A whole-column Pallas twin (PACE_PALLAS_SPLINE) was deleted in
    round 5: it lost on-chip at C48 (182.7 vs 100.5 ms full step) and
    its compile SIGABRTs the XLA fusion pipeline at C96 — see
    docs/KNOWN_ISSUES.md "spline Pallas kernel".  The lax.scan form
    below is the production path at every grid size."""
    nz = a1.shape[-1]
    a = _kf(a1)
    dp = _kf(delp)
    if iv == -2:
        q0 = 1.5 * a[0]
        gam1 = jnp.full_like(q0, 0.5)
        gr1 = dp[0] / dp[1]
        bet1 = 2.0 + gr1 + gr1 - gam1
        q1 = (3.0 * (a[0] + a[1]) - q0) / bet1

        def fwd(carry, x):
            q_prev, gam_prev = carry
            a_m1, a_0, dp_m2, dp_m1, dp_0, is_last = x
            old_gr = dp_m2 / dp_m1
            old_bet = 2.0 + old_gr + old_gr - gam_prev
            gam_k = old_gr / old_bet
            gr = dp_m1 / dp_0
            bet = 2.0 + gr + gr - gam_k
            q_k = (3.0 * (a_m1 + a_0) - is_last * gr * qs - q_prev) / bet
            return (q_k, gam_k), (q_k, gam_k)

        ks = jnp.arange(2, nz)
        is_last = (ks == nz - 1).astype(a1.dtype).reshape(
            (-1,) + (1,) * (a1.ndim - 1)
        )
        xs = (a[1:nz - 1], a[2:nz], dp[0:nz - 2], dp[1:nz - 1], dp[2:nz],
              is_last)
        (_, _), (q_rest, gam_rest) = jax.lax.scan(fwd, (q1, gam1), xs)
        q = jnp.concatenate(
            [q0[None], q1[None], q_rest,
             jnp.broadcast_to(qs, q0.shape)[None]], 0
        )
        gam = jnp.concatenate(
            [jnp.zeros_like(q0)[None], gam1[None], gam_rest,
             jnp.zeros_like(q0)[None]], 0
        )

        # backward substitution k = nz-2..0 with gam_{k+1}
        def bwd(carry, x):
            q_next = carry
            q_k, gam_next = x
            new = q_k - gam_next * q_next
            return new, new

        _, q_upd_rev = jax.lax.scan(
            bwd, q[nz - 1], (q[:nz - 1][::-1], gam[1:nz][::-1])
        )
        q_out = jnp.concatenate([q_upd_rev[::-1], q[nz - 1:]], 0)
        return _kl(q_out), _kl(gam)
    else:
        gr = dp[1] / dp[0]
        bet0 = gr * (gr + 0.5)
        q0 = ((gr + gr) * (gr + 1.0) * a[0] + a[1]) / bet0
        gam0 = (1.0 + gr * (gr + 1.5)) / bet0

        def fwd(carry, x):
            q_prev, gam_prev = carry
            a_m1, a_0, dp_m1, dp_0 = x
            d4 = dp_m1 / dp_0
            bet = 2.0 + d4 + d4 - gam_prev
            q_k = (3.0 * (a_m1 + d4 * a_0) - q_prev) / bet
            gam_k = d4 / bet
            return (q_k, gam_k), (q_k, gam_k)

        xs = (a[:nz - 1], a[1:nz], dp[:nz - 1], dp[1:nz])
        (q_last, gam_last), (q_rest, gam_rest) = jax.lax.scan(
            fwd, (q0, gam0), xs
        )
        # bottom interface
        d4 = dp[nz - 2] / dp[nz - 1]
        a_bot = 1.0 + d4 * (d4 + 1.5)
        q_bot = (
            2.0 * d4 * (d4 + 1.0) * a[nz - 1] + a[nz - 2] - a_bot * q_last
        ) / (d4 * (d4 + 0.5) - a_bot * gam_last)
        q = jnp.concatenate([q0[None], q_rest, q_bot[None]], 0)
        gam = jnp.concatenate([gam0[None], gam_rest,
                               jnp.zeros_like(q0)[None]], 0)

        def bwd(carry, x):
            q_next = carry
            q_k, gam_k = x
            new = q_k - gam_k * q_next
            return new, new

        _, q_upd_rev = jax.lax.scan(
            bwd, q[nz], (q[:nz][::-1], gam[:nz][::-1])
        )
        q_out = jnp.concatenate([q_upd_rev[::-1], q[nz:]], 0)
        return _kl(q_out), _kl(gam)


def _minmax3(a, b, c):
    return (
        jnp.minimum(jnp.minimum(a, b), c),
        jnp.maximum(jnp.maximum(a, b), c),
    )


def _posdef_constraint_iv1(a1, a2, a3, a4):
    da1 = a3 - a2
    da2 = da1 * da1
    a6da = a4 * da1
    c0 = (a1 - a2) * (a1 - a3) >= 0.0
    c1 = a6da < -da2
    c2 = a6da > da2
    a2n = jnp.where(c0, a1, jnp.where(c1, a2, jnp.where(c2, a3 - 3.0 * (a3 - a1), a2)))
    a3n = jnp.where(c0, a1, jnp.where(c1, a2 - 3.0 * (a2 - a1), jnp.where(c2, a3, a3)))
    a4n = jnp.where(c0, 0.0, jnp.where(c1, 3.0 * (a2 - a1), jnp.where(c2, 3.0 * (a3 - a1), a4)))
    return a2n, a3n, a4n


def _remap_constraint(a1, a2, a3, a4, extm):
    da1 = a3 - a2
    da2 = da1 * da1
    a6da = a4 * da1
    c1 = a6da < -da2
    c2 = a6da > da2
    a2n = jnp.where(extm, a1, jnp.where(c1, a2, jnp.where(c2, a3 - 3.0 * (a3 - a1), a2)))
    a3n = jnp.where(extm, a1, jnp.where(c1, a2 - 3.0 * (a2 - a1), a3))
    a4n = jnp.where(extm, 0.0, jnp.where(c1, 3.0 * (a2 - a1), jnp.where(c2, 3.0 * (a3 - a1), a4)))
    return a2n, a3n, a4n


def _posdef_constraint_iv0(a1, a2, a3, a4):
    neg = a1 <= 0.0
    trigger = jnp.logical_and(
        jnp.abs(a3 - a2) < -a4,
        (a1 + 0.25 * (a3 - a2) ** 2 / jnp.where(a4 == 0, 1.0, a4)
         + a4 * (1.0 / 12.0)) < 0.0,
    )
    c_local_min = jnp.logical_and(a1 < a3, a1 < a2)
    c_right = a3 > a2
    a2_t = jnp.where(c_local_min, a1, jnp.where(c_right, a2, a3 - 3.0 * (a3 - a1)))
    a3_t = jnp.where(c_local_min, a1, jnp.where(c_right, a2 - 3.0 * (a2 - a1), a3))
    a4_t = jnp.where(c_local_min, 0.0, jnp.where(c_right, 3.0 * (a2 - a1), 3.0 * (a3 - a1)))
    a2n = jnp.where(neg, a1, jnp.where(trigger, a2_t, a2))
    a3n = jnp.where(neg, a1, jnp.where(trigger, a3_t, a3))
    a4n = jnp.where(neg, 0.0, jnp.where(trigger, a4_t, a4))
    return a2n, a3n, a4n


def _lane_iota(arr):
    return jax.lax.broadcasted_iota(jnp.int32, arr.shape, arr.ndim - 1)


def _upd_k(dest, expr, ks):
    """dest[..., k] = expr[..., k] for static lane indices ks, as a masked
    select: lane scatters (.at[..., k].set) materialize the full array per
    update and made remap_profile move ~40x its fundamental bytes."""
    kk = _lane_iota(dest)
    m = None
    for k in ks:
        t = kk == k
        m = t if m is None else jnp.logical_or(m, t)
    return jnp.where(m, expr, dest)


def remap_profile(qs, a4_1, delp, n, h, kord: int, iv: int, qmin: float = 0.0):
    """Returns constrained (a4_1, a4_2, a4_3, a4_4) PPM coefficients."""
    nz = a4_1.shape[-1]
    q_if, _ = _spline_interfaces(a4_1, delp, qs, iv)

    # --- apply_constraints ---------------------------------------------------
    # in k-last form; q_if (..., nz+1).  All interface updates are ONE
    # masked select over whole-lane candidate expressions.
    a1m = jnp.concatenate([a4_1[..., :1], a4_1[..., :-1]], -1)  # a4_1[k-1]
    tmp = jnp.maximum(a1m, a4_1)      # valid k >= 1
    tmp2 = jnp.minimum(a1m, a4_1)
    gam_c = a4_1 - a1m                # gam[k] = a1[k]-a1[k-1], valid k >= 1
    q = q_if
    # layer-indexed bounds extended to interfaces: T_if[k] = tmp[k] for
    # k <= nz-1 and tmp[nz-1] at k = nz (the reference's bottom rule)
    tmp_if = jnp.concatenate([tmp, tmp[..., -1:]], -1)
    tmp2_if = jnp.concatenate([tmp2, tmp2[..., -1:]], -1)
    # gam at interface-relative offsets: GM[k] = gam_c[k-1], GP[k] = gam_c[k+1]
    # (clamped at the ends exactly as the slice+pad forms did)
    gm_if = jnp.concatenate([gam_c[..., :1], gam_c], -1)
    gp_if = jnp.concatenate(
        [gam_c[..., 1:], gam_c[..., -1:], gam_c[..., -1:]], -1
    )
    both = jnp.clip(q, tmp2_if, tmp_if)
    only_max = jnp.maximum(q, tmp2_if)
    only_min = jnp.minimum(q, tmp_if)
    if iv == 0:
        only_min = jnp.maximum(only_min, 0.0)
    sel = jnp.where(
        gm_if * gp_if > 0.0, both,
        jnp.where(gm_if > 0.0, only_max, only_min),
    )
    ki = _lane_iota(q)
    q = jnp.where(
        ki == 0, q,
        jnp.where(jnp.logical_or(ki == 1, ki == nz), both, sel),
    )

    a4_2 = q[..., :-1]
    a4_3 = q[..., 1:]

    # extrema flags
    extm_top = (a4_2 - a4_1) * (a4_3 - a4_1) > 0.0
    gam_prod = gam_c[..., 1:-1] * jnp.concatenate(
        [gam_c[..., 2:], gam_c[..., -1:]], -1
    )[..., :nz - 2]
    extm = jnp.concatenate(
        [extm_top[..., :1], gam_prod < 0.0, extm_top[..., -1:]], -1
    )
    x0 = 2.0 * a4_1 - (a4_2 + a4_3)
    x1 = jnp.abs(a4_2 - a4_3)
    a4_4 = 3.0 * x0
    ext5 = jnp.abs(x0) > x1
    ext6 = jnp.abs(a4_4) > x1

    # --- set_interpolation_coefficients -------------------------------------
    # Each static-lane update below is a masked select of a whole-lane
    # candidate expression; the constraint helpers are elementwise, so the
    # per-lane applications of the reference become lane masks over one
    # whole-array evaluation.
    kl = _lane_iota(a4_2)
    # top treatment (lane 0)
    if iv == 0:
        a4_2 = _upd_k(a4_2, jnp.maximum(a4_2, 0.0), (0,))
    elif iv == -1:
        a4_2 = _upd_k(
            a4_2, jnp.where(a4_2 * a4_1 <= 0.0, 0.0, a4_2), (0,)
        )
    elif iv == 2:
        a4_2 = _upd_k(a4_2, a4_1, (0,))
        a4_3 = _upd_k(a4_3, a4_1, (0,))
        a4_4 = _upd_k(a4_4, jnp.zeros_like(a4_4), (0,))
    a44_re = 3.0 * (2.0 * a4_1 - (a4_2 + a4_3))
    a4_4 = _upd_k(a4_4, a44_re, (1,) if iv == 2 else (0, 1))
    if iv != 2:
        p2n, p3n, p4n = _posdef_constraint_iv1(a4_1, a4_2, a4_3, a4_4)
        a4_2n = _upd_k(a4_2, p2n, (0,))
        a4_3n = _upd_k(a4_3, p3n, (0,))
        a4_4n = _upd_k(a4_4, p4n, (0,))
        a4_2, a4_3, a4_4 = a4_2n, a4_3n, a4_4n
    r2n, r3n, r4n = _remap_constraint(a4_1, a4_2, a4_3, a4_4, extm)
    a4_2n = _upd_k(a4_2, r2n, (1,))
    a4_3n = _upd_k(a4_3, r3n, (1,))
    a4_4n = _upd_k(a4_4, r4n, (1,))
    a4_2, a4_3, a4_4 = a4_2n, a4_3n, a4_4n

    # interior layers k = 2..nz-3, computed whole-lane and masked in
    interior = jnp.logical_and(kl >= 2, kl <= nz - 3)
    gam = gam_c  # gam[k] = a1[k] - a1[k-1]
    g_p1 = jnp.concatenate([gam[..., 1:], gam[..., -1:]], -1)      # gam[k+1]
    g_p2 = jnp.concatenate([gam[..., 2:], gam[..., -2:]], -1)      # gam[k+2]
    g_m1 = jnp.concatenate([gam[..., :1], gam[..., :-1]], -1)      # gam[k-1]
    a1i, a2i, a3i = a4_1, a4_2, a4_3
    if kord < 9:
        pmp_1 = a1i - g_p1
        lac_1 = pmp_1 + 1.5 * g_p2
        tmin, tmax = _minmax3(a1i, pmp_1, lac_1)
        a2n = jnp.minimum(jnp.maximum(a2i, tmin), tmax)
        pmp_2 = a1i + 2.0 * g_p1
        lac_2 = pmp_2 - 1.5 * g_m1
        tmin, tmax = _minmax3(a1i, pmp_2, lac_2)
        a3n = jnp.minimum(jnp.maximum(a3i, tmin), tmax)
        a4n = 3.0 * (2.0 * a1i - (a2n + a3n))
    elif kord == 9:
        pmp_1 = a1i - 2.0 * g_p1
        lac_1 = pmp_1 + 1.5 * g_p2
        pmp_2 = a1i + 2.0 * gam
        lac_2 = pmp_2 - 1.5 * g_m1
        e = extm
        e_m1 = jnp.concatenate([extm[..., :1], extm[..., :-1]], -1)
        e_p1 = jnp.concatenate([extm[..., 1:], extm[..., -1:]], -1)
        flat = jnp.logical_or(
            jnp.logical_and(e, jnp.logical_or(e_m1, e_p1)),
            jnp.logical_and(e, jnp.logical_and(qmin > 0.0, a1i < qmin)),
        )
        a44_try = 6.0 * a1i - 3.0 * (a2i + a3i)
        limit = jnp.abs(a44_try) > jnp.abs(a2i - a3i)
        tmin1, tmax1 = _minmax3(a1i, pmp_1, lac_1)
        a2_lim = jnp.minimum(jnp.maximum(a2i, tmin1), tmax1)
        tmin2, tmax2 = _minmax3(a1i, pmp_2, lac_2)
        a3_lim = jnp.minimum(jnp.maximum(a3i, tmin2), tmax2)
        a2n = jnp.where(flat, a1i, jnp.where(limit, a2_lim, a2i))
        a3n = jnp.where(flat, a1i, jnp.where(limit, a3_lim, a3i))
        a4n = jnp.where(
            flat, 0.0,
            jnp.where(limit, 6.0 * a1i - 3.0 * (a2n + a3n), a44_try),
        )
    elif kord == 10:
        pmp_1 = a1i - 2.0 * g_p1
        lac_1 = pmp_1 + 1.5 * g_p2
        pmp_2 = a1i + 2.0 * gam
        lac_2 = pmp_2 - 1.5 * g_m1
        tmin2, tmax2 = _minmax3(a1i, pmp_1, lac_1)
        tmp2v = jnp.maximum(a2i, tmin2)
        tmin3, tmax3 = _minmax3(a1i, pmp_2, lac_2)
        tmp3v = jnp.maximum(a3i, tmin3)
        e5_m1 = jnp.concatenate([ext5[..., :1], ext5[..., :-1]], -1)
        e5_p1 = jnp.concatenate([ext5[..., 1:], ext5[..., -1:]], -1)
        e6_m1 = jnp.concatenate([ext6[..., :1], ext6[..., :-1]], -1)
        e6_p1 = jnp.concatenate([ext6[..., 1:], ext6[..., -1:]], -1)
        lim2 = jnp.minimum(tmp2v, tmax2)
        lim3 = jnp.minimum(tmp3v, tmax3)
        n5 = jnp.logical_or(e5_m1, e5_p1)
        n6 = jnp.logical_or(e6_m1, e6_p1)
        a2n = jnp.where(
            ext5, jnp.where(n5, a1i, jnp.where(n6, lim2, a2i)),
            jnp.where(jnp.logical_and(ext6, n5), lim2, a2i),
        )
        a3n = jnp.where(
            ext5, jnp.where(n5, a1i, jnp.where(n6, lim3, a3i)),
            jnp.where(jnp.logical_and(ext6, n5), lim3, a3i),
        )
        a4n = 3.0 * (2.0 * a1i - (a2n + a3n))
    else:
        raise NotImplementedError(f"kord {kord}")
    if iv == 0:
        a2n, a3n, a4n = _posdef_constraint_iv0(a1i, a2n, a3n, a4n)
    a4_2 = jnp.where(interior, a2n, a4_2)
    a4_3 = jnp.where(interior, a3n, a4_3)
    a4_4 = jnp.where(interior, a4n, a4_4)

    # bottom treatment (lanes nz-2, nz-1)
    if iv == 0:
        a4_3 = _upd_k(a4_3, jnp.maximum(a4_3, 0.0), (nz - 1,))
    elif iv == -1:
        a4_3 = _upd_k(
            a4_3, jnp.where(a4_3 * a4_1 <= 0.0, 0.0, a4_3), (nz - 1,)
        )
    a4_4 = _upd_k(
        a4_4, 3.0 * (2.0 * a4_1 - (a4_2 + a4_3)), (nz - 2, nz - 1)
    )
    r2n, r3n, r4n = _remap_constraint(a4_1, a4_2, a4_3, a4_4, extm)
    a4_2n = _upd_k(a4_2, r2n, (nz - 2,))
    a4_3n = _upd_k(a4_3, r3n, (nz - 2,))
    a4_4n = _upd_k(a4_4, r4n, (nz - 2,))
    a4_2, a4_3, a4_4 = a4_2n, a4_3n, a4_4n
    p2n, p3n, p4n = _posdef_constraint_iv1(a4_1, a4_2, a4_3, a4_4)
    a4_2 = _upd_k(a4_2, p2n, (nz - 1,))
    a4_3 = _upd_k(a4_3, p3n, (nz - 1,))
    a4_4 = _upd_k(a4_4, p4n, (nz - 1,))
    return a4_1, a4_2, a4_3, a4_4
