"""Cross-species negative-tracer fixer with heat accounting (neg_adj3).

jnp port of ai2cm/pace fv3core/pace/fv3core/stencils/neg_adj3.py
`AdjustNegativeTracerMixingRatio` (nonhydrostatic, check_negative=False).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from pace_tpu.utils import constants

D0_VAP = constants.CV_VAP - constants.C_LIQ
LV00 = constants.HLV - D0_VAP * constants.TICE


def _fix_neg_water(pt, qvapor, qliquid, qrain, qsnow, qice, qgraupel):
    q_liq = jnp.maximum(0.0, qliquid + qrain)
    q_sol = jnp.maximum(0.0, qice + qsnow)
    cpm = (
        (1.0 - (qvapor + q_liq + q_sol)) * constants.CV_AIR
        + qvapor * constants.CV_VAP
        + q_liq * constants.C_LIQ
        + q_sol * constants.C_ICE
    )
    lcpk = (LV00 + D0_VAP * pt) / cpm
    icpk = (constants.LI0 + constants.DC_ICE * pt) / cpm

    # --- fix_negative_ice ---------------------------------------------------
    qsum = qice + qsnow
    qice_n = jnp.where(
        qsum > 0.0,
        jnp.where(qice < 0.0, 0.0, jnp.where(qsnow < 0.0, qsum, qice)),
        0.0,
    )
    qsnow_n = jnp.where(
        qsum > 0.0,
        jnp.where(qice < 0.0, qsum, jnp.where(qsnow < 0.0, 0.0, qsnow)),
        0.0,
    )
    qgraupel_n = jnp.where(qsum > 0.0, qgraupel, qgraupel + qsum)
    qice, qsnow, qgraupel = qice_n, qsnow_n, qgraupel_n
    # borrow snow -> graupel
    dq = jnp.where(qgraupel < 0.0, jnp.minimum(qsnow, -qgraupel), 0.0)
    qsnow = qsnow - dq
    qgraupel = qgraupel + dq
    # borrow ice -> graupel
    dq = jnp.where(qgraupel < 0.0, jnp.minimum(qice, -qgraupel), 0.0)
    qice = qice - dq
    qgraupel = qgraupel + dq
    # borrow rain (note: the reference debits qliquid here, matching its code)
    cond = jnp.logical_and(qgraupel < 0.0, qrain > 0.0)
    dq = jnp.where(cond, jnp.minimum(qrain, -qgraupel), 0.0)
    qgraupel = qgraupel + dq
    qliquid = qliquid - dq
    pt = pt + dq * icpk
    # borrow cloud water (phase change)
    cond = jnp.logical_and(qgraupel < 0.0, qliquid > 0.0)
    dq = jnp.where(cond, jnp.minimum(qliquid, -qgraupel), 0.0)
    qgraupel = qgraupel + dq
    qliquid = qliquid - dq
    pt = pt + dq * icpk
    # last resort: water vapor
    cond = jnp.logical_and(qgraupel < 0.0, qvapor > 0.0)
    dq = jnp.where(cond, jnp.minimum(0.999 * qvapor, -qgraupel), 0.0)
    qgraupel = qgraupel + dq
    qvapor = qvapor - dq
    pt = pt + dq * (icpk + lcpk)

    # --- fix_negative_liq ----------------------------------------------------
    qsum = qliquid + qrain
    pos_qg = jnp.maximum(0.0, qgraupel)
    pos_branch_qrain = jnp.where(
        qrain < 0.0, 0.0, jnp.where(qliquid < 0.0, qsum, qrain)
    )
    pos_branch_qliq = jnp.where(
        qrain < 0.0, qsum, jnp.where(qliquid < 0.0, 0.0, qliquid)
    )
    # negative-total branch
    qrain_tmp = qsum
    dq = jnp.minimum(pos_qg, -qrain_tmp)
    qrain_tmp = qrain_tmp + dq
    qgraupel_nb = qgraupel - dq
    pt_nb = pt - dq * icpk
    cond = qrain < 0.0
    dq2 = jnp.where(cond, jnp.minimum(qice + qsnow, -qrain_tmp), 0.0)
    qrain_tmp2 = qrain_tmp + dq2
    dq1 = jnp.minimum(dq2, qsnow)
    qsnow_nb = qsnow - dq1
    qice_nb = qice + dq1 - dq2
    pt_nb = pt_nb - dq2 * icpk
    qrain_nb = qrain_tmp2
    cond2 = jnp.logical_and(qrain_nb < 0.0, qvapor > 0.0)
    dq3 = jnp.where(cond2, jnp.minimum(0.999 * qvapor, -qrain_nb), 0.0)
    qvapor_nb = qvapor - dq3
    qrain_nb = qrain_nb + dq3
    pt_nb = pt_nb + dq3 * lcpk

    neg_total = qsum <= 0.0
    qliquid = jnp.where(neg_total, 0.0, pos_branch_qliq)
    qrain = jnp.where(neg_total, qrain_nb, pos_branch_qrain)
    qgraupel = jnp.where(neg_total, qgraupel_nb, qgraupel)
    qsnow = jnp.where(neg_total, qsnow_nb, qsnow)
    qice = jnp.where(neg_total, qice_nb, qice)
    qvapor = jnp.where(neg_total, qvapor_nb, qvapor)
    pt = jnp.where(neg_total, pt_nb, pt)
    return pt, qvapor, qliquid, qrain, qsnow, qice, qgraupel


def _fillq(q, dp):
    """Borrow from the column's positive total to fill negatives, paying back
    from positive layers bottom-up (neg_adj3.py fillq)."""
    nz = q.shape[-1]
    kf = lambda a: jnp.moveaxis(a, -1, 0)  # noqa: E731
    qk = kf(q)
    dpk = kf(dp)
    sum1 = jnp.sum(jnp.where(qk > 0.0, qk * dpk, 0.0), 0)

    def bwd1(carry, x):
        s1, s2 = carry
        q_k, dp_k = x
        borrow = jnp.logical_and(q_k < 0.0, s1 >= 0.0)
        dq = jnp.where(borrow, jnp.minimum(s1, -q_k * dp_k), 0.0)
        s1 = s1 - dq
        s2 = s2 + dq
        q_new = q_k + dq / dp_k
        return (s1, s2), q_new

    (s1f, s2f), q_rev = jax.lax.scan(
        bwd1, (sum1, jnp.zeros_like(sum1)), (qk[::-1], dpk[::-1])
    )
    qk = q_rev[::-1]

    def bwd2(carry, x):
        s1, s2 = carry
        q_k, dp_k = x
        payback = jnp.logical_and(
            jnp.logical_and(q_k > 0.0, s1 >= 1e-12), s2 > 0.0
        )
        dq = jnp.where(payback, jnp.minimum(s2, q_k * dp_k), 0.0)
        s2 = s2 - dq
        q_new = q_k - dq / dp_k
        return (s1, s2), q_new

    (_, _), q_rev2 = jax.lax.scan(bwd2, (s1f, s2f), (qk[::-1], dpk[::-1]))
    return jnp.moveaxis(q_rev2[::-1], 0, -1)


def _fix_water_vapor_down(q, dp):
    nz = q.shape[-1]
    kf = lambda a: jnp.moveaxis(a, -1, 0)  # noqa: E731
    qk = kf(q)
    dpk = kf(dp)
    # top
    q1 = jnp.where(qk[0] < 0.0, qk[1] + qk[0] * dpk[0] / dpk[1], qk[1])
    q0 = jnp.maximum(qk[0], 0.0)
    qk = jnp.concatenate([q0[None], q1[None], qk[2:]], 0)

    # forward pass k = 1..nz-2: borrow from above, push deficit below
    def fwd(carry, x):
        q_prev, dp_prev, low_prev = carry
        q_k, dp_k = x
        q_k = q_k + low_prev / dp_k
        can_up = jnp.logical_and(q_k < 0.0, q_prev > 0.0)
        dq = jnp.where(
            can_up, jnp.minimum(q_prev * dp_prev, -q_k * dp_k), 0.0
        )
        upper_fix = dq
        q_k = q_k + dq / dp_k
        still_neg = q_k < 0.0
        lower_fix = jnp.where(still_neg, q_k * dp_k, 0.0)
        q_k = jnp.where(still_neg, 0.0, q_k)
        return (q_k, dp_k, lower_fix), (q_k, upper_fix, lower_fix)

    (qm, _, low_last), (q_mid, upper_fix_mid, lower_fix_mid) = jax.lax.scan(
        fwd, (qk[0], dpk[0], jnp.zeros_like(qk[0])), (qk[1:nz - 1], dpk[1:nz - 1])
    )
    zeros = jnp.zeros_like(qk[0])
    qk = jnp.concatenate([qk[0][None], q_mid, qk[nz - 1][None]], 0)
    upper_fix = jnp.concatenate([zeros[None], upper_fix_mid, zeros[None]], 0)
    # account for borrows from above (single concat, not a full-stack DUS)
    qk = jnp.concatenate(
        [qk[:nz - 1] - upper_fix[1:] / dpk[:nz - 1], qk[nz - 1:]], 0
    )
    # bottom: add any deficit pushed down from nz-2
    q_bot = qk[nz - 1] + low_last / dpk[nz - 1]

    # redistribute bottom deficit from levels above (bottom-up)
    def up(carry, x):
        qbot = carry
        q_k, dp_k = x
        need = jnp.logical_and(qbot < 0.0, q_k > 0.0)
        dq = jnp.where(
            need, jnp.minimum(q_k * dp_k, -qbot * dpk[nz - 1]), 0.0
        )
        q_new = q_k - dq / dp_k
        qbot = qbot + dq / dpk[nz - 1]
        return qbot, q_new

    q_bot_final, q_above_rev = jax.lax.scan(
        up, q_bot, (qk[:nz - 1][::-1], dpk[:nz - 1][::-1])
    )
    qk = jnp.concatenate([q_above_rev[::-1], q_bot_final[None]], 0)
    return jnp.moveaxis(qk, 0, -1)


def _fix_neg_cloud(dp, q):
    nz = q.shape[-1]
    kf = lambda a: jnp.moveaxis(a, -1, 0)  # noqa: E731
    qk = kf(q)
    dpk = kf(dp)

    def fwd(carry, x):
        q_prev, dp_prev = carry
        q_k, dp_k = x
        q_k = jnp.where(
            q_prev < 0.0, q_k + q_prev * dp_prev / dp_k, q_k
        )
        return (q_k, dp_k), q_k

    (_, _), q_mid = jax.lax.scan(
        fwd, (qk[0], dpk[0]), (qk[1:nz - 1], dpk[1:nz - 1])
    )
    qk = jnp.concatenate(
        [qk[0][None], jnp.maximum(q_mid, 0.0), qk[nz - 1][None]], 0
    )
    # bottom fix
    need = jnp.logical_and(qk[nz - 1] < 0.0, qk[nz - 2] > 0.0)
    dq = jnp.where(
        need,
        jnp.minimum(-qk[nz - 1] * dpk[nz - 1], qk[nz - 2] * dpk[nz - 2]),
        0.0,
    )
    q_nz2 = qk[nz - 2] - dq / dpk[nz - 2]
    q_bot = jnp.where(
        need, jnp.maximum(qk[nz - 1] + dq / dpk[nz - 1], 0.0), qk[nz - 1]
    )
    qk = jnp.concatenate([qk[:nz - 2], q_nz2[None], q_bot[None]], 0)
    return jnp.moveaxis(qk, 0, -1)


def adjust_negative_tracers(tracers: dict, pt, delp):
    """Returns (tracers, pt)."""
    pt, qv, ql, qr, qs, qi, qg = _fix_neg_water(
        pt, tracers["qvapor"], tracers["qliquid"], tracers["qrain"],
        tracers["qsnow"], tracers["qice"], tracers["qgraupel"],
    )
    qg = _fillq(qg, delp)
    qr = _fillq(qr, delp)
    qv = _fix_water_vapor_down(qv, delp)
    qcld = _fix_neg_cloud(delp, tracers["qcld"])
    out = dict(tracers)
    out.update(
        qvapor=qv, qliquid=ql, qrain=qr, qsnow=qs, qice=qi, qgraupel=qg,
        qcld=qcld,
    )
    return out, pt
