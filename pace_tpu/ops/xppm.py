"""Piecewise-parabolic (PPM) advection fluxes along x and y.

jnp ports of ai2cm/pace fv3core/pace/fv3core/stencils/xppm.py / yppm.py
(`XPiecewiseParabolic`, `YPiecewiseParabolic`) with the shared limiter
functions from ppm.py.  The y-direction operator is the exact mirror of the
x-direction one, obtained by transposing the horizontal axes.

Supports hord/iord in {5, 6, 7} (monotone PPM variants via the smt5
advection mask) and 8 (non-monotone with standard constraint), which covers
every configuration the reference exercises.
"""

from __future__ import annotations

import jax.numpy as jnp

from pace_tpu.ops.stencil_utils import shift, sign
from pace_tpu.ops import stencil_utils as su

# volume-conserving cubic with 2nd derivative = 0 at end point (ppm.py)
C1 = -2.0 / 14.0
C2 = 11.0 / 14.0
C3 = 5.0 / 14.0
# PPM volume mean form
P1 = 7.0 / 12.0
P2 = -1.0 / 12.0
S11 = 11.0 / 14.0
S14 = 4.0 / 7.0
S15 = 3.0 / 14.0


def pert_ppm_standard_constraint(a0, al, ar):
    da1 = al - ar
    da2 = da1 ** 2
    a6da = 3.0 * (al + ar) * da1
    ar_new = jnp.where(a6da < -da2, -2.0 * al, ar)
    al_new = jnp.where(a6da > da2, -2.0 * ar, al)
    cross = al * ar < 0.0
    al_out = jnp.where(cross, al_new, 0.0)
    ar_out = jnp.where(cross, ar_new, 0.0)
    return al_out, ar_out


def _compute_al(q, dxa, n, h, iord):
    """PPM interface value; tile-edge one-sided variants at the 6 special
    interface columns (xppm.py compute_al)."""
    al = P1 * (shift(q, -1) + q) + P2 * (shift(q, -2) + shift(q, 1))
    cubic = C1 * shift(q, -2) + C2 * shift(q, -1) + C3 * q
    for i in (h - 1, h + n - 1):
        al = su.upd_cols(al, cubic, i)
    edge = 0.5 * (
        (
            (2.0 * shift(dxa, -1) + shift(dxa, -2)) * shift(q, -1)
            - shift(dxa, -1) * shift(q, -2)
        ) / (shift(dxa, -2) + shift(dxa, -1))
        + (
            (2.0 * dxa + shift(dxa, 1)) * q - dxa * shift(q, 1)
        ) / (dxa + shift(dxa, 1))
    )
    for i in (h, h + n):
        al = su.upd_cols(al, edge, i)
    cubic_rev = C3 * shift(q, -1) + C2 * q + C1 * shift(q, 1)
    for i in (h + 1, h + n + 1):
        al = su.upd_cols(al, cubic_rev, i)
    return al


def _fx1_fn(courant, br, b0, bl):
    return jnp.where(
        courant > 0.0,
        (1.0 - courant) * (shift(br, -1) - courant * shift(b0, -1)),
        (1.0 + courant) * (bl + courant * b0),
    )


def _dm_iord8plus(q):
    xt = 0.25 * (shift(q, 1) - shift(q, -1))
    dqr = jnp.maximum(jnp.maximum(q, shift(q, -1)), shift(q, 1)) - q
    dql = q - jnp.minimum(jnp.minimum(q, shift(q, -1)), shift(q, 1))
    return sign(jnp.minimum(jnp.minimum(jnp.abs(xt), dqr), dql), xt)


def _xt_dxa_edge_0(q, dxa, xt_minmax=True):
    xt = 0.5 * (
        ((2.0 * dxa + shift(dxa, -1)) * q - dxa * shift(q, -1))
        / (shift(dxa, -1) + dxa)
        + (
            (2.0 * shift(dxa, 1) + shift(dxa, 2)) * shift(q, 1)
            - shift(dxa, 1) * shift(q, 2)
        ) / (shift(dxa, 1) + shift(dxa, 2))
    )
    if xt_minmax:
        minq = jnp.minimum(
            jnp.minimum(jnp.minimum(shift(q, -1), q), shift(q, 1)), shift(q, 2)
        )
        maxq = jnp.maximum(
            jnp.maximum(jnp.maximum(shift(q, -1), q), shift(q, 1)), shift(q, 2)
        )
        xt = jnp.minimum(jnp.maximum(xt, minq), maxq)
    return xt


def _xt_dxa_edge_1(q, dxa, xt_minmax=True):
    xt = 0.5 * (
        (
            (2.0 * shift(dxa, -1) + shift(dxa, -2)) * shift(q, -1)
            - shift(dxa, -1) * shift(q, -2)
        ) / (shift(dxa, -2) + shift(dxa, -1))
        + ((2.0 * dxa + shift(dxa, 1)) * q - dxa * shift(q, 1))
        / (dxa + shift(dxa, 1))
    )
    if xt_minmax:
        minq = jnp.minimum(
            jnp.minimum(jnp.minimum(shift(q, -2), shift(q, -1)), q), shift(q, 1)
        )
        maxq = jnp.maximum(
            jnp.maximum(jnp.maximum(shift(q, -2), shift(q, -1)), q), shift(q, 1)
        )
        xt = jnp.minimum(jnp.maximum(xt, minq), maxq)
    return xt


def _compute_blbr_ord8plus(q, dxa, n, h, constraint_cols=None):
    dm = _dm_iord8plus(q)
    al = 0.5 * (shift(q, -1) + q) + (1.0 / 3.0) * (shift(dm, -1) - dm)
    xt2 = 2.0 * dm
    bl = -1.0 * sign(jnp.minimum(jnp.abs(xt2), jnp.abs(al - q)), xt2)
    br = sign(jnp.minimum(jnp.abs(xt2), jnp.abs(shift(al, 1) - q)), xt2)

    # edge overrides (xppm.py bl_br_edges)
    dm_left = _dm_of(shift(q, -1))
    dm_right = _dm_of(shift(q, 1))
    al_ip1 = shift(al, 1)

    xt_bl = jnp.zeros_like(q)
    xt_br = jnp.zeros_like(q)
    # i_start - 1
    e = S14 * dm_left + S11 * (shift(q, -1) - q) + q
    xt_bl = su.upd_cols(xt_bl, e, h - 1)
    e = _xt_dxa_edge_0(q, dxa)
    xt_br = su.upd_cols(xt_br, e, h - 1)
    # i_start
    e = _xt_dxa_edge_1(q, dxa)
    xt_bl = su.upd_cols(xt_bl, e, h)
    e = S15 * q + S11 * shift(q, 1) - S14 * dm_right
    xt_br = su.upd_cols(xt_br, e, h)
    # i_start + 1
    e = S15 * shift(q, -1) + S11 * q - S14 * dm
    xt_bl = su.upd_cols(xt_bl, e, h + 1)
    xt_br = su.upd_cols(xt_br, al_ip1, h + 1)
    # i_end - 1
    xt_bl = su.upd_cols(xt_bl, al, h + n - 2)
    e = S15 * shift(q, 1) + S11 * q + S14 * dm
    xt_br = su.upd_cols(xt_br, e, h + n - 2)
    # i_end
    e = S15 * q + S11 * shift(q, -1) + S14 * dm_left
    xt_bl = su.upd_cols(xt_bl, e, h + n - 1)
    e = _xt_dxa_edge_0(q, dxa)
    xt_br = su.upd_cols(xt_br, e, h + n - 1)
    # i_end + 1
    e = _xt_dxa_edge_1(q, dxa)
    xt_bl = su.upd_cols(xt_bl, e, h + n)
    e = S11 * (shift(q, 1) - q) - S14 * dm_right + q
    xt_br = su.upd_cols(xt_br, e, h + n)

    edge_cols = (h - 1, h, h + 1, h + n - 2, h + n - 1, h + n)
    bl_e = xt_bl - q
    br_e = xt_br - q
    for i in edge_cols:
        bl = su.upd_cols(bl, bl_e, i)
        br = su.upd_cols(br, br_e, i)
    if constraint_cols is None:
        constraint_cols = edge_cols
    bl_c, br_c = pert_ppm_standard_constraint(q, bl, br)
    for i in constraint_cols:
        bl = su.upd_cols(bl, bl_c, i)
        br = su.upd_cols(br, br_c, i)
    return bl, br


def _dm_of(qs):
    xt = 0.25 * (shift(qs, 1) - shift(qs, -1))
    dqr = jnp.maximum(jnp.maximum(qs, shift(qs, -1)), shift(qs, 1)) - qs
    dql = qs - jnp.minimum(jnp.minimum(qs, shift(qs, -1)), shift(qs, 1))
    return sign(jnp.minimum(jnp.minimum(jnp.abs(xt), dqr), dql), xt)


def x_flux(q, courant, dxa, n, h, iord):
    """PPM flux of q across x-interfaces given interface courant numbers.

    Valid wherever the 4-cell stencil of q is valid; tile-edge variants are
    applied at the 6 special interface columns.
    """
    mord = abs(iord)
    if mord < 8:
        al = _compute_al(q, dxa, n, h, iord)
        bl = al - q
        br = shift(al, 1) - q
        b0 = bl + br
        if mord == 5:
            smt5 = bl * br < 0.0
        else:
            smt5 = (3.0 * jnp.abs(b0)) < jnp.abs(bl - br)
        mask = jnp.where(jnp.logical_or(shift(smt5, -1), smt5), 1.0, 0.0)
        fx1 = _fx1_fn(courant, br, b0, bl)
        return jnp.where(
            courant > 0.0, shift(q, -1) + fx1 * mask, q + fx1 * mask
        )
    else:
        bl, br = _compute_blbr_ord8plus(q, dxa, n, h)
        b0 = bl + br
        fx1 = _fx1_fn(courant, br, b0, bl)
        return jnp.where(courant > 0.0, shift(q, -1) + fx1, q + fx1)


def _t(q):
    return jnp.swapaxes(q, 1, 2)


def y_flux(q, courant, dya, n, h, jord):
    """PPM flux across y-interfaces: exact mirror of x_flux."""
    return _t(x_flux(_t(q), _t(courant), _t(dya), n, h, jord))
