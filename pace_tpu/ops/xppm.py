"""Piecewise-parabolic (PPM) advection fluxes along x and y.

jnp ports of ai2cm/pace fv3core/pace/fv3core/stencils/xppm.py / yppm.py
(`XPiecewiseParabolic`, `YPiecewiseParabolic`) with the shared limiter
functions from ppm.py.  Both directions run axis-natively on the
(6, N, N, nz) layout — the y-direction operator is the same code with the
shift/edge-update axis switched, NOT a transpose of the x operator
(physical transposes relayout sublanes on TPU and dominated the transport
cost).

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


def _ax_ops(axis: int):
    """(shift-along-axis, update-static-lines-along-axis) helper pair for
    the global (6, N, N, ...) layout.  The PPM math below is written against
    this injected pair so Pallas kernels can run the identical code on
    VMEM-resident blocks by passing their own (sh, upd)."""
    if axis == 1:
        return (lambda q, d: shift(q, d)), su.upd_cols
    return (lambda q, d: shift(q, 0, d)), su.upd_rows


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


def _compute_al(q, dxa, n, h, iord, sh, upd):
    """PPM interface value; tile-edge one-sided variants at the 6 special
    interface lines (xppm.py compute_al)."""
    al = P1 * (sh(q, -1) + q) + P2 * (sh(q, -2) + sh(q, 1))
    cubic = C1 * sh(q, -2) + C2 * sh(q, -1) + C3 * q
    for i in (h - 1, h + n - 1):
        al = upd(al, cubic, i)
    edge = 0.5 * (
        (
            (2.0 * sh(dxa, -1) + sh(dxa, -2)) * sh(q, -1)
            - sh(dxa, -1) * sh(q, -2)
        ) / (sh(dxa, -2) + sh(dxa, -1))
        + (
            (2.0 * dxa + sh(dxa, 1)) * q - dxa * sh(q, 1)
        ) / (dxa + sh(dxa, 1))
    )
    for i in (h, h + n):
        al = upd(al, edge, i)
    cubic_rev = C3 * sh(q, -1) + C2 * q + C1 * sh(q, 1)
    for i in (h + 1, h + n + 1):
        al = upd(al, cubic_rev, i)
    return al


def _fx1_fn(courant, br, b0, bl, sh):
    return jnp.where(
        courant > 0.0,
        (1.0 - courant) * (sh(br, -1) - courant * sh(b0, -1)),
        (1.0 + courant) * (bl + courant * b0),
    )


def _dm_iord8plus(q, sh):
    xt = 0.25 * (sh(q, 1) - sh(q, -1))
    dqr = jnp.maximum(jnp.maximum(q, sh(q, -1)), sh(q, 1)) - q
    dql = q - jnp.minimum(jnp.minimum(q, sh(q, -1)), sh(q, 1))
    return sign(jnp.minimum(jnp.minimum(jnp.abs(xt), dqr), dql), xt)


def _xt_dxa_edge_0(q, dxa, sh, xt_minmax=True):
    xt = 0.5 * (
        ((2.0 * dxa + sh(dxa, -1)) * q - dxa * sh(q, -1))
        / (sh(dxa, -1) + dxa)
        + (
            (2.0 * sh(dxa, 1) + sh(dxa, 2)) * sh(q, 1)
            - sh(dxa, 1) * sh(q, 2)
        ) / (sh(dxa, 1) + sh(dxa, 2))
    )
    if xt_minmax:
        minq = jnp.minimum(
            jnp.minimum(jnp.minimum(sh(q, -1), q), sh(q, 1)), sh(q, 2)
        )
        maxq = jnp.maximum(
            jnp.maximum(jnp.maximum(sh(q, -1), q), sh(q, 1)), sh(q, 2)
        )
        xt = jnp.minimum(jnp.maximum(xt, minq), maxq)
    return xt


def _xt_dxa_edge_1(q, dxa, sh, xt_minmax=True):
    xt = 0.5 * (
        (
            (2.0 * sh(dxa, -1) + sh(dxa, -2)) * sh(q, -1)
            - sh(dxa, -1) * sh(q, -2)
        ) / (sh(dxa, -2) + sh(dxa, -1))
        + ((2.0 * dxa + sh(dxa, 1)) * q - dxa * sh(q, 1))
        / (dxa + sh(dxa, 1))
    )
    if xt_minmax:
        minq = jnp.minimum(
            jnp.minimum(jnp.minimum(sh(q, -2), sh(q, -1)), q), sh(q, 1)
        )
        maxq = jnp.maximum(
            jnp.maximum(jnp.maximum(sh(q, -2), sh(q, -1)), q), sh(q, 1)
        )
        xt = jnp.minimum(jnp.maximum(xt, minq), maxq)
    return xt


def _compute_blbr_ord8plus(q, dxa, n, h, sh, upd, constraint_cols=None):
    dm = _dm_iord8plus(q, sh)
    al = 0.5 * (sh(q, -1) + q) + (1.0 / 3.0) * (sh(dm, -1) - dm)
    xt2 = 2.0 * dm
    bl = -1.0 * sign(jnp.minimum(jnp.abs(xt2), jnp.abs(al - q)), xt2)
    br = sign(jnp.minimum(jnp.abs(xt2), jnp.abs(sh(al, 1) - q)), xt2)

    # edge overrides (xppm.py bl_br_edges)
    dm_left = _dm_iord8plus(sh(q, -1), sh)
    dm_right = _dm_iord8plus(sh(q, 1), sh)
    al_ip1 = sh(al, 1)

    xt_bl = jnp.zeros_like(q)
    xt_br = jnp.zeros_like(q)
    # i_start - 1
    e = S14 * dm_left + S11 * (sh(q, -1) - q) + q
    xt_bl = upd(xt_bl, e, h - 1)
    e = _xt_dxa_edge_0(q, dxa, sh)
    xt_br = upd(xt_br, e, h - 1)
    # i_start
    e = _xt_dxa_edge_1(q, dxa, sh)
    xt_bl = upd(xt_bl, e, h)
    e = S15 * q + S11 * sh(q, 1) - S14 * dm_right
    xt_br = upd(xt_br, e, h)
    # i_start + 1
    e = S15 * sh(q, -1) + S11 * q - S14 * dm
    xt_bl = upd(xt_bl, e, h + 1)
    xt_br = upd(xt_br, al_ip1, h + 1)
    # i_end - 1
    xt_bl = upd(xt_bl, al, h + n - 2)
    e = S15 * sh(q, 1) + S11 * q + S14 * dm
    xt_br = upd(xt_br, e, h + n - 2)
    # i_end
    e = S15 * q + S11 * sh(q, -1) + S14 * dm_left
    xt_bl = upd(xt_bl, e, h + n - 1)
    e = _xt_dxa_edge_0(q, dxa, sh)
    xt_br = upd(xt_br, e, h + n - 1)
    # i_end + 1
    e = _xt_dxa_edge_1(q, dxa, sh)
    xt_bl = upd(xt_bl, e, h + n)
    e = S11 * (sh(q, 1) - q) - S14 * dm_right + q
    xt_br = upd(xt_br, e, h + n)

    edge_cols = (h - 1, h, h + 1, h + n - 2, h + n - 1, h + n)
    bl_e = xt_bl - q
    br_e = xt_br - q
    for i in edge_cols:
        bl = upd(bl, bl_e, i)
        br = upd(br, br_e, i)
    if constraint_cols is None:
        constraint_cols = edge_cols
    bl_c, br_c = pert_ppm_standard_constraint(q, bl, br)
    for i in constraint_cols:
        bl = upd(bl, bl_c, i)
        br = upd(br, br_c, i)
    return bl, br


def _flux_core(q, courant, dgrid, n, h, ord_, sh, upd):
    mord = abs(ord_)
    if mord < 8:
        al = _compute_al(q, dgrid, n, h, ord_, sh, upd)
        bl = al - q
        br = sh(al, 1) - q
        b0 = bl + br
        # smt5 as 0/1 floats, not bool: Mosaic cannot shift (concatenate)
        # i1 vectors, and max() of indicators == logical or
        if mord == 5:
            smt5 = (bl * br < 0.0).astype(q.dtype)
        else:
            smt5 = ((3.0 * jnp.abs(b0)) < jnp.abs(bl - br)).astype(q.dtype)
        mask = jnp.maximum(sh(smt5, -1), smt5)
        fx1 = _fx1_fn(courant, br, b0, bl, sh)
        return jnp.where(
            courant > 0.0, sh(q, -1) + fx1 * mask, q + fx1 * mask
        )
    else:
        bl, br = _compute_blbr_ord8plus(q, dgrid, n, h, sh, upd)
        b0 = bl + br
        fx1 = _fx1_fn(courant, br, b0, bl, sh)
        return jnp.where(courant > 0.0, sh(q, -1) + fx1, q + fx1)


def x_flux(q, courant, dxa, n, h, iord):
    """PPM flux of q across x-interfaces given interface courant numbers.

    Valid wherever the 4-cell stencil of q is valid; tile-edge variants are
    applied at the 6 special interface columns.
    """
    sh, upd = _ax_ops(1)
    return _flux_core(q, courant, dxa, n, h, iord, sh, upd)


def y_flux(q, courant, dya, n, h, jord):
    """PPM flux across y-interfaces: the x operator with the axis switched."""
    sh, upd = _ax_ops(2)
    return _flux_core(q, courant, dya, n, h, jord, sh, upd)
