"""Pallas TPU kernel for fillz (negative-tracer mass borrowing).

The jnp fix_tracer (ops/fillz.py) runs the sequential forward borrow
pass as a lax.scan over k (per tracer, with k-first transposes); here
the whole fix — top fix, forward borrow, bottom fix, and the
column-sum rescale — runs in VMEM per (tile, i-row-chunk) block with k
on sublanes, j vectorized on lanes.  Stacked tracers batch via
jax.vmap (leading grid dimension).

Reference: ai2cm/pace fv3core/pace/fv3core/stencils/fillz.py
`FillNegativeTracerValues` (fix_top/fix_interior/fix_bottom + the
final positive-definite rescale).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def enabled(dtype=None, ni: int = 0) -> bool:
    """Default ON for f32 on TPU at C96 and larger (storage ni >= 100);
    PACE_PALLAS_FILLZ=1/0 forces either way (f64 always takes the jnp
    path; Mosaic has no 64-bit).

    Measured on-chip (full dycore step): at C48 the whole-column kernel
    LOSES badly (147.7 vs 100.5 ms, flag matrix r5) — the per-block
    launches don't amortize at 56x56 tiles — but at C96 it WINS
    (410.8 vs 426.2 ms, 2026-08-21): columns per core grow 4x while the
    scan path's per-iteration overhead is resolution-independent.
    Numerics pinned by tests/test_fillz_pallas.py."""
    if dtype is not None and jnp.dtype(dtype).itemsize >= 8:
        return False
    env = os.environ.get("PACE_PALLAS_FILLZ")
    if env is not None:
        return env == "1"
    return ni >= 100 and jax.default_backend() == "tpu"


def _pick_xb(ni: int) -> int:
    for xb in (8, 4, 2, 1):
        if ni % xb == 0:
            return xb
    return 1


def _kernel(q_ref, dp_ref, out_ref, qs, ufix, lfix, zfix, *, nz: int):
    q = q_ref[...]
    dp = dp_ref[...]

    # ---- fix_top
    q1 = jnp.where(q[:, 0] < 0.0, q[:, 1] + q[:, 0] * dp[:, 0] / dp[:, 1],
                   q[:, 1])
    q0 = jnp.maximum(q[:, 0], 0.0)
    qs[:, 0] = q0
    qs[:, 1] = q1
    z = jnp.zeros_like(q0)
    ufix[:, 0] = z
    lfix[:, 0] = z
    zfix[:, 0] = z
    ufix[:, nz - 1] = z
    lfix[:, nz - 1] = z
    zfix[:, nz - 1] = z

    # ---- fix_interior: forward borrow k = 1..nz-2 (carry = staged k-1
    # value + its dp + the lower_fix owed by level k)
    def body(k, carry):
        # dynamic k reads ride the refs (dynamic value indexing lowers
        # to dynamic_slice, which Mosaic does not implement in-kernel)
        q_prev, dp_prev, low_prev = carry
        q_k = qs[:, k]  # staged (k==1 from fix_top; else original)
        q_k = jnp.where(k == 1, q_k, q_ref[:, k])
        dp_k = dp_ref[:, k]
        q_next_orig = q_ref[:, k + 1]
        dp_next = dp_ref[:, k + 1]
        q_k = jnp.where(low_prev != 0.0, q_k - low_prev / dp_k, q_k)
        neg0 = q_k < 0.0
        can_up = jnp.logical_and(neg0, q_prev > 0.0)
        dq_up = jnp.minimum(q_prev * dp_prev, -(q_k * dp_k))
        q_k1 = jnp.where(can_up, q_k + dq_up / dp_k, q_k)
        ufix[:, k] = jnp.where(can_up, dq_up, 0.0)
        still_neg = jnp.logical_and(q_k1 < 0.0, q_next_orig > 0.0)
        dq_lo = jnp.minimum(q_next_orig * dp_next, -(q_k1 * dp_k))
        q_k2 = jnp.where(still_neg, q_k1 + dq_lo / dp_k, q_k1)
        low_k = jnp.where(still_neg, dq_lo, 0.0)
        lfix[:, k] = low_k
        zfix[:, k] = neg0.astype(q_k.dtype)
        qs[:, k] = q_k2
        return (q_k2, dp_k, low_k)

    jax.lax.fori_loop(1, nz - 1, body,
                      (q0, dp[:, 0], jnp.zeros_like(q0)), unroll=False)
    qs[:, nz - 1] = q[:, nz - 1]

    # ---- account for upward borrows: q_k -= ufix[k+1]/dp_k, k < nz-1
    qv = qs[...]
    uv = ufix[...]
    q_upd = qv[:, : nz - 1] - uv[:, 1:] / dp[:, : nz - 1]
    qs[:, : nz - 1] = q_upd

    # ---- fix_bottom
    lf = lfix[...]
    q_bot = qs[:, nz - 1]
    q_bot = jnp.where(lf[:, nz - 2] != 0.0,
                      q_bot - lf[:, nz - 2] / dp[:, nz - 1], q_bot)
    q_up = qs[:, nz - 2]
    qup = q_up * dp[:, nz - 2]
    qly = -q_bot * dp[:, nz - 1]
    dup = jnp.minimum(qup, qly)
    bot_fix = jnp.logical_and(q_bot < 0.0, q_up > 0.0)
    q_bot = jnp.where(bot_fix, q_bot + dup / dp[:, nz - 1], q_bot)
    qs[:, nz - 2] = jnp.where(bot_fix, q_up - dup / dp[:, nz - 2], q_up)
    qs[:, nz - 1] = q_bot
    zfix[:, nz - 1] = bot_fix.astype(q_bot.dtype)

    # ---- positive-definite rescale over k = 1..nz-1
    qv = qs[...]
    dm = qv * dp
    dm_pos = jnp.maximum(dm, 0.0)
    sum0 = jnp.sum(dm[:, 1:], axis=1, keepdims=True)
    sum1 = jnp.sum(dm_pos[:, 1:], axis=1, keepdims=True)
    any_zfix = jnp.max(zfix[...], axis=1, keepdims=True) > 0.0
    fac = jnp.where(sum0 > 0.0,
                    sum0 / jnp.where(sum1 == 0.0, 1.0, sum1), 0.0)
    apply = jnp.logical_and(any_zfix, fac > 0.0)
    q_final = jnp.where(apply, jnp.maximum(fac * dm / dp, 0.0), qv)
    out_ref[:, :1] = qv[:, :1]
    out_ref[:, 1:] = q_final[:, 1:]


def fix_tracer_pallas(q, dp, interpret: bool = False):
    """Drop-in for fillz.fix_tracer: q/dp (6, Ni, Nj, nz) k-last."""
    from pace_tpu.ops.pallas._lanes import pad_lanes

    six, ni, nj, nz = q.shape
    dtype = q.dtype
    XB = _pick_xb(ni)

    def to_kj(x):
        return jnp.swapaxes(x, -1, -2)

    # lane axis must be 128-aligned for the dynamic-k ref reads (_lanes)
    qp, _ = pad_lanes(to_kj(q))
    dpp, _ = pad_lanes(to_kj(dp))
    njp = qp.shape[-1]
    # one 128-lane tile per block (same constraint as sim1_pallas: with
    # njp > 128 Mosaic rejects the dynamic sublane slices)
    LB = min(njp, 128)

    def spec():
        return pl.BlockSpec(
            (1, XB, nz, LB),
            (lambda t, c, j: (t, c, 0, j)),
            memory_space=pltpu.VMEM,
        )

    out = pl.pallas_call(
        lambda qr, dr, orf, qsr, ur, lr, zr: _kernel(
            qr.at[0], dr.at[0], orf.at[0], qsr, ur, lr, zr, nz=nz),
        grid=(six, ni // XB, njp // LB),
        in_specs=[spec(), spec()],
        out_specs=spec(),
        out_shape=jax.ShapeDtypeStruct((six, ni, nz, njp), dtype),
        scratch_shapes=[
            pltpu.VMEM((XB, nz, LB), dtype),  # qs staged values
            pltpu.VMEM((XB, nz, LB), dtype),  # upper_fix
            pltpu.VMEM((XB, nz, LB), dtype),  # lower_fix
            pltpu.VMEM((XB, nz, LB), dtype),  # zfix flags
        ],
        interpret=interpret,
    )(qp, dpp)
    return to_kj(out[..., :nj])
