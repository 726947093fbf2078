"""Pallas TPU kernel for the remap-profile cubic-spline interface solve.

_spline_interfaces (ops/remap_profile.py) is the only sequential part of
the PPM vertical reconstruction: a tridiagonal solve per column run as
two lax.scans over k (with k-first transposes), per remapped field — 13
fields per vertical remap.  This kernel runs the forward elimination and
backward substitution in VMEM per (tile, i-row-chunk) block, k on
sublanes, j vectorized on lanes, exactly like the SIM1 kernel
(sim1_pallas.py).  Batched fields ride jax.vmap, which maps to a leading
grid dimension.

Reference: ai2cm/pace fv3core/pace/fv3core/stencils/remap_profile.py
set_initial_vals (:60-160).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def enabled(dtype=None) -> bool:
    """Opt-in via PACE_PALLAS_SPLINE=1 (f32 only; Mosaic has no 64-bit).
    REJECTED as a default: the on-chip flag matrix (2026-08-19, C48/79
    f32) measured 150.97 ms/step vs 115.56 baseline — the whole-column
    kernel serializes work XLA otherwise overlaps.  Kept for the
    numerics pin (tests/test_spline_pallas.py) and future retuning."""
    if dtype is not None and jnp.dtype(dtype).itemsize >= 8:
        return False
    return os.environ.get("PACE_PALLAS_SPLINE") == "1"


def _pick_xb(ni: int) -> int:
    for xb in (8, 4, 2, 1):
        if ni % xb == 0:
            return xb
    return 1


def _kernel(a_ref, dp_ref, qs_ref, q_ref, gam_ref, *, nz: int, iv: int):
    """One (XB, nz, Nj) block: spline interface solve.

    Outputs: q (XB, nz+1, Nj) interface values, gam (XB, nz+1, Nj)
    elimination coefficients (consumed by the iv==-2 caller)."""
    a = a_ref[...]
    dp = dp_ref[...]
    qs = qs_ref[...][:, 0]  # (XB, Nj)

    if iv == -2:
        q0 = 1.5 * a[:, 0]
        gam1 = jnp.full_like(q0, 0.5)
        gr1 = dp[:, 0] / dp[:, 1]
        bet1 = 2.0 + gr1 + gr1 - gam1
        q1 = (3.0 * (a[:, 0] + a[:, 1]) - q0) / bet1
        q_ref[:, 0] = q0
        q_ref[:, 1] = q1
        gam_ref[:, 0] = jnp.zeros_like(q0)
        gam_ref[:, 1] = gam1

        def fwd(k, carry):
            # k = 2..nz-1; carry = (q_prev, gam_prev).  All k-indexed
            # reads go through the REFS: a dynamic index on a value
            # lowers to dynamic_slice, which Mosaic does not implement
            # inside a kernel; dynamic sublane ref loads are supported.
            q_prev, gam_prev = carry
            old_gr = dp_ref[:, k - 2] / dp_ref[:, k - 1]
            old_bet = 2.0 + old_gr + old_gr - gam_prev
            gam_k = old_gr / old_bet
            gr = dp_ref[:, k - 1] / dp_ref[:, k]
            bet = 2.0 + gr + gr - gam_k
            is_last = (k == nz - 1).astype(a.dtype)
            q_k = (
                3.0 * (a_ref[:, k - 1] + a_ref[:, k])
                - is_last * gr * qs - q_prev
            ) / bet
            q_ref[:, k] = q_k
            gam_ref[:, k] = gam_k
            return (q_k, gam_k)

        jax.lax.fori_loop(2, nz, fwd, (q1, gam1), unroll=False)
        q_ref[:, nz] = qs
        gam_ref[:, nz] = jnp.zeros_like(q0)

        # backward: q_k -= gam_{k+1} * q_{k+1}, k = nz-2..0
        def bwd(m, _):
            k = nz - 2 - m
            q_ref[:, k] = q_ref[:, k] - gam_ref[:, k + 1] * q_ref[:, k + 1]
            return 0

        jax.lax.fori_loop(0, nz - 1, bwd, 0, unroll=False)
        return

    # iv != -2 branch (set_initial_vals general case)
    gr0 = dp[:, 1] / dp[:, 0]
    bet0 = gr0 * (gr0 + 0.5)
    q0 = ((gr0 + gr0) * (gr0 + 1.0) * a[:, 0] + a[:, 1]) / bet0
    gam0 = (1.0 + gr0 * (gr0 + 1.5)) / bet0
    q_ref[:, 0] = q0
    gam_ref[:, 0] = gam0

    def fwd(k, carry):
        # k = 1..nz-1; scan body with xs index m = k-1.  Reads ride the
        # refs (dynamic value indexing has no Mosaic lowering).
        q_prev, gam_prev = carry
        d4 = dp_ref[:, k - 1] / dp_ref[:, k]
        bet = 2.0 + d4 + d4 - gam_prev
        q_k = (3.0 * (a_ref[:, k - 1] + d4 * a_ref[:, k]) - q_prev) / bet
        gam_k = d4 / bet
        q_ref[:, k] = q_k
        gam_ref[:, k] = gam_k
        return (q_k, gam_k)

    q_last, gam_last = jax.lax.fori_loop(
        1, nz, fwd, (q0, gam0), unroll=False
    )
    d4 = dp[:, nz - 2] / dp[:, nz - 1]
    a_bot = 1.0 + d4 * (d4 + 1.5)
    q_bot = (
        2.0 * d4 * (d4 + 1.0) * a[:, nz - 1] + a[:, nz - 2]
        - a_bot * q_last
    ) / (d4 * (d4 + 0.5) - a_bot * gam_last)
    q_ref[:, nz] = q_bot
    gam_ref[:, nz] = jnp.zeros_like(q0)

    # backward: q_k -= gam_k * q_{k+1}, k = nz-1..0
    def bwd(m, _):
        k = nz - 1 - m
        q_ref[:, k] = q_ref[:, k] - gam_ref[:, k] * q_ref[:, k + 1]
        return 0

    jax.lax.fori_loop(0, nz, bwd, 0, unroll=False)


def spline_interfaces_pallas(a1, delp, qs, iv: int,
                             interpret: bool = False):
    """Drop-in for _spline_interfaces: a1/delp (6, Ni, Nj, nz); qs
    (6, Ni, Nj).  Returns (q (…, nz+1), gam (…, nz+1)) in k-last layout.

    Note: in the iv==-2 branch the scan path returns gam shifted by one
    (gam[k] = elimination coeff of ROW k); this kernel stores the same
    convention (gam_ref[:, k] holds the coefficient used by row k)."""
    from pace_tpu.ops.pallas._lanes import pad_lanes

    six, ni, nj, nz = a1.shape
    dtype = a1.dtype
    XB = _pick_xb(ni)

    def to_kj(q):
        return jnp.swapaxes(q, -1, -2)

    # lane axis must be 128-aligned for the dynamic-k ref reads (_lanes);
    # delp is the divisor, edge replication keeps it nonzero
    ins = [pad_lanes(to_kj(a1))[0], pad_lanes(to_kj(delp))[0],
           pad_lanes(qs[:, :, None, :])[0]]
    njp = ins[0].shape[-1]

    def spec(kdim):
        return pl.BlockSpec(
            (1, XB, kdim, njp),
            (lambda t, c: (t, c, 0, 0)),
            memory_space=pltpu.VMEM,
        )

    q_o, gam_o = pl.pallas_call(
        lambda ar, dr, qsr, qr, gr: _kernel(
            ar.at[0], dr.at[0], qsr.at[0], qr.at[0], gr.at[0],
            nz=nz, iv=iv,
        ),
        grid=(six, ni // XB),
        in_specs=[spec(nz), spec(nz), spec(1)],
        out_specs=[spec(nz + 1), spec(nz + 1)],
        out_shape=[
            jax.ShapeDtypeStruct((six, ni, nz + 1, njp), dtype),
            jax.ShapeDtypeStruct((six, ni, nz + 1, njp), dtype),
        ],
        interpret=interpret,
    )(*ins)
    return to_kj(q_o[..., :nj]), to_kj(gam_o[..., :nj])
