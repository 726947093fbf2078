"""Fused Pallas TPU kernel for the SIM1 semi-implicit vertical solver.

The jnp sim1_solver (ops/riemann.py) runs 4 sequential tridiagonal
elimination/substitution `lax.scan`s over k plus ~10 whole-array
transposes to the k-first layout; on TPU every scan iteration round-trips
its (6, N, N) slabs through HBM.  Here the entire solve runs inside one
Pallas kernel per (tile, i-row-chunk) block with EVERYTHING resident in
VMEM: k is the sublane axis, the j-row is the vectorized lane axis, and
the k-recurrences become fori_loops over VMEM scratch rows — zero HBM
traffic between elimination passes.

Layout contract: the caller feeds (6, Ni, nz[+1], Nj) arrays (k and j
swapped relative to the model's k-last layout); sim1_solver does the two
minor-axis transposes around the call (they replace the ~10 k-first
moveaxis calls of the scan path).

Reference semantics: ai2cm/pace fv3core/pace/fv3core/stencils/
sim1_solver.py (the Thomas-algorithm forward/backward passes, the w
solve with surface coupling, and the dz equation-of-state update).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pace_tpu.utils import constants


def enabled(dtype=None) -> bool:
    """Default ON for f32 on TPU (PACE_PALLAS_SIM1=0 disables): the
    on-chip flag matrix (2026-08-19, C48/79 f32, 10-step mean) measured
    114.06 ms/step vs 115.56 baseline with digests matching at f32
    rounding level.  f64 always takes the scan path (Mosaic has no
    64-bit support); numerics are pinned against the scan path in
    tests/test_sim1_pallas.py."""
    if dtype is not None and jnp.dtype(dtype).itemsize >= 8:
        return False
    env = os.environ.get("PACE_PALLAS_SIM1")
    if env is not None:
        return env == "1"
    return jax.default_backend() == "tpu"


def _pick_xb(ni: int) -> int:
    for xb in (8, 4, 2, 1):
        if ni % xb == 0:
            return xb
    return 1


def _kernel(w_ref, dm_ref, gm_ref, dz_ref, pt_ref, pm_ref, pem_ref,
            ws_ref, w_out_ref, dz_out_ref, pe_out_ref,
            pp, gam, aa, wbuf, gam2, grf, bbr, ddr,
            *, nz: int, dt: float, p_fac: float):
    """One (XB, nz[+1], Nj) block: full SIM1 solve in VMEM.

    Scratch (VMEM): pp/gam (XB, nz+1, Nj); aa/wbuf/gam2/grf/bbr/ddr
    (XB, nz, Nj).  All dynamic k-indexed reads inside the fori_loops go
    through refs: a dynamic index on a VALUE lowers to dynamic_slice,
    which Mosaic has no in-kernel lowering for; dynamic sublane ref
    loads/stores are supported.
    """
    t1g = 2.0 * dt * dt
    rdt = 1.0 / dt

    w1 = w_ref[...]
    dm = dm_ref[...]
    gm = gm_ref[...]
    dz = dz_ref[...]
    pt = pt_ref[...]
    pm = pm_ref[...]

    # perturbation pressure from the equation of state
    pe_l = jnp.exp(gm * jnp.log(-dm / dz * constants.RDGAS * pt)) - pm

    # tridiagonal setup (g_rat/bb/dd on layers; last row special)
    g_rat = dm[:, :-1] / dm[:, 1:]                       # (XB, nz-1, Nj)
    bb = 2.0 * (1.0 + g_rat)
    dd = 3.0 * (pe_l[:, :-1] + g_rat * pe_l[:, 1:])
    zrow = jnp.zeros_like(g_rat[:, :1])
    grf[...] = jnp.concatenate([g_rat, zrow], 1)          # (XB, nz, Nj)
    bbr[...] = jnp.concatenate([bb, jnp.full_like(zrow, 2.0)], 1)
    ddr[...] = jnp.concatenate([dd, 3.0 * pe_l[:, -1:]], 1)

    # ---- forward elimination for pp (k = 1..nz), carry (bet, prev pp)
    pp[:, 0] = jnp.zeros_like(pp[:, 0])
    gam[:, 0] = jnp.zeros_like(gam[:, 0])

    def fwd(k, bet):
        # xs index m = k-1; bb[k] for k = nz is bb[nz-1] (unused padding)
        g_prev = grf[:, k - 1]
        d_prev = ddr[:, k - 1]
        b_cur = bbr[:, jnp.minimum(k, nz - 1)]
        gam_k = g_prev / bet
        pp_k = (d_prev - pp[:, k - 1]) / bet
        pp[:, k] = pp_k
        gam[:, k] = gam_k
        return b_cur - gam_k

    jax.lax.fori_loop(1, nz + 1, fwd, bbr[:, 0], unroll=False)

    # ---- backward substitution: pp_k -= gam_k * pp_{k+1}, k = nz-1..1
    def bwd(m, _):
        k = nz - 1 - m
        pp[:, k] = pp[:, k] - gam[:, k] * pp[:, k + 1]
        return 0

    jax.lax.fori_loop(0, nz - 1, bwd, 0, unroll=False)

    # ---- aa_k for k in [1, nz) (aa[0] unused, set 0)
    pem = pem_ref[...]
    ppv = pp[...]
    aa_mid = (
        t1g * 0.5 * (gm[:, :-1] + gm[:, 1:]) / (dz[:, :-1] + dz[:, 1:])
        * (pem[:, 1:nz] + ppv[:, 1:nz])
    )
    aa[...] = jnp.concatenate([jnp.zeros_like(aa_mid[:, :1]), aa_mid], 1)

    p1_last = t1g * gm[:, nz - 1] / dz[:, nz - 1] * (pem[:, nz] + ppv[:, nz])

    # ---- w solve, forward (carry bet)
    bet0 = dm[:, 0] - aa[:, 1]
    wbuf[:, 0] = (dm[:, 0] * w1[:, 0] + dt * ppv[:, 1]) / bet0
    gam2[:, 0] = jnp.zeros_like(gam2[:, 0])
    ws = ws_ref[...]  # (XB, 1, Nj)

    def wfwd(k, bet):
        aak = aa[:, k]
        last = k == nz - 1
        aak1 = jnp.where(last, p1_last, aa[:, jnp.minimum(k + 1, nz - 1)])
        extra = jnp.where(last, p1_last * ws[:, 0], 0.0)
        gam2_k = aak / bet
        dmk = dm_ref[:, k]
        bet_k = dmk - (aak + aak1 + aak * gam2_k)
        w_k = (
            dmk * w_ref[:, k] + dt * (pp[:, k + 1] - pp[:, k])
            - extra - aak * wbuf[:, k - 1]
        ) / bet_k
        wbuf[:, k] = w_k
        gam2[:, k] = gam2_k
        return bet_k

    jax.lax.fori_loop(1, nz, wfwd, bet0, unroll=False)

    # ---- back substitution: w_k -= gam2_{k+1} * w_{k+1}, k = nz-2..0
    def wbwd(m, _):
        k = nz - 2 - m
        wbuf[:, k] = wbuf[:, k] - gam2[:, k + 1] * wbuf[:, k + 1]
        return 0

    jax.lax.fori_loop(0, nz - 1, wbwd, 0, unroll=False)

    w_out = wbuf[...]
    w_out_ref[...] = w_out

    # ---- pe on interfaces: cumulative sum of mass-weighted dw along the
    # k sublane axis.  jnp.cumsum has no Mosaic TC lowering (and a
    # triangular-matmul form would need an in-kernel transpose, another
    # lowering gap), so run the recurrence through refs: aa is free after
    # the w solve — stash dwe there and accumulate row-by-row into
    # pe_out_ref (dynamic sublane ref indexing is supported).
    aa[...] = dm * (w_out - w1) * rdt  # dwe
    pe_out_ref[:, 0] = jnp.zeros_like(aa[:, 0])

    def pesum(k, _):
        pe_out_ref[:, k] = pe_out_ref[:, k - 1] + aa[:, k - 1]
        return 0

    jax.lax.fori_loop(1, nz + 1, pesum, 0, unroll=False)

    # ---- p1 backward recurrence for the dz update (reuse pp as scratch;
    # pe reads ride pe_out_ref — written just above — since dynamic
    # value indexing has no Mosaic lowering)
    pp[:, nz - 1] = (
        pe_out_ref[:, nz - 1] + 2.0 * pe_out_ref[:, nz]
    ) / 3.0

    def p1bwd(m, _):
        k = nz - 2 - m
        pp[:, k] = (
            pe_out_ref[:, k] + bbr[:, k] * pe_out_ref[:, k + 1]
            + grf[:, k] * pe_out_ref[:, k + 2]
        ) / 3.0 - grf[:, k] * pp[:, k + 1]
        return 0

    jax.lax.fori_loop(0, nz - 1, p1bwd, 0, unroll=False)

    p1 = pp[:, :nz]
    cp3 = 1.0 - 1.0 / gm
    maxp = jnp.where(p_fac * dm > p1 + pm, p_fac * pm, p1 + pm)
    dz_out_ref[...] = -dm * constants.RDGAS * pt * jnp.exp(
        (cp3 - 1.0) * jnp.log(maxp)
    )


def sim1_pallas(w, dm, gm, dz, pt, pm, pem, ws, dt, p_fac,
                interpret: bool = False):
    """Drop-in for the scan-path sim1_solver body (same argument layout:
    layer fields (6, Ni, Nj, nz); pem (6, Ni, Nj, nz+1); ws (6, Ni, Nj)).
    Returns (w, dz, pe_interfaces) in the same k-last layout."""
    from pace_tpu.ops.pallas._lanes import pad_lanes

    six, ni, nj, nz = w.shape
    dtype = w.dtype
    XB = _pick_xb(ni)

    def to_kj(q):  # (6, Ni, Nj, k) -> (6, Ni, k, Nj)
        return jnp.swapaxes(q, -1, -2)

    # lane axis must be 128-aligned for the dynamic-k ref reads (_lanes);
    # dm is the divisor everywhere, edge replication keeps it nonzero
    ins = [pad_lanes(to_kj(q))[0] for q in (w, dm, gm, dz, pt, pm, pem)]
    ins.append(pad_lanes(ws[:, :, None, :])[0])  # (6, Ni, 1, Njp)
    njp = ins[0].shape[-1]
    # block the lane axis at one 128-lane tile: with njp > 128 (C128+,
    # where Nj pads to 256) Mosaic rejects the dynamic sublane slices
    # inside the solver ("slice shape along dimension 2 must be aligned
    # to tiling (8), but is 79"), so every block keeps the proven
    # (XB, k, 128) geometry and the grid walks lane tiles.
    LB = min(njp, 128)

    def spec(kdim):
        return pl.BlockSpec(
            (1, XB, kdim, LB),
            (lambda t, c, j: (t, c, 0, j)),
            memory_space=pltpu.VMEM,
        )

    in_specs = [spec(nz)] * 6 + [spec(nz + 1), spec(1)]
    out_shapes = [
        jax.ShapeDtypeStruct((six, ni, nz, njp), dtype),
        jax.ShapeDtypeStruct((six, ni, nz, njp), dtype),
        jax.ShapeDtypeStruct((six, ni, nz + 1, njp), dtype),
    ]
    out_specs = [spec(nz), spec(nz), spec(nz + 1)]

    def kernel(*refs):
        in_refs = [r.at[0] for r in refs[:8]]
        out_refs = [r.at[0] for r in refs[8:11]]
        scratch = refs[11:]
        _kernel(*in_refs, *out_refs, *scratch,
                nz=nz, dt=float(dt), p_fac=float(p_fac))

    w_o, dz_o, pe_o = pl.pallas_call(
        kernel,
        grid=(six, ni // XB, njp // LB),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=[
            pltpu.VMEM((XB, nz + 1, LB), dtype),   # pp
            pltpu.VMEM((XB, nz + 1, LB), dtype),   # gam
            pltpu.VMEM((XB, nz, LB), dtype),       # aa
            pltpu.VMEM((XB, nz, LB), dtype),       # wbuf
            pltpu.VMEM((XB, nz, LB), dtype),       # gam2
            pltpu.VMEM((XB, nz, LB), dtype),       # grf (g_rat, padded)
            pltpu.VMEM((XB, nz, LB), dtype),       # bbr (bb diag, padded)
            pltpu.VMEM((XB, nz, LB), dtype),       # ddr (rhs, padded)
        ],
        interpret=interpret,
    )(*ins)
    return (to_kj(w_o[..., :nj]), to_kj(dz_o[..., :nj]),
            to_kj(pe_o[..., :nj]))
