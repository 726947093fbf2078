"""Fused Pallas TPU kernels for fv_tp_2d (2D finite-volume transport).

The jnp fv_tp_2d (ops/fvtp2d.py) is four PPM sweeps plus combination; on
TPU every shifted whole-array read is a separate HBM stream, so XLA's
compiled form accesses ~40x the fundamental bytes (measured via
cost_analysis).  Here the op is split into three kernels, each shifting
along ONE axis only, so blocks chunk the other axis with no halo overlap:

  K1 (shifts in y): inner y-PPM -> fy_inner mean + y-advected field
  K2 (shifts in x): inner x-PPM + outer x-PPM -> x flux + x-advected field
  K3 (shifts in y): outer y-PPM -> y flux

All kernels run the identical math as the jnp path by injecting
block-local shift/update helpers into ops.xppm._flux_core
(reference: ai2cm/pace fv3core/pace/fv3core/stencils/fvtp2d.py).

Batched over stacked tracers: shared fields (courant numbers, area/mass
fluxes, metrics) are revisited blocks — the tracer axis iterates fastest so
Mosaic fetches them once per (tile, chunk).
"""

from __future__ import annotations

import functools
import os

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pace_tpu.ops import xppm


# test hook: run pallas_call in interpret mode (CPU equivalence tests)
INTERPRET = False


def enabled(dtype=None) -> bool:
    """Pallas kernels on by default on TPU; PACE_PALLAS=0/1 overrides.
    Mosaic has no 64-bit support, so f64 runs (e.g. golden-digest
    verification on a TPU host) always take the jnp path."""
    if dtype is not None and jnp.dtype(dtype).itemsize >= 8:
        return False
    env = os.environ.get("PACE_PALLAS")
    if env is not None:
        return env == "1"
    return jax.default_backend() == "tpu"


def _block_ops(axis: int):
    """(shift, update-lines) pair on block arrays, along `axis`."""

    def sh(q, d):
        """Matches stencil_utils._shift_axis: zero-fill at the array
        bounds (the block spans the full shifted axis, so block boundary
        == array boundary exactly as in the jnp path)."""
        if d == 0:
            return q
        cfg = [(0, 0, 0)] * q.ndim
        idx = [slice(None)] * q.ndim
        if d > 0:
            idx[axis] = slice(d, None)
            cfg[axis] = (0, d, 0)
        else:
            idx[axis] = slice(None, d)
            cfg[axis] = (-d, 0, 0)
        return jax.lax.pad(q[tuple(idx)], jnp.zeros((), q.dtype), cfg)

    def upd(dest, expr, *lines):
        # Pallas kernels may not capture array constants, so the line mask
        # is built from an in-kernel iota instead of a numpy table.
        idx = jax.lax.broadcasted_iota(jnp.int32, dest.shape, axis)
        m = None
        for i in lines:
            if isinstance(i, slice):
                start = i.start or 0
                stop = dest.shape[axis] if i.stop is None else i.stop
                term = jnp.logical_and(idx >= start, idx < stop)
            else:
                term = idx == i
            m = term if m is None else jnp.logical_or(m, term)
        return jnp.where(m, expr, dest)

    return sh, upd


def _k1_inner_y(q_y_ref, cry_ref, yfx_ref, dya_ref, area_ref,
                qay_ref, fyin_ref, *, n, h, ord_inner):
    sh, upd = _block_ops(1)
    q = q_y_ref[0, 0]
    cry = cry_ref[0]
    yfx = yfx_ref[0]
    dya = dya_ref[0]
    area = area_ref[0]
    fy_in = xppm._flux_core(q, cry, dya, n, h, ord_inner, sh, upd)
    fyy = yfx * fy_in
    qay = (q * area + fyy - sh(fyy, 1)) / (area + yfx - sh(yfx, 1))
    qay_ref[0, 0] = qay
    fyin_ref[0, 0] = fy_in


def _k2_x_passes(qay_ref, q_x_ref, crx_ref, xfx_ref, xmf_ref, dxa_ref,
                 area_ref, fx_ref, qax_ref, *, n, h, ord_inner, ord_outer):
    sh, upd = _block_ops(0)
    qay = qay_ref[0, 0]
    q_x = q_x_ref[0, 0]
    crx = crx_ref[0]
    xfx = xfx_ref[0]
    xmf = xmf_ref[0]
    dxa = dxa_ref[0]
    area = area_ref[0]
    fx_in = xppm._flux_core(q_x, crx, dxa, n, h, ord_inner, sh, upd)
    mean1 = xppm._flux_core(qay, crx, dxa, n, h, ord_outer, sh, upd)
    fx_ref[0, 0] = 0.5 * (mean1 + fx_in) * xmf
    fx1 = xfx * fx_in
    qax_ref[0, 0] = (q_x * area + fx1 - sh(fx1, 1)) / (
        area + xfx - sh(xfx, 1)
    )


def _k3_outer_y(qax_ref, fyin_ref, cry_ref, ymf_ref, dya_ref,
                fy_ref, *, n, h, ord_outer):
    sh, upd = _block_ops(1)
    qax = qax_ref[0, 0]
    fy_in = fyin_ref[0, 0]
    cry = cry_ref[0]
    ymf = ymf_ref[0]
    dya = dya_ref[0]
    mean2 = xppm._flux_core(qax, cry, dya, n, h, ord_outer, sh, upd)
    fy_ref[0, 0] = 0.5 * (mean2 + fy_in) * ymf


def fused_dsw_enabled(dtype=None, n_split: int = 0) -> bool:
    """The d_sw five-field fused transport, all-ones-unit-flux
    formulation riding the SAME transport_batched kernels as tracer
    advection: **default ON for n_split >= 4 since round 5**, where it
    wins (C48 k2/n6 354.6 vs 364.1 ms; C24 n4 40.04 vs 40.35, n6 51.28
    vs 52.54) — a wash at n_split=2, so the light config keeps the
    unfused 3-call path.

    History: the round-3 default used dedicated batched *means* kernels
    that the chip miscompiled at acoustic substep >= 4 of n_split >= 4
    configs (docs/KNOWN_ISSUES.md "fused d_sw five-field transport");
    those kernels were deleted.  The surviving formulation passed the
    round-5 trajectory gate: 300-step C24 runs at n_split {2, 4, 6} all
    finite with digests at trajectory-divergence level of the unfused
    path, and the full 9-day JW06 wave within 0.7 hPa of the unfused
    artifact (scripts/fused_dsw_trajectory.sh, 2026-08-21).
    PACE_FUSED_DSW=1/0 forces either way."""
    env = os.environ.get("PACE_FUSED_DSW")
    if env is not None:
        return env == "1" and enabled(dtype)
    return n_split >= 4 and enabled(dtype)


def _chunk(N: int) -> int:
    """Largest divisor of N keeping a (chunk, N, 128-lane) f32 block's
    rows*cols <= 28*56 (the C48-tuned VMEM budget; blocks scale ~XB*N)."""
    target = max(1, (28 * 56) // N)
    for c in range(min(target, N), 0, -1):
        if N % c == 0:
            return c
    return N


def _ychunk(N: int) -> int:
    """y-chunk for K2 blocks: sits in the sublane slot -> multiple of 8;
    same rows*cols VMEM budget as _chunk, floored at the 8-sublane tile."""
    yb_cap = max(8, (28 * 56) // N // 8 * 8)
    return next((c for c in range(min(yb_cap, N), 0, -8) if N % c == 0), N)


def _m5(t, c, a):
    return (a, t, c, 0, 0)


def _m4(t, c, a):
    return (t, c, 0, 0)


def _run_k1(q_y, cry, yfx, dya, area, *, n, h, ord_inner, interpret):
    """K1 stage (shifts along y; chunk x), shared by transport_batched
    (formerly also the deleted means variants): y-inner PPM -> (q_advected_y, fy_in)."""
    T, nt, N, _, nz = q_y.shape
    XB = _chunk(N)
    g1 = (nt, N // XB, T)
    dt = q_y.dtype
    return pl.pallas_call(
        functools.partial(_k1_inner_y, n=n, h=h, ord_inner=ord_inner),
        grid=g1,
        in_specs=[
            pl.BlockSpec((1, 1, XB, N, nz), _m5, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, XB, N, nz), _m4, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, XB, N, nz), _m4, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, XB, N, 1), _m4, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, XB, N, 1), _m4, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, XB, N, nz), _m5, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, XB, N, nz), _m5, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(q_y.shape, dt),
            jax.ShapeDtypeStruct(q_y.shape, dt),
        ],
        interpret=interpret,
    )(q_y, cry, yfx, dya, area)


@functools.partial(
    jax.jit,
    static_argnames=("n", "h", "hord", "interpret"),
)
def transport_batched(
    q_y, q_x, crx, cry, xfx, yfx, xmf, ymf, dxa, dya, area,
    n: int, h: int, hord: int, interpret: bool = False,
):
    """Batched fv_tp_2d fluxes for stacked tracers.

    Args:
        q_y/q_x: (T, 6, N, N, nz) corner-copied tracer stacks
        crx/cry/xfx/yfx/xmf/ymf: (6, N, N, nz) shared courant / area-flux /
            mass-flux fields
        dxa/dya/area: (6, N, N) metrics
    Returns:
        (fx, fy): (T, 6, N, N, nz) mass fluxes (the fv_tp_2d outputs with
        x_mass_flux/y_mass_flux given).
    """
    T, nt, N, _, nz = q_y.shape
    # metrics as (6, N, N, 1): keeps the chunked dim out of the sublane
    # slot of their blocks (Mosaic requires sublane % 8 == 0 or full-dim)
    dxa = dxa[..., None]
    dya = dya[..., None]
    area = area[..., None]
    ord_outer = hord
    ord_inner = 8 if hord == 10 else hord
    XB = _chunk(N)
    dt = q_y.dtype

    # ---- K1: shifts along y; chunk x --------------------------------------
    g1 = (nt, N // XB, T)
    m5, m4 = _m5, _m4
    qay, fy_in = _run_k1(q_y, cry, yfx, dya, area, n=n, h=h,
                         ord_inner=ord_inner, interpret=interpret)

    # ---- K2: shifts along x; chunk y --------------------------------------
    YB = _ychunk(N)
    nyc = N // YB
    g2 = (nt, nyc, T)
    m5y = lambda t, c, a: (a, t, 0, c, 0)
    m4y = lambda t, c, a: (t, 0, c, 0)
    fx, qax = pl.pallas_call(
        functools.partial(_k2_x_passes, n=n, h=h, ord_inner=ord_inner,
                          ord_outer=ord_outer),
        grid=g2,
        in_specs=[
            pl.BlockSpec((1, 1, N, YB, nz), m5y, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, N, YB, nz), m5y, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, YB, nz), m4y, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, YB, nz), m4y, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, YB, nz), m4y, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, YB, 1), m4y, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, YB, 1), m4y, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, N, YB, nz), m5y, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, N, YB, nz), m5y, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(q_y.shape, dt),
            jax.ShapeDtypeStruct(q_y.shape, dt),
        ],
        interpret=interpret,
    )(qay, q_x, crx, xfx, xmf, dxa, area)

    # ---- K3: shifts along y; chunk x --------------------------------------
    fy = pl.pallas_call(
        functools.partial(_k3_outer_y, n=n, h=h, ord_outer=ord_outer),
        grid=g1,
        in_specs=[
            pl.BlockSpec((1, 1, XB, N, nz), m5, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, XB, N, nz), m5, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, XB, N, nz), m4, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, XB, N, nz), m4, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, XB, N, 1), m4, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, XB, N, nz), m5,
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(q_y.shape, dt),
        interpret=interpret,
    )(qax, fy_in, cry, ymf, dya)

    return fx, fy
