"""Helpers for writing FV3 stencils as jnp whole-array expressions.

The reference compiles each stencil over an origin/domain window
(ai2cm/pace dsl/pace/dsl/stencil.py FrozenStencil); here stencils are plain
functions over full (6, N, N[, nz]) arrays.  `shift(q, di, dj)` gives the
whole-array shifted view (edge-replicated at the array boundary, which is
always outside any region a stencil writes), and `set_region` writes an
expression into a static (i, j) window, leaving the rest unchanged — XLA
dead-code-eliminates the unused lanes of the expression.
"""

from __future__ import annotations

import jax.numpy as jnp


def shift(q: jnp.ndarray, di: int = 0, dj: int = 0, dk: int = 0) -> jnp.ndarray:
    """out[..., i, j, k] = q[..., i+di, j+dj, k+dk] with edge replication at
    array bounds (axes 1, 2 are i, j; axis 3 if present is k)."""
    out = q
    if di:
        out = _shift_axis(out, di, 1)
    if dj:
        out = _shift_axis(out, dj, 2)
    if dk:
        out = _shift_axis(out, dk, 3)
    return out


def _shift_axis(q, d, axis):
    n = q.shape[axis]
    idx = [slice(None)] * q.ndim
    if d > 0:
        idx[axis] = slice(d, None)
        body = q[tuple(idx)]
        idx[axis] = slice(n - 1, None)
        edge = q[tuple(idx)]
        reps = [1] * q.ndim
        reps[axis] = d
        return jnp.concatenate([body, jnp.tile(edge, reps)], axis=axis)
    else:
        idx[axis] = slice(None, d)
        body = q[tuple(idx)]
        idx[axis] = slice(0, 1)
        edge = q[tuple(idx)]
        reps = [1] * q.ndim
        reps[axis] = -d
        return jnp.concatenate([jnp.tile(edge, reps), body], axis=axis)


def _start_and_slicer(idx):
    """Normalize a static int or slice into (start, slicer)."""
    if isinstance(idx, slice):
        return (idx.start or 0), idx
    return idx, slice(idx, idx + 1)


def upd_cols(dest: jnp.ndarray, expr: jnp.ndarray, *cols) -> jnp.ndarray:
    """dest[:, i] = expr[:, i] for static columns i (int or slice).

    Uses lax.dynamic_update_slice instead of .at[].set: .at[].set lowers
    to stablehlo.scatter, which is unsupported in Pallas TPU kernels and
    is fragile under the SPMD partitioner (docs/KNOWN_ISSUES.md); DUS
    lowers to a plain in-place slice write."""
    from jax import lax

    zeros = (0,) * (dest.ndim - 2)
    for i in cols:
        i0, si = _start_and_slicer(i)
        dest = lax.dynamic_update_slice(dest, expr[:, si], (0, i0) + zeros)
    return dest


def upd_rows(dest: jnp.ndarray, expr: jnp.ndarray, *rows) -> jnp.ndarray:
    """dest[:, :, j] = expr[:, :, j] for static rows j (DUS form)."""
    from jax import lax

    zeros = (0,) * (dest.ndim - 3)
    for j in rows:
        j0, sj = _start_and_slicer(j)
        dest = lax.dynamic_update_slice(
            dest, expr[:, :, sj], (0, 0, j0) + zeros
        )
    return dest


def upd_point(dest: jnp.ndarray, expr: jnp.ndarray, i, j) -> jnp.ndarray:
    """dest[:, i, j] = expr[:, i, j] for static int-or-slice (i, j)."""
    from jax import lax

    zeros = (0,) * (dest.ndim - 3)
    i0, si = _start_and_slicer(i)
    j0, sj = _start_and_slicer(j)
    return lax.dynamic_update_slice(
        dest, expr[:, si, sj], (0, i0, j0) + zeros
    )


def set_region(dest: jnp.ndarray, sx: slice, sy: slice,
               expr: jnp.ndarray) -> jnp.ndarray:
    """dest[:, sx, sy] = expr[:, sx, sy] (expr is a whole-array expression).
    sx/sy are slices, so this lowers to dynamic_update_slice (no scatter)."""
    return dest.at[:, sx, sy].set(expr[:, sx, sy])


def region_add(dest, sx, sy, expr):
    return dest.at[:, sx, sy].add(expr[:, sx, sy])


def sign(a, b):
    """|a| with the sign of b (Fortran SIGN; b==0 counts as positive...
    reference `sign` uses b > 0)."""
    return jnp.where(b > 0, jnp.abs(a), -jnp.abs(a))


def dim(a, b):
    return jnp.maximum(a - b, 0.0)


def absolute_value(a):
    return jnp.abs(a)
