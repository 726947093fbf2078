"""Height advection on the D grid (updatedzd).

jnp port of ai2cm/pace fv3core/pace/fv3core/stencils/updatedzd.py
`UpdateHeightOnDGrid`: cubic-spline interpolation of courant numbers / area
fluxes from layer centers to interfaces, FiniteVolumeTransport of interface
heights, del-n diffusive height fluxes, and application with the implied
surface vertical wind.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from pace_tpu.ops import delnflux as delnflux_mod
from pace_tpu.ops.fvtp2d import fv_tp_2d
from pace_tpu.ops.stencil_utils import shift
from pace_tpu.utils.constants import DZ_MIN


def cubic_spline_interpolation_constants(dp0: np.ndarray):
    """gk/beta/gamma columns for center->interface interpolation
    (updatedzd.py:137)."""
    nz = dp0.shape[0]
    gk = np.zeros(nz)
    beta = np.zeros(nz)
    gamma = np.zeros(nz)
    gk[0] = dp0[1] / dp0[0]
    beta[0] = gk[0] * (gk[0] + 0.5)
    gamma[0] = (1.0 + gk[0] * (gk[0] + 1.5)) / beta[0]
    gk[1:] = dp0[:-1] / dp0[1:]
    for i in range(1, nz):
        beta[i] = 2.0 + 2.0 * gk[i] - gamma[i - 1]
        gamma[i] = gk[i] / beta[i]
    return gk, beta, gamma


def interpolation_matrix(dp0: np.ndarray) -> np.ndarray:
    """Dense (nz, nz+1) matrix M with qe = q @ M equal to the cubic-spline
    center->interface interpolation.

    The spline solve is LINEAR in q with coefficients that depend only on
    the static reference column dp0, so the whole
    forward/backward-substitution recurrence collapses into one matrix
    built once (numpy float64, column per basis vector) and applied as a
    single MXU contraction per field — one HBM pass instead of two
    transposes plus two nz-step sequential scans per field
    (reference updatedzd.py:137 cubic_spline_interpolation... computed
    per-column every call)."""
    nz = dp0.shape[0]
    gk, beta, gamma = cubic_spline_interpolation_constants(dp0)
    m = np.zeros((nz, nz + 1))
    for j in range(nz):
        q = np.zeros(nz)
        q[j] = 1.0
        m[j] = _interpolate_scan_reference(q, gk, beta, gamma)
    return m


def _interpolate_scan_reference(q: np.ndarray, gk, beta, gamma):
    """Sequential-substitution reference (numpy, one column)."""
    nz = q.shape[0]
    qe = np.zeros(nz + 1)
    qe[0] = 2.0 * gk[0] * (gk[0] + 1.0) * q[0] + q[1]
    qe[0] /= beta[0]
    for k in range(1, nz):
        qe[k] = (3.0 * (q[k - 1] + gk[k] * q[k]) - qe[k - 1]) / beta[k]
    a_bot = 1.0 + gk[-1] * (gk[-1] + 1.5)
    xt1 = 2.0 * gk[-1] * (gk[-1] + 1.0)
    xt2 = gk[-1] * (gk[-1] + 0.5) - a_bot * gamma[-1]
    qe[nz] = (xt1 * q[nz - 1] + q[nz - 2] - a_bot * qe[nz - 1]) / xt2
    for k in range(nz - 1, -1, -1):
        qe[k] -= gamma[k] * qe[k + 1]
    return qe


@functools.lru_cache(maxsize=8)
def _interpolation_matrix_cached(dp0_bytes: bytes, nz: int) -> np.ndarray:
    return interpolation_matrix(np.frombuffer(dp0_bytes).reshape(nz))


def interpolate_to_layer_interfaces_matrix(q, m):
    """q: (..., nz) or a (B, ..., nz) batch; m: (nz, nz+1) numpy.
    One einsum -> (..., nz+1)."""
    return jnp.einsum(
        "...z,zo->...o", q, jnp.asarray(m, q.dtype),
        precision=jax.lax.Precision.HIGHEST,
    )


def interpolate_to_layer_interfaces(q, gk, beta, gamma):
    """Cubic-spline center->interface interpolation (edge_profile).

    q: (..., nz); gk/beta/gamma: (nz,) numpy. Returns (..., nz+1).
    Sequential lax.scan form — kept as the numerical reference for
    interpolation_matrix (tests/test_vertical_remap.py pins the two
    against each other)."""
    nz = q.shape[-1]
    qk = jnp.moveaxis(q, -1, 0)
    gk_j = jnp.asarray(gk, q.dtype)
    beta_j = jnp.asarray(beta, q.dtype)
    gamma_j = jnp.asarray(gamma, q.dtype)

    xt1_0 = 2.0 * gk_j[0] * (gk_j[0] + 1.0)
    qe0 = (xt1_0 * qk[0] + qk[1]) / beta_j[0]

    def fwd(carry, x):
        qe_prev = carry
        qm1, q0, gkk, btk = x
        qe = (3.0 * (qm1 + gkk * q0) - qe_prev) / btk
        return qe, qe

    _, qe_mid = jax.lax.scan(fwd, qe0, (qk[:nz - 1], qk[1:nz], gk_j[1:nz],
                                        beta_j[1:nz]))
    # bottom interface
    a_bot = 1.0 + gk_j[-1] * (gk_j[-1] + 1.5)
    xt1 = 2.0 * gk_j[-1] * (gk_j[-1] + 1.0)
    xt2 = gk_j[-1] * (gk_j[-1] + 0.5) - a_bot * gamma_j[-1]
    qe_bot = (xt1 * qk[nz - 1] + qk[nz - 2] - a_bot * qe_mid[-1]) / xt2

    qe = jnp.concatenate([qe0[None], qe_mid, qe_bot[None]], 0)  # (nz+1, ...)

    # backward substitution: qe_k -= gamma_k * qe_{k+1} for k = nz-1..0
    def bwd(carry, x):
        qe_next = carry
        qe_k, gam_k = x
        new = qe_k - gam_k * qe_next
        return new, new

    _, qe_rev = jax.lax.scan(
        bwd, qe[nz], (qe[:nz][::-1], gamma_j[::-1])
    )
    out = jnp.concatenate([qe_rev[::-1], qe[nz][None]], 0)
    return jnp.moveaxis(out, 0, -1)


def update_dz_d(
    surface_height, height, crx, cry, x_area_flux, y_area_flux,
    gd, col, config, n, h, dt, dp0,
):
    """Returns (height, ws). dp0: (nz,) static numpy reference
    pressure-thickness column."""
    dp0_64 = np.asarray(dp0, dtype=np.float64)
    m = _interpolation_matrix_cached(dp0_64.tobytes(), dp0_64.shape[0])
    stacked = jnp.stack([crx, x_area_flux, cry, y_area_flux])
    crx_i, xaf_i, cry_i, yaf_i = interpolate_to_layer_interfaces_matrix(
        stacked, m
    )

    fx, fy = fv_tp_2d(
        height, crx_i, cry_i, xaf_i, yaf_i, gd, n, h, config.hord_tm
    )

    # del-n diffusive height fluxes; the reference passes the raw damp_vt
    # column as the damping factor here (updatedzd.py:343)
    nordc = np.append(np.asarray(col["nord_v"]), col["nord_v"][-1])
    dampc = np.append(np.asarray(col["damp_vt"]), col["damp_vt"][-1])
    fx2, fy2, _ = delnflux_mod.deln_flux_nosg(
        height, gd.damping.del6_u, gd.damping.del6_v, gd.horizontal.rarea,
        nordc, dampc, n, h,
    )

    area = gd.horizontal.area[..., None]
    area_after = (
        (area + xaf_i - shift(xaf_i, 1))
        + (area + yaf_i - shift(yaf_i, 0, 1)) - area
    )
    height = (
        height * area + fx - shift(fx, 1) + fy - shift(fy, 0, 1)
    ) / area_after + (fx2 - shift(fx2, 1) + fy2 - shift(fy2, 0, 1)) / area

    ws = (surface_height - height[..., -1]) / dt
    # monotonicity bottom-up: the sequential recurrence
    # h'_k = max(h_k, h'_{k+1} + DZ_MIN) unrolls to
    # h'_k = max_{m >= k} (h_m + (m-k)*DZ_MIN), i.e. a reverse cummax of
    # b_m = h_m + m*DZ_MIN shifted back by k*DZ_MIN — one log-depth
    # associative scan along the lane axis instead of an nz-step
    # sequential loop (exact in f64; ~1 ulp f32 vs the recurrence)
    nz1 = height.shape[-1]
    korr = DZ_MIN * jnp.arange(nz1, dtype=height.dtype)
    b = height + korr
    height = jax.lax.cummax(b, axis=height.ndim - 1, reverse=True) - korr
    return height, ws
