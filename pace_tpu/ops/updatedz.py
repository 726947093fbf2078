"""Geopotential-height updates on the C and D grids.

jnp ports of ai2cm/pace fv3core/pace/fv3core/stencils/updatedzc.py
(`UpdateGeopotentialHeightOnCGrid`) and updatedzd.py
(`UpdateHeightOnDGrid`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from pace_tpu.ops import corners as corner_ops
from pace_tpu.ops.stencil_utils import shift
from pace_tpu.utils.constants import DZ_MIN


def _interface_interp(vel, dp0):
    """Interpolate a layer field to interfaces with pressure-thickness
    weights (updatedzc.py p_weighted_average_*). vel (..., nz), dp0 (nz,);
    returns (..., nz+1)."""
    top = vel[..., :1] + (vel[..., :1] - vel[..., 1:2]) * (
        dp0[0] / (dp0[0] + dp0[1])
    )
    interior = (dp0[1:] * vel[..., :-1] + dp0[:-1] * vel[..., 1:]) / (
        dp0[:-1] + dp0[1:]
    )
    bottom = vel[..., -1:] + (vel[..., -1:] - vel[..., -2:-1]) * (
        dp0[-1] / (dp0[-2] + dp0[-1])
    )
    return jnp.concatenate([top, interior, bottom], -1)


def _enforce_monotone_gz(gz):
    """gz_k = max(gz_k, gz_{k+1} + DZ_MIN) applied bottom-up (..., nz+1).

    The recurrence unrolls to gz'_k = max_{m >= k} (gz_m + (m-k)*DZ_MIN):
    a reverse cummax of gz + k*DZ_MIN (log-depth associative scan along
    the lane axis) instead of an nz-step sequential lax.scan with two
    whole-array transposes — same rewrite as update_dz_d's monotonicity
    (ops/updatedzd.py)."""
    nzp = gz.shape[-1]
    korr = DZ_MIN * jnp.arange(nzp, dtype=gz.dtype)
    b = gz + korr
    return jax.lax.cummax(b, axis=gz.ndim - 1, reverse=True) - korr


def update_dz_c(dp_ref, zs, area, ut, vt, gz, n, h, dt):
    """Advance interface heights on the C grid.

    Args:
        dp_ref: (nz,) reference layer pressure thickness
        zs: (6, N, N) surface height [m]
        area: (6, N, N)
        ut, vt: (6, N, N, nz) C-grid volume fluxes from c_sw
        gz: (6, N, N, nz+1) interface geopotential height [m]
    Returns (gz, ws): updated heights and implied surface vertical wind.
    """
    gz_x = corner_ops.fill_corners_cells(gz, gz, n, h, "x", 2)
    gz_y = corner_ops.fill_corners_cells(gz, gz, n, h, "y", 2)

    xfx = _interface_interp(ut, dp_ref)
    yfx = _interface_interp(vt, dp_ref)

    fx = xfx * jnp.where(xfx > 0.0, shift(gz_x, -1), gz_x)
    fy = yfx * jnp.where(yfx > 0.0, shift(gz_y, 0, -1), gz_y)
    area4 = area[..., None]
    gz_new = (gz * area4 + fx - shift(fx, 1) + fy - shift(fy, 0, 1)) / (
        area4 + xfx - shift(xfx, 1) + yfx - shift(yfx, 0, 1)
    )
    ws = (zs - gz_new[..., -1]) / dt
    gz_new = _enforce_monotone_gz(gz_new)
    return gz_new, ws
