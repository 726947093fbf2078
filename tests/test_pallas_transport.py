"""Pallas fused transport kernels vs the jnp fv_tp_2d path.

ops/pallas/fvtp2d_pallas.py is the TPU-default tracer transport; here it
runs in interpret mode on CPU so its math is pinned on every platform
against the vmap'd jnp fallback (the same comparison the TPU driver path
relies on).  Inputs are built exactly the way tracer_advection builds
them: corner-composed halo gathers for q_y/q_x, Courant-scaled area and
mass fluxes.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pace_tpu.grid.generation import generate_grid_data
from pace_tpu.ops.fvtp2d import fv_tp_2d
from pace_tpu.ops.pallas import fvtp2d_pallas
from pace_tpu.ops.stencil_utils import shift
from pace_tpu.parallel import halo as halo_mod
from pace_tpu.parallel.topology import CubedSphereTopology

N_, H, NZ, T = 12, 3, 8, 3


def _smooth(rng, shape, scale):
    """Band-limited random field (PPM limiter branches stay exercised but
    values are physical-ish)."""
    raw = rng.standard_normal(shape)
    sm = raw
    for ax in (1, 2):
        sm = 0.5 * sm + 0.25 * (np.roll(sm, 1, ax) + np.roll(sm, -1, ax))
    return jnp.asarray(scale * sm)


@pytest.fixture(scope="module")
def transport_inputs():
    # vertical coordinate tables need a supported km; the transport only
    # reads horizontal metrics, so tracers keep their own NZ levels
    gd = generate_grid_data(N_, 79, dtype=jnp.float64)
    topo = CubedSphereTopology(N_, H)
    rng = np.random.default_rng(7)
    shape = (6, topo.N, topo.N, NZ)

    crx = _smooth(rng, shape, 0.35)
    cry = _smooth(rng, shape, 0.35)
    hz = gd.horizontal
    dxa = hz.dxa[..., None]
    dya = hz.dya[..., None]
    xfx = crx * dxa * hz.dy[..., None]
    yfx = cry * dya * hz.dx[..., None]
    xmf = xfx * (1.0 + _smooth(rng, shape, 0.05))
    ymf = yfx * (1.0 + _smooth(rng, shape, 0.05))

    spec_y, spec_x = topo.scalar_corner_specs()
    stacked = jnp.stack(
        [1.0 + jnp.abs(_smooth(rng, shape, 0.5)) for _ in range(T)]
    )
    qy8 = jax.vmap(lambda q: halo_mod.halo_update_scalar(q, spec_y))(stacked)
    qx8 = jax.vmap(lambda q: halo_mod.halo_update_scalar(q, spec_x))(stacked)
    return gd, qy8, qx8, crx, cry, xfx, yfx, xmf, ymf


@pytest.mark.parametrize("hord", [8, 10])
def test_transport_batched_matches_jnp(transport_inputs, hord):
    gd, qy8, qx8, crx, cry, xfx, yfx, xmf, ymf = transport_inputs
    hz = gd.horizontal

    fx_ref, fy_ref = jax.vmap(
        lambda q_y, q_x: fv_tp_2d(
            q_y, crx, cry, xfx, yfx, gd, N_, H, hord,
            x_mass_flux=xmf, y_mass_flux=ymf, q_y=q_y, q_x=q_x,
        )
    )(qy8, qx8)

    fx, fy = fvtp2d_pallas.transport_batched(
        qy8, qx8, crx, cry, xfx, yfx, xmf, ymf,
        hz.dxa, hz.dya, hz.area, N_, H, hord, interpret=True,
    )

    np.testing.assert_allclose(np.asarray(fx), np.asarray(fx_ref),
                               rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(np.asarray(fy), np.asarray(fy_ref),
                               rtol=1e-12, atol=1e-12)


@pytest.mark.parametrize("hord", [6, 8])
def test_transport_batched_means_matches_jnp(transport_inputs, hord):
    """Unit-flux-deferred form (d_sw's five-field fused transport):
    transport_batched with all-ones unit fluxes yields the raw PPM
    means, and mean * unit_flux must equal the jnp fv_tp_2d for BOTH
    flux kinds — mass-flux (w/q_con/pt) and area-flux (delp/vorticity)
    transports.  (The dedicated means kernels this replaced corrupted
    d_sw u/v on-chip; KNOWN_ISSUES "fused d_sw five-field transport".)"""
    gd, qy8, qx8, crx, cry, xfx, yfx, xmf, ymf = transport_inputs
    hz = gd.horizontal

    import jax.numpy as jnp

    ones = jnp.ones_like(crx)
    mean_x, mean_y = fvtp2d_pallas.transport_batched(
        qy8, qx8, crx, cry, xfx, yfx, ones, ones,
        hz.dxa, hz.dya, hz.area, N_, H, hord, interpret=True,
    )

    fx_mass_ref, fy_mass_ref = jax.vmap(
        lambda q_y, q_x: fv_tp_2d(
            q_y, crx, cry, xfx, yfx, gd, N_, H, hord,
            x_mass_flux=xmf, y_mass_flux=ymf, q_y=q_y, q_x=q_x,
        )
    )(qy8, qx8)
    fx_area_ref, fy_area_ref = jax.vmap(
        lambda q_y, q_x: fv_tp_2d(
            q_y, crx, cry, xfx, yfx, gd, N_, H, hord, q_y=q_y, q_x=q_x,
        )
    )(qy8, qx8)

    np.testing.assert_allclose(np.asarray(mean_x * xmf),
                               np.asarray(fx_mass_ref),
                               rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(np.asarray(mean_y * ymf),
                               np.asarray(fy_mass_ref),
                               rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(np.asarray(mean_x * xfx),
                               np.asarray(fx_area_ref),
                               rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(np.asarray(mean_y * yfx),
                               np.asarray(fy_area_ref),
                               rtol=1e-12, atol=1e-12)


def test_corner_composed_gathers_match_explicit(transport_inputs):
    """halo ∘ copy_corners composition equals sequential halo + corner
    copies (the identity tracer_advection relies on)."""
    from pace_tpu.ops import corners as corner_ops

    gd, qy8, qx8, *_ = transport_inputs
    topo = CubedSphereTopology(N_, H)
    spec = topo.scalar_spec("center")
    q0 = qy8[0]
    # recover the bare halo-updated field: corner copies only touch wedges,
    # so re-gathering through the plain spec reproduces it
    q_halo = halo_mod.halo_update_scalar(q0, spec)
    np.testing.assert_array_equal(
        np.asarray(corner_ops.copy_corners(q_halo, N_, H, "y")),
        np.asarray(qy8[0]),
    )
    np.testing.assert_array_equal(
        np.asarray(corner_ops.copy_corners(qy8[0], N_, H, "x")),
        np.asarray(qx8[0]),
    )
