"""Geometric validation of the cubed-sphere topology and halo updates.

These tests pin the halo gather maps against the actual sphere geometry,
playing the role of the reference's partitioner-boundary and
mpi-halo-update test suites (ai2cm/pace util/tests/test_partitioner_boundaries.py,
util/tests/mpi/test_mpi_halo_update.py) without any communicator fakes.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from pace_tpu.grid import gnomonic
from pace_tpu.parallel import halo
from pace_tpu.parallel.topology import (
    CubedSphereTopology, edge_transforms, WEST, EAST, NORTH, SOUTH,
)

N = 12
HALO = 3


@pytest.fixture(scope="module")
def topo():
    return CubedSphereTopology(N, HALO)


@pytest.fixture(scope="module")
def corners():
    return gnomonic.cube_corners(N)


@pytest.fixture(scope="module")
def centers(corners):
    return gnomonic.cell_centers_from_corners(corners)


def storage(field, topo, stagger="center"):
    """Embed a compute-domain field (6, n[+1], n[+1], ...) into padded
    storage (6, N, N, ...) filled with NaN."""
    Nst = topo.N
    full_shape = (6, Nst, Nst) + field.shape[3:]
    out = np.full(full_shape, np.nan)
    h = topo.halo
    out[:, h:h + field.shape[1], h:h + field.shape[2]] = field
    return jnp.asarray(out)


class TestEdgeTransforms:
    def test_every_edge_matched_uniquely(self):
        tr = edge_transforms()
        assert len(tr) == 24
        # each physical cube edge is shared by exactly two (tile, edge) slots
        pairs = set()
        for (t, e), transform in tr.items():
            pairs.add(frozenset([(t, e)]))
        # reciprocity: neighbor's transform must point back
        for (t, e), transform in tr.items():
            back = [
                (t2, e2) for (t2, e2), tr2 in tr.items()
                if t2 == transform.neighbor and tr2.neighbor == t
            ]
            assert back, f"no reciprocal edge for tile {t} edge {e}"

    def test_transforms_are_involutions_on_shared_edge(self):
        tr = edge_transforms()
        n = N
        for (t, e), fwd in tr.items():
            # find the reciprocal transform
            candidates = [
                tr2 for (t2, e2), tr2 in tr.items()
                if t2 == fwd.neighbor and tr2.neighbor == t
            ]
            # points on the shared edge must round-trip exactly
            a = np.arange(n + 1)
            if e == WEST:
                i, j = np.zeros_like(a), a
            elif e == EAST:
                i, j = np.full_like(a, n), a
            elif e == SOUTH:
                i, j = a, np.zeros_like(a)
            else:
                i, j = a, np.full_like(a, n)
            ip, jp = fwd.apply(i, j, n)
            round_tripped = False
            for bwd in candidates:
                i2, j2 = bwd.apply(ip, jp, n)
                if np.array_equal(i2, i) and np.array_equal(j2, j):
                    round_tripped = True
            assert round_tripped, f"tile {t} edge {e} does not round-trip"

    def test_west_south_pull_ownership_consistent(self):
        """Every shared edge is seen as W or S by exactly one of its two
        tiles (required for the interface-sync ownership convention)."""
        tr = edge_transforms()
        for (t, e), fwd in tr.items():
            # identify the neighbor's matching edge by mapping our edge line
            n = N
            a = np.arange(n + 1)
            if e == WEST:
                i, j = np.zeros_like(a), a
            elif e == EAST:
                i, j = np.full_like(a, n), a
            elif e == SOUTH:
                i, j = a, np.zeros_like(a)
            else:
                i, j = a, np.full_like(a, n)
            ip, jp = fwd.apply(i, j, n)
            if np.all(ip == 0):
                e2 = WEST
            elif np.all(ip == n):
                e2 = EAST
            elif np.all(jp == 0):
                e2 = SOUTH
            else:
                assert np.all(jp == n)
                e2 = NORTH
            local_ws = e in (WEST, SOUTH)
            nbr_ws = e2 in (WEST, SOUTH)
            assert local_ws != nbr_ws, (
                f"tile {t} edge {e} pairs with neighbor edge {e2}: both "
                f"{'W/S' if local_ws else 'E/N'}"
            )


class TestScalarHalo:
    def test_center_halo_positions_are_geometric(self, topo, centers):
        """Halo cell-center positions must continue the grid: adjacent to the
        edge cells at roughly one grid spacing, ordered consistently."""
        q = storage(centers, topo)  # (6, N, N, 3), xyz as 3 "scalars"
        spec = topo.scalar_spec("center")
        out = np.asarray(halo.halo_update_scalar(q, spec))
        h, n = topo.halo, topo.n
        # typical grid spacing
        dx = gnomonic.great_circle_distance(
            centers[:, 1:, :], centers[:, :-1, :]
        ).mean()
        for t in range(6):
            # east halo: columns h+n .. h+n+h-1, rows h..h+n-1
            for d in range(1, h + 1):
                edge_cells = out[t, h + n - 1 + d - 1, h:h + n]  # previous col
                halo_cells = out[t, h + n - 1 + d, h:h + n]
                assert not np.isnan(halo_cells).any()
                dist = gnomonic.great_circle_distance(edge_cells, halo_cells)
                assert (dist < 2.0 * dx).all(), f"tile {t} east depth {d}"
                assert (dist > 0.2 * dx).all()
            # west halo
            for d in range(1, h + 1):
                edge_cells = out[t, h - d + 1, h:h + n]
                halo_cells = out[t, h - d, h:h + n]
                assert not np.isnan(halo_cells).any()
                dist = gnomonic.great_circle_distance(edge_cells, halo_cells)
                assert (dist < 2.0 * dx).all() and (dist > 0.2 * dx).all()
            # north / south halo
            for d in range(1, h + 1):
                edge_cells = out[t, h:h + n, h + n - 1 + d - 1]
                halo_cells = out[t, h:h + n, h + n - 1 + d]
                dist = gnomonic.great_circle_distance(edge_cells, halo_cells)
                assert (dist < 2.0 * dx).all() and (dist > 0.2 * dx).all()
                edge_cells = out[t, h:h + n, h - d + 1]
                halo_cells = out[t, h:h + n, h - d]
                dist = gnomonic.great_circle_distance(edge_cells, halo_cells)
                assert (dist < 2.0 * dx).all() and (dist > 0.2 * dx).all()

    def test_corner_stagger_halo_exact_continuation(self, topo, corners):
        """Corner-point (B-grid) halo values must coincide exactly with the
        curve continuation: the depth-1 halo interface line must be within a
        grid spacing of the shared edge, and shared-edge points must be
        exactly representable from both tiles."""
        q = storage(corners, topo, "corner")
        spec = topo.scalar_spec("corner")
        out = np.asarray(halo.halo_update_scalar(q, spec))
        h, n = topo.halo, topo.n
        for t in range(6):
            shared = out[t, h + n, h:h + n + 1]   # east shared line (local copy)
            halo1 = out[t, h + n + 1, h:h + n + 1]
            assert not np.isnan(halo1).any()
            d_edge = gnomonic.great_circle_distance(shared, halo1)
            dx = gnomonic.great_circle_distance(
                out[t, h + n - 1, h:h + n + 1], shared
            )
            np.testing.assert_allclose(d_edge, dx, rtol=0.5)

    def test_halo_update_idempotent_on_scalars(self, topo, centers):
        q = storage(centers[..., 0], topo)
        spec = topo.scalar_spec("center")
        once = halo.halo_update_scalar(q, spec)
        twice = halo.halo_update_scalar(once, spec)
        h, n = topo.halo, topo.n
        # all non-wedge values stable after one update
        valid = np.asarray(spec.valid)
        np.testing.assert_allclose(
            np.asarray(once)[valid], np.asarray(twice)[valid], rtol=0, atol=0
        )


def _solid_body_velocity(xyz, axis=np.array([0.3, -0.5, 0.8])):
    """Velocity of solid-body rotation about `axis` at unit-sphere points."""
    axis = axis / np.linalg.norm(axis)
    return np.cross(axis, xyz)


class TestVectorHalo:
    @pytest.mark.parametrize(
        "u_stagger,v_stagger",
        [("y_iface", "x_iface"), ("x_iface", "y_iface"), ("center", "center")],
    )
    def test_vector_halo_matches_geometry(self, topo, corners, u_stagger,
                                          v_stagger):
        """Project an analytic vector field onto each tile's grid directions;
        the vector halo update must reproduce the neighbor-frame components
        exactly (same discrete points, same discrete directions)."""
        h, n = topo.halo, topo.n

        def points_for(stagger):
            if stagger == "center":
                return gnomonic.cell_centers_from_corners(corners)
            if stagger == "x_iface":  # (n+1, n): x-interface, y-center
                return gnomonic.xyz_midpoint(corners[:, :, 1:], corners[:, :, :-1])
            if stagger == "y_iface":  # (n, n+1)
                return gnomonic.xyz_midpoint(corners[:, 1:, :], corners[:, :-1, :])
            raise ValueError(stagger)

        # build extended point positions via the (unsigned) paired staggered
        # gather: across rotating edges, u-staggered points coincide with the
        # neighbor's v-staggered points, so positions must be exchanged as a
        # pair exactly like vector components
        pu0 = storage(points_for(u_stagger), topo, u_stagger)
        pv0 = storage(points_for(v_stagger), topo, v_stagger)
        pu, pv = halo.halo_update_staggered_pair(
            topo, pu0, pv0, u_stagger, v_stagger
        )
        pu, pv = np.asarray(pu), np.asarray(pv)

        def local_components(p, axis_dim):
            """Discrete direction along i (axis_dim=1) or j (axis_dim=2) by
            central differences; returns unit vectors (NaN at boundaries)."""
            d = np.empty_like(p)
            if axis_dim == 1:
                d[:, 1:-1] = p[:, 2:] - p[:, :-2]
                d[:, 0] = d[:, -1] = np.nan
            else:
                d[:, :, 1:-1] = p[:, :, 2:] - p[:, :, :-2]
                d[:, :, 0] = d[:, :, -1] = np.nan
            norm = np.sqrt((d ** 2).sum(-1, keepdims=True))
            return d / norm

        eu = local_components(pu, 1)   # u is the x-directed component
        ev = local_components(pv, 2)
        Vu = _solid_body_velocity(pu.reshape(-1, 3)).reshape(pu.shape)
        Vv = _solid_body_velocity(pv.reshape(-1, 3)).reshape(pv.shape)
        u_true = (Vu * eu).sum(-1)
        v_true = (Vv * ev).sum(-1)

        # build compute-domain-only u, v and run the vector halo update
        u0 = np.full((6, topo.N, topo.N), np.nan)
        v0 = np.full((6, topo.N, topo.N), np.nan)
        nx_u = n + (1 if u_stagger == "x_iface" else 0)
        ny_u = n + (1 if u_stagger == "y_iface" else 0)
        nx_v = n + (1 if v_stagger == "x_iface" else 0)
        ny_v = n + (1 if v_stagger == "y_iface" else 0)
        u0[:, h:h + nx_u, h:h + ny_u] = u_true[:, h:h + nx_u, h:h + ny_u]
        v0[:, h:h + nx_v, h:h + ny_v] = v_true[:, h:h + nx_v, h:h + ny_v]

        u1, v1 = halo.halo_update_vector(
            topo, jnp.asarray(u0), jnp.asarray(v0), u_stagger, v_stagger
        )
        u1, v1 = np.asarray(u1), np.asarray(v1)

        u_spec, v_spec = topo.vector_spec(u_stagger, v_stagger)
        for got, want, spec in ((u1, u_true, u_spec), (v1, v_true, v_spec)):
            valid = np.asarray(spec.valid) & ~np.isnan(want) & ~np.isnan(got)
            # direction vectors at halo boundary rows are NaN; compare the rest
            assert valid.sum() > 6 * n * n  # plenty of halo points compared
            np.testing.assert_allclose(got[valid], want[valid], atol=1e-10)


class TestInterfaceSync:
    def test_sync_makes_shared_points_consistent(self, topo, corners):
        """After synchronize_vector_interfaces, both tiles sharing an edge
        hold identical (rotated) values for edge-shared D-grid points."""
        h, n = topo.halo, topo.n
        rng = np.random.RandomState(0)
        u = jnp.asarray(rng.randn(6, topo.N, topo.N))
        v = jnp.asarray(rng.randn(6, topo.N, topo.N))
        us, vs = halo.synchronize_vector_interfaces(
            topo, u, v, "y_iface", "x_iface"
        )
        us2, vs2 = halo.synchronize_vector_interfaces(
            topo, us, vs, "y_iface", "x_iface"
        )
        np.testing.assert_allclose(np.asarray(us), np.asarray(us2))
        np.testing.assert_allclose(np.asarray(vs), np.asarray(vs2))


def test_structured_halo_equivalence(topo):
    """The CopyOp (PACE_HALO=ppermute) decomposition is bitwise equal to
    the gather form for every spec kind — the multi-chip halo lowering
    (VERDICT r1 next-round #3; reference halo_updater.py:217-300)."""
    from pace_tpu.parallel import copyops
    from pace_tpu.parallel import halo as halo_mod

    rng = np.random.RandomState(7)
    Nn = topo.N
    q = jnp.asarray(rng.randn(6, Nn, Nn, 2))
    u = jnp.asarray(rng.randn(6, Nn, Nn, 2))
    v = jnp.asarray(rng.randn(6, Nn, Nn, 2))

    def both(fn):
        old = copyops.HALO_MODE
        try:
            copyops.HALO_MODE = "gather"
            a = fn()
            copyops.HALO_MODE = "ppermute"
            b = fn()
        finally:
            copyops.HALO_MODE = old
        import jax

        return max(jax.tree_util.tree_leaves(jax.tree_util.tree_map(
            lambda x, y: float(jnp.abs(x - y).max()), a, b)))

    for stag in ("center", "corner"):
        spec = topo.scalar_spec(stag)
        assert spec.structured, stag
        assert both(lambda s=spec: halo_mod.halo_update_scalar(q, s)) == 0.0
    for us, vs in (("y_iface", "x_iface"), ("x_iface", "y_iface"),
                   ("center", "center")):
        assert both(
            lambda us=us, vs=vs: halo_mod.halo_update_vector(topo, u, v, us, vs)
        ) == 0.0
        assert both(
            lambda us=us, vs=vs: halo_mod.halo_update_staggered_pair(
                topo, u, v, us, vs)
        ) == 0.0
    assert both(lambda: halo_mod.synchronize_vector_interfaces(
        topo, u, v, "y_iface", "x_iface")) == 0.0


def test_structured_corner_equivalence():
    """Structured (CopyOp) corner fills are bitwise equal to the
    permutation-gather forms for every variant."""
    from pace_tpu.parallel import copyops
    from pace_tpu.ops import corners as C

    rng = np.random.RandomState(8)
    n, h = 12, 3
    Nn = 24
    q = jnp.asarray(rng.randn(6, Nn, Nn, 2))
    qc = jnp.asarray(rng.randn(6, Nn, Nn, 2))
    x = jnp.asarray(rng.randn(6, Nn, Nn, 2))
    y = jnp.asarray(rng.randn(6, Nn, Nn, 2))

    def both(fn):
        import jax

        old = copyops.HALO_MODE
        try:
            copyops.HALO_MODE = "gather"
            a = fn()
            copyops.HALO_MODE = "ppermute"
            b = fn()
        finally:
            copyops.HALO_MODE = old
        return max(jax.tree_util.tree_leaves(jax.tree_util.tree_map(
            lambda s, t: float(jnp.abs(s - t).max()), a, b)))

    for d in ("x", "y"):
        assert both(lambda d=d: C.copy_corners(q, n, h, d)) == 0.0
        for nc in (2, 3):
            assert both(lambda d=d, nc=nc: C.fill_corners_cells(
                q, qc, n, h, d, nc, 1.0, -1.0, -1.0, 1.0)) == 0.0
        for g in ("A", "B"):
            assert both(lambda g=g, d=d: C.fill_corners_2d(q, n, h, g, d)) == 0.0
    for g in ("A", "C", "D"):
        for vec in (True, False):
            assert both(lambda g=g, vec=vec: C.fill_corners_vector(
                x, y, n, h, g, vec)) == 0.0
