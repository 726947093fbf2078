"""Halo-traffic record/replay: single-tile re-run of a multi-tile
computation (the CachingCommWriter/Reader analogue, VERDICT r1 missing
#7; reference util/pace/util/caching_comm.py:89-235)."""

import numpy as np
import pytest

import jax.numpy as jnp

from pace_tpu.parallel import halo as halo_mod
from pace_tpu.parallel.topology import get_topology
from pace_tpu.parallel.traffic import HaloTrafficRecorder

N_, H = 12, 3


@pytest.fixture(scope="module")
def topo():
    return get_topology(N_, H)


def _mini_model(topo, q, u, v):
    """A small halo-dependent computation: scalar + vector updates with
    local stencil work in between (eager; stand-in for a debug step)."""
    spec = topo.scalar_spec("center")
    q = halo_mod.halo_update_scalar(q, spec)
    q = q + 0.25 * (
        jnp.roll(q, 1, axis=1) + jnp.roll(q, -1, axis=1)
        + jnp.roll(q, 1, axis=2) + jnp.roll(q, -1, axis=2)
    )
    u, v = halo_mod.halo_update_vector(topo, u, v, "y_iface", "x_iface")
    div = u + v + q
    u, v = halo_mod.synchronize_vector_interfaces(
        topo, u, v, "y_iface", "x_iface")
    return q, u, v, div


def test_record_then_replay_single_tile(topo, tmp_path):
    rng = np.random.RandomState(11)
    Nn = topo.N
    q = jnp.asarray(rng.randn(6, Nn, Nn))
    u = jnp.asarray(rng.randn(6, Nn, Nn))
    v = jnp.asarray(rng.randn(6, Nn, Nn))

    rec = HaloTrafficRecorder.recording()
    with rec:
        full = _mini_model(topo, q, u, v)
    assert len(rec.calls) == 5  # 1 scalar + 2 vector comps + 2 sync comps

    path = str(tmp_path / "traffic.npz")
    rec.save(path)
    loaded = HaloTrafficRecorder.load(path)
    assert len(loaded.calls) == len(rec.calls)

    tile = 4
    rep = loaded.replaying(tile=tile)
    with rep:
        solo = _mini_model(
            topo, q[tile:tile + 1], u[tile:tile + 1], v[tile:tile + 1])

    # the single-tile replay reproduces the full run's tile exactly
    for got, want in zip(solo, full):
        np.testing.assert_array_equal(
            np.asarray(got)[0], np.asarray(want)[tile])


def test_replay_full_cube(topo, tmp_path):
    """tile=None replays onto full-cube arrays (traffic-pinned rerun)."""
    rng = np.random.RandomState(12)
    Nn = topo.N
    q = jnp.asarray(rng.randn(6, Nn, Nn))
    spec = topo.scalar_spec("center")

    rec = HaloTrafficRecorder.recording()
    with rec:
        full = halo_mod.halo_update_scalar(q, spec)
    rep = rec.replaying()
    with rep:
        replayed = halo_mod.halo_update_scalar(q, spec)
    np.testing.assert_array_equal(np.asarray(replayed), np.asarray(full))


def test_replay_mismatch_raises(topo):
    rng = np.random.RandomState(13)
    Nn = topo.N
    q = jnp.asarray(rng.randn(6, Nn, Nn))
    u = jnp.asarray(rng.randn(6, Nn, Nn))
    v = jnp.asarray(rng.randn(6, Nn, Nn))
    spec = topo.scalar_spec("center")

    rec = HaloTrafficRecorder.recording()
    with rec:
        halo_mod.halo_update_scalar(q, spec)
    rep = rec.replaying(tile=0)
    with rep:
        # vector update where a scalar was recorded -> kind mismatch
        with pytest.raises(RuntimeError, match="mismatch"):
            halo_mod.halo_update_vector(
                topo, u[:1], v[:1], "y_iface", "x_iface")
        rep.cursor = 0
        halo_mod.halo_update_scalar(q[:1], spec)
        # recording exhausted
        with pytest.raises(RuntimeError, match="exhausted"):
            halo_mod.halo_update_scalar(q[:1], spec)


def test_record_tracer_advection(topo):
    """Recording must survive tracer_advection's batched halo gathers —
    a vmap'd halo update hands tracers to on_result, which previously
    raised TracerArrayConversionError (round-2 review fix: recorded runs
    take a per-tracer loop)."""
    from pace_tpu.grid.generation import generate_grid_data
    from pace_tpu.ops import tracer_advection as tradv

    rng = np.random.RandomState(3)
    Nn, nz = topo.N, 4
    gd = generate_grid_data(N_, 79, dtype=jnp.float64)

    def fields():
        return jnp.asarray(rng.rand(6, Nn, Nn, nz) + 1.0)

    tracers = {"qvapor": fields(), "qcld": fields()}
    dp1 = fields()
    kw = dict(gd=gd, topo=topo, n=N_, h=H, hord_tr=8)
    rec = HaloTrafficRecorder(mode="record")
    with rec:
        out = tradv.tracer_advection(
            dict(tracers), dp1, fields(), fields(),
            0.1 * fields(), 0.1 * fields(), **kw,
        )
    assert set(out) == set(tracers)
    for v in out.values():
        assert np.isfinite(np.asarray(v)[:, H:H + N_, H:H + N_]).all()
    assert len(rec.calls) > 0
