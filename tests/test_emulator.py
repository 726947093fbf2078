"""ML microphysics emulator (models/physics/emulator.py): drop-in
compatibility with the GFDL scheme in the physics driver, exact water
conservation under the projection, and the no-op property of untrained
weights (BASELINE.md north star 5)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pace_tpu.models.physics.emulator import (
    INPUT_FIELDS,
    MLPEmulatorConfig,
    MicrophysicsEmulator,
    load_params,
    save_params,
)

NZ = 31


def _mp_state(key=0, n=8, nz=NZ, dtype=jnp.float32):
    from pace_tpu.models.physics.microphysics import MicrophysicsState

    rng = np.random.RandomState(key)
    shp = (6, n, n, nz)

    def f(scale, offset=0.0):
        return jnp.asarray(
            offset + scale * rng.rand(*shp).astype(np.float64), dtype
        )

    return MicrophysicsState(
        pt=f(40.0, 240.0), qvapor=f(1e-2), qliquid=f(1e-4),
        qrain=f(1e-4), qice=f(1e-4), qsnow=f(1e-4), qgraupel=f(1e-5),
        qcld=f(0.3), ua=f(10.0), va=f(10.0), delp=f(100.0, 900.0),
        delz=f(-300.0, -100.0), omga=f(0.1), delprsi=f(100.0, 900.0),
        wmp=f(0.1), dz=f(-300.0, -100.0), land=jnp.zeros(shp[:-1], dtype),
    )


def test_untrained_emulator_is_noop():
    """Zero-initialized output layer -> exactly zero tendencies."""
    emu = MicrophysicsEmulator(MLPEmulatorConfig(), NZ)
    tend = jax.jit(emu.__call__)(_mp_state())
    for name in ("qv_dt", "ql_dt", "pt_dt", "qa_dt", "udt", "vdt"):
        assert float(jnp.abs(tend[name]).max()) == 0.0, name


def _trained_emulator(tmp_path, conserve=True):
    """Random nonzero weights via save/load round-trip."""
    emu = MicrophysicsEmulator(
        MLPEmulatorConfig(hidden_sizes=(64,), conserve_water=conserve), NZ
    )
    rng = np.random.RandomState(7)
    last = f"w{len(emu.config.hidden_sizes)}"
    emu.params[last] = jnp.asarray(
        0.1 * rng.randn(*emu.params[last].shape), jnp.float32
    )
    path = str(tmp_path / "weights.npz")
    save_params(emu.params, path)
    return MicrophysicsEmulator(
        MLPEmulatorConfig(hidden_sizes=(64,), weights_path=path,
                          conserve_water=conserve), NZ
    )


def test_weights_roundtrip_and_water_conservation(tmp_path):
    emu = _trained_emulator(tmp_path)
    state = _mp_state()
    tend = jax.jit(emu.__call__)(state)
    # nonzero tendencies now
    assert float(jnp.abs(tend["qv_dt"]).max()) > 0.0
    # column total-water tendency integrates to ~0 against delp
    total = sum(
        tend[k] for k in
        ("qv_dt", "ql_dt", "qr_dt", "qi_dt", "qs_dt", "qg_dt")
    )
    col = jnp.sum(total * state.delp, -1)
    mass = jnp.sum(jnp.abs(tend["qv_dt"]) * state.delp, -1) + 1e-30
    assert float(jnp.abs(col / mass).max()) < 1e-5


def test_emulator_in_physics_driver():
    """Physics(scheme='emulator') runs end-to-end under jit and fills the
    physics_updated_* fields, interchangeable with the GFDL scheme."""
    from pace_tpu.grid.generation import generate_grid_data
    from pace_tpu.models.coupler import DycoreToPhysics
    from pace_tpu.models.fv3.init.baroclinic import init_baroclinic_state
    from pace_tpu.models.physics.config import PhysicsConfig
    from pace_tpu.models.physics.physics import Physics
    from pace_tpu.utils.gridtools import GridSizing

    n, nz, dt = 12, 79, 300.0
    sizing = GridSizing(n, nz)
    gd = generate_grid_data(n, nz, dtype=jnp.float64)
    ptop = float(np.asarray(jax.device_get(gd.vertical.ptop)))
    config = PhysicsConfig(
        dt_atmos=dt, npz=nz, microphysics_scheme="emulator",
        emulator=MLPEmulatorConfig(hidden_sizes=(32,),
                                   compute_dtype="float32"),
    )
    physics = Physics(config, gd.horizontal.area, ptop, dt)
    d2p = DycoreToPhysics(sizing, dtype=jnp.float64)
    state = init_baroclinic_state(sizing, dtype=jnp.float64)
    phy = d2p(state)
    out = jax.jit(physics.__call__)(phy)
    h = sizing.halo
    upd = np.asarray(
        out.physics_updated_specific_humidity[:, h:h + n, h:h + n]
    )
    assert np.isfinite(upd).all()
    # untrained -> no-op: humidity equals the statein-converted GFS
    # humidity (tendency is exactly zero)
    qv0 = np.asarray(out.qvapor[:, h:h + n, h:h + n])
    np.testing.assert_array_equal(upd, qv0)


def test_rejects_unknown_scheme():
    from pace_tpu.models.physics.config import PhysicsConfig
    from pace_tpu.models.physics.physics import Physics

    with pytest.raises(ValueError, match="microphysics_scheme"):
        Physics(
            PhysicsConfig(microphysics_scheme="nope"),
            jnp.ones((6, 4, 4)), 300.0, 225.0,
        )


def test_input_fields_exist_on_state():
    state = _mp_state()
    for name in INPUT_FIELDS:
        assert hasattr(state, name), name


def test_load_params_matches_saved(tmp_path):
    emu = MicrophysicsEmulator(MLPEmulatorConfig(hidden_sizes=(16,)), NZ)
    path = str(tmp_path / "w.npz")
    save_params(emu.params, path)
    loaded = load_params(path)
    for k, v in emu.params.items():
        np.testing.assert_array_equal(np.asarray(v), np.asarray(loaded[k]))
    assert set(loaded) == set(emu.params)


def test_bfloat16_compute_path():
    """The bf16 matmul path runs and produces finite f32 tendencies."""
    emu = MicrophysicsEmulator(
        MLPEmulatorConfig(hidden_sizes=(32,), compute_dtype="bfloat16"), NZ
    )
    rng = np.random.RandomState(3)
    w1 = emu.params["w1"]
    emu.params["w1"] = jnp.asarray(
        0.1 * rng.randn(*w1.shape), jnp.float32
    )
    tend = jax.jit(emu.__call__)(_mp_state())
    assert tend["qv_dt"].dtype == jnp.float32
    assert bool(jnp.isfinite(tend["qv_dt"]).all())
