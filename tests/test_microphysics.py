"""GFDL cloud microphysics: conservation and physical-behavior tests.

Strategy mirrors the reference's translate-test philosophy (SURVEY.md §4):
since savepoint data is unavailable, validate the scheme by its conservation
laws and sign conventions, which any indexing/mask bug destroys.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from pace_tpu.models.physics.config import PhysicsConfig
from pace_tpu.models.physics.microphysics import (
    Microphysics,
    MicrophysicsState,
    wqs1,
    wqs2,
    iqs1,
    iqs2,
)
from pace_tpu.utils import constants as con

NZ = 24


def _column_state(nx=4, ny=3, nz=NZ, supersat_k=None, dtype=jnp.float64):
    """A plausible tropical-ish sounding: p from ~200 to ~1000 hPa."""
    shape3 = (nx, ny, nz)
    k = np.arange(nz)
    p_mid = np.linspace(2.0e4, 1.0e5, nz)  # Pa
    dp = np.gradient(p_mid)
    t = np.linspace(215.0, 300.0, nz)
    rho = p_mid / (con.RDGAS * t)
    dz = -dp / (con.GRAV * rho)  # negative, FV3 convention

    t3 = np.broadcast_to(t, shape3).copy()
    rho3 = np.broadcast_to(rho, shape3)
    qsat = np.asarray(wqs1(jnp.asarray(t3), jnp.asarray(rho3)))
    qv = 0.8 * qsat
    if supersat_k is not None:
        qv[..., supersat_k] = 1.3 * qsat[..., supersat_k]

    ql = np.zeros(shape3)
    qr = np.zeros(shape3)
    qi = np.zeros(shape3)
    qs = np.zeros(shape3)
    qg = np.zeros(shape3)
    warm = t3 > 273.16
    cold = t3 < 260.0
    ql[warm] = 1.2e-4
    qr[warm] = 8.0e-5
    qi[cold] = 5.0e-5
    qs[cold] = 2.0e-5
    qg[cold] = 1.0e-5

    def a3(x):
        return jnp.asarray(np.broadcast_to(x, shape3).copy(), dtype)

    return MicrophysicsState(
        pt=a3(t3), qvapor=a3(qv), qliquid=a3(ql), qrain=a3(qr), qice=a3(qi),
        qsnow=a3(qs), qgraupel=a3(qg), qcld=a3(np.zeros(shape3)),
        ua=a3(5.0 * np.ones(shape3)), va=a3(-3.0 * np.ones(shape3)),
        delp=a3(dp), delz=a3(dz), omga=a3(np.zeros(shape3)),
        delprsi=a3(dp), wmp=a3(0.01 * np.ones(shape3)), dz=a3(dz),
        land=jnp.zeros((nx, ny), dtype),
    )


@pytest.fixture(scope="module")
def mp_out():
    config = PhysicsConfig()
    state = _column_state(supersat_k=18)
    area = jnp.full((4, 3), 1.0e10, jnp.float64)  # ~(100 km)^2
    mp = Microphysics(config, area, timestep=225.0)
    out = mp(state)
    return config, state, mp, out


def test_no_nans(mp_out):
    _, _, _, out = mp_out
    for name, v in out.items():
        assert not bool(jnp.isnan(v).any()), f"NaN in {name}"


def test_total_water_conservation(mp_out):
    """Column-integrated water change equals precipitated mass.

    The scheme only moves water between categories and out the bottom;
    sum_k dp0 * sum_q q_dt / rdt == -(precip mass).  Reference guarantees
    the same (gfdl_cloud_microphys.F90 design)."""
    config, state, mp, out = mp_out
    dt = mp.timestep
    rdt = 1.0 / dt
    dp0 = state.delprsi
    q_dt_sum = (
        out["qv_dt"] + out["ql_dt"] + out["qr_dt"] + out["qi_dt"]
        + out["qs_dt"] + out["qg_dt"]
    )
    water_change = jnp.sum(dp0 * q_dt_sum / rdt, axis=-1)
    convt = 86400.0 * rdt * con.RGRAV
    precip_mass = (
        out["rain"] + out["snow"] + out["ice"] + out["graupel"]
    ) / convt
    np.testing.assert_allclose(
        np.asarray(water_change), -np.asarray(precip_mass),
        rtol=1e-9, atol=1e-10,
    )


def test_supersaturated_layer_condenses(mp_out):
    """The 30%-supersaturated layer must condense (ql up, heating)."""
    _, _, _, out = mp_out
    assert float(out["ql_dt"][..., 18].min()) > 0.0
    assert float(out["pt_dt"][..., 18].min()) > 0.0


def test_rain_reaches_surface(mp_out):
    _, _, _, out = mp_out
    assert float(out["rain"].min()) > 0.0


def test_tendencies_bounded(mp_out):
    """Sanity bounds: |dT/dt| < 0.05 K/s, |dq/dt| < 1e-5 /s for dt=225s."""
    _, _, _, out = mp_out
    assert float(jnp.abs(out["pt_dt"]).max()) < 0.05
    for name in ("qv_dt", "ql_dt", "qr_dt", "qi_dt", "qs_dt", "qg_dt"):
        assert float(jnp.abs(out[name]).max()) < 1e-5, name


def test_positivity_of_final_state(mp_out):
    """Applying the (dry-mixing-ratio) tendencies must not drive any
    species negative beyond roundoff."""
    config, state, mp, out = mp_out
    dt = mp.timestep
    for q0, name in (
        (state.qvapor, "qv_dt"), (state.qliquid, "ql_dt"),
        (state.qrain, "qr_dt"), (state.qice, "qi_dt"),
        (state.qsnow, "qs_dt"), (state.qgraupel, "qg_dt"),
    ):
        q1 = q0 + dt * out[name]
        assert float(q1.min()) > -1e-12, name


def test_sedimentation_momentum_sign(mp_out):
    """Falling condensate drags momentum downward: where rain fell from a
    faster layer onto a slower one, wind tendencies are finite and small."""
    _, _, _, out = mp_out
    assert float(jnp.abs(out["udt"]).max()) < 1.0
    assert float(jnp.abs(out["vdt"]).max()) < 1.0


def test_saturation_functions_consistent():
    """wqs2/iqs2 gradients match finite differences of wqs1/iqs1 to within
    the q/t term the scheme intentionally drops (~5%; the reference's
    dqsdt differentiates only the Clausius-Clapeyron exponential)."""
    t = jnp.asarray(np.linspace(180.0, 330.0, 101))
    den = jnp.full_like(t, 1.0)
    for f1, f2 in ((wqs1, wqs2), (iqs1, iqs2)):
        q, dqdt = f2(t, den)
        eps = 1e-4
        fd = (f1(t + eps, den) - f1(t - eps, den)) / (2 * eps)
        # exclude the clamp breakpoints where the derivative jumps
        mask = (
            (jnp.abs(t - con.TICE) > 1.0)
            & (jnp.abs(t - con.T_SAT_MIN) > 1.0)
            & (jnp.abs(t - (con.TICE + 102.0)) > 1.0)
        )
        err = jnp.where(mask, jnp.abs(dqdt - fd) / (jnp.abs(fd) + 1e-12), 0.0)
        assert float(err.max()) < 0.1


def test_cold_rain_freezes():
    """Supercooled rain in a subfreezing column becomes snow/graupel."""
    config = PhysicsConfig()
    state = _column_state()
    # make the whole column subfreezing with supercooled rain
    pt = jnp.full_like(state.pt, 258.0)
    qr = jnp.full_like(state.qrain, 2.0e-4)
    state = MicrophysicsState(
        **{
            **{f.name: getattr(state, f.name)
               for f in state.__dataclass_fields__.values()},
            "pt": pt, "qrain": qr,
        }
    )
    area = jnp.full((4, 3), 1.0e10, jnp.float64)
    mp = Microphysics(config, area, timestep=225.0)
    out = mp(state)
    frozen_gain = out["qs_dt"] + out["qg_dt"] + out["qi_dt"]
    assert float(frozen_gain.max()) > 0.0
    assert float(out["qr_dt"].min()) < 0.0


def test_do_qa_false_cloud_fraction():
    """do_qa=False activates the explicit cloud-fraction branch: a
    saturated column must report qa_dt > 0 (partial/full cloud cover)."""
    config = PhysicsConfig(do_qa=False, fast_sat_adj=False)
    state = _column_state(supersat_k=18)
    area = jnp.full((4, 3), 1.0e10, jnp.float64)
    mp = Microphysics(config, area, timestep=225.0)
    out = mp(state)
    assert not bool(jnp.isnan(out["qa_dt"]).any())
    assert float(out["qa_dt"].max()) > 0.0


def test_do_sedi_heat():
    """Sedimentation heating: falling rain converts potential energy to
    heat; temperatures stay finite and the column still conserves water."""
    config = PhysicsConfig(do_sedi_heat=True)
    state = _column_state()
    area = jnp.full((4, 3), 1.0e10, jnp.float64)
    mp = Microphysics(config, area, timestep=225.0)
    out = mp(state)
    assert not bool(jnp.isnan(out["pt_dt"]).any())
    dp0 = state.delprsi
    q_dt_sum = (out["qv_dt"] + out["ql_dt"] + out["qr_dt"] + out["qi_dt"]
                + out["qs_dt"] + out["qg_dt"])
    water_change = jnp.sum(dp0 * q_dt_sum * 225.0, axis=-1)
    convt = 86400.0 / 225.0 * (1.0 / con.GRAV)
    precip = (out["rain"] + out["snow"] + out["ice"]
              + out["graupel"]) / convt
    np.testing.assert_allclose(np.asarray(water_change),
                               -np.asarray(precip), rtol=1e-9, atol=1e-10)


def test_const_fall_speeds():
    """const_v* flags use fixed fall-speed factors; scheme stays finite."""
    config = PhysicsConfig(const_vi=True, const_vs=True, const_vg=True,
                           const_vr=True, vi_fac=1.0 / 3, vs_fac=1.0,
                           vg_fac=2.0, vr_fac=4.0)
    state = _column_state()
    area = jnp.full((4, 3), 1.0e10, jnp.float64)
    mp = Microphysics(config, area, timestep=225.0)
    out = mp(state)
    for v in out.values():
        assert not bool(jnp.isnan(v).any())


def test_prog_ccn():
    config = PhysicsConfig(prog_ccn=True)
    state = _column_state()
    area = jnp.full((4, 3), 1.0e10, jnp.float64)
    mp = Microphysics(config, area, timestep=225.0)
    out = mp(state)
    for v in out.values():
        assert not bool(jnp.isnan(v).any())


def test_analytic_qs_matches_tables():
    """The analytic saturation functions must match linear interpolation of
    the reference tables to the tables' own discretization error."""
    import numpy as np
    import jax.numpy as jnp
    from pace_tpu.ops import saturation_adjustment as sa
    from pace_tpu.utils import constants

    table, table2, tablew, des2, desw = sa._qs_tables()
    ta = np.linspace(constants.T_SAT_MIN + 0.05, constants.T_SAT_MIN + 260.0,
                     4001)
    den = np.full_like(ta, 1.2)

    def table_interp(tin, tab, des):
        ap1 = 10.0 * np.maximum(tin - constants.T_SAT_MIN, 0.0) + 1.0
        ap1 = np.minimum(ap1, sa.QS_LENGTH) - 1.0
        it = np.floor(ap1).astype(int)
        es = tab[it] + (ap1 - it) * des[it]
        return es / (constants.RVGAS * tin * den)

    for kind, tab, des in (("w", tablew, desw), ("i2", table2, des2)):
        got = np.asarray(sa._wqs1(jnp.asarray(ta), jnp.asarray(den), kind))
        ref = table_interp(ta, tab, des)
        # exclude the 0.3 K ice/water transition sliver the reference
        # smooths pointwise
        mask = np.abs(ta - constants.TICE) > 0.3
        rel = np.abs(got - ref)[mask] / np.maximum(ref[mask], 1e-30)
        assert rel.max() < 5e-4, (kind, rel.max())  # table's own interp error at cold T
