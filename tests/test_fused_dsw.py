"""Fused d_sw five-field transport vs the default path.

PACE_FUSED_DSW=1 routes d_sw's delp/w/q_con/pt/vorticity transports
through ONE batched Pallas means-kernel call (the per-field unit-flux
multiply applied in XLA over all-ones-unit-flux transport_batched means);
here it runs in interpret mode on CPU and the full d_sw output dict is
pinned against the all-jnp default path (reference op: ai2cm/pace
fv3core/pace/fv3core/stencils/d_sw.py:935-1237).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from pace_tpu.grid.generation import generate_grid_data
from pace_tpu.models.fv3.config import DynamicalCoreConfig, get_column_namelist
from pace_tpu.ops import d_sw as d_sw_mod
from pace_tpu.ops.pallas import fvtp2d_pallas
from pace_tpu.parallel import halo as halo_mod
from pace_tpu.parallel.topology import CubedSphereTopology

N_, H, NZ = 12, 3, 8


def _smooth(rng, shape, scale, base=0.0):
    raw = rng.standard_normal(shape)
    for ax in (1, 2):
        raw = 0.5 * raw + 0.25 * (np.roll(raw, 1, ax) + np.roll(raw, -1, ax))
    return jnp.asarray(base + scale * raw, jnp.float64)


def _inputs():
    gd = generate_grid_data(N_, 79, dtype=jnp.float64)
    topo = CubedSphereTopology(N_, H)
    rng = np.random.default_rng(3)
    shape = (6, topo.N, topo.N, NZ)
    spec = topo.scalar_spec("center")

    def halo(q):
        return halo_mod.halo_update_scalar(q, spec)

    fields = dict(
        delp=halo(_smooth(rng, shape, 5.0, base=100.0)),
        pt=halo(_smooth(rng, shape, 5.0, base=280.0)),
        w=halo(_smooth(rng, shape, 0.5)),
        q_con=halo(jnp.abs(_smooth(rng, shape, 0.001, base=0.002))),
    )
    u, v = halo_mod.halo_update_vector(
        topo, _smooth(rng, shape, 8.0), _smooth(rng, shape, 8.0),
        "y_iface", "x_iface",
    )
    uc, vc = halo_mod.halo_update_vector(
        topo, _smooth(rng, shape, 8.0), _smooth(rng, shape, 8.0),
        "x_iface", "y_iface",
    )
    fields.update(u=u, v=v, uc=uc, vc=vc)
    fields.update(
        ua=_smooth(rng, shape, 8.0), va=_smooth(rng, shape, 8.0),
        divgd=jnp.zeros(shape, jnp.float64),
        mfx=jnp.zeros(shape, jnp.float64),
        mfy=jnp.zeros(shape, jnp.float64),
        cx=jnp.zeros(shape, jnp.float64),
        cy=jnp.zeros(shape, jnp.float64),
        heat_source=jnp.zeros(shape, jnp.float64),
        diss_est=jnp.zeros(shape, jnp.float64),
        ut_in=jnp.zeros(shape, jnp.float64),
        vt_in=jnp.zeros(shape, jnp.float64),
    )
    config = DynamicalCoreConfig(npz=NZ)
    col = get_column_namelist(config, NZ)
    return fields, gd, col, config


def _run(fields, gd, col, config):
    out = d_sw_mod.d_sw(
        fields["delp"], fields["pt"], fields["u"], fields["v"],
        fields["w"], fields["uc"], fields["vc"], fields["ua"],
        fields["va"], fields["divgd"], fields["mfx"], fields["mfy"],
        fields["cx"], fields["cy"], fields["q_con"],
        fields["heat_source"], fields["diss_est"], fields["ut_in"],
        fields["vt_in"], gd, col, config, N_, H, 100.0,
    )
    return {k: np.asarray(v) for k, v in out.items()}


def test_fused_dsw_matches_default(monkeypatch):
    fields, gd, col, config = _inputs()
    assert config.hord_dp == config.hord_vt == config.hord_tm

    monkeypatch.delenv("PACE_PALLAS", raising=False)
    monkeypatch.delenv("PACE_FUSED_DSW", raising=False)
    ref = _run(fields, gd, col, config)

    # f64 in interpret mode: Mosaic's 64-bit restriction (the reason
    # enabled() rejects f64) does not apply, so force the gate open and
    # pin the equivalence at f64 rounding.
    monkeypatch.setenv("PACE_FUSED_DSW", "1")
    monkeypatch.setattr(fvtp2d_pallas, "enabled", lambda dtype=None: True)
    monkeypatch.setattr(fvtp2d_pallas, "INTERPRET", True)
    assert fvtp2d_pallas.fused_dsw_enabled(jnp.float64)
    fused = _run(fields, gd, col, config)

    assert set(fused) == set(ref)
    for name, want in ref.items():
        got = fused[name]
        finite = np.isfinite(want)
        np.testing.assert_array_equal(
            np.isnan(got), np.isnan(want),
            err_msg=f"{name}: NaN pattern differs under PACE_FUSED_DSW",
        )
        np.testing.assert_array_equal(
            np.isfinite(got), finite,
            err_msg=f"{name}: inf pattern differs under PACE_FUSED_DSW",
        )
        np.testing.assert_allclose(
            got[finite], want[finite], rtol=1e-10, atol=1e-12,
            err_msg=f"d_sw output {name} diverges under PACE_FUSED_DSW",
        )
