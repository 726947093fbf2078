"""GEOS wrapper: numpy-in / numpy-out single-step embedding interface."""

import numpy as np

from pace_tpu.models.fv3.geos_wrapper import GeosDycoreWrapper
from pace_tpu.models.fv3.init.baroclinic import init_baroclinic_state
from pace_tpu.models.fv3.state import TRACER_NAMES
from pace_tpu.utils.gridtools import GridSizing


def test_geos_wrapper_roundtrip():
    import jax.numpy as jnp

    nml = {"fv_core_nml": {
        "npx": 13, "npy": 13, "npz": 79, "do_sat_adj": False,
        "dt_atmos": 225,
    }}
    wrapper = GeosDycoreWrapper(nml, dtype=jnp.float64)
    state = init_baroclinic_state(GridSizing(12, 79), dtype=jnp.float64)
    fields = {
        name: np.asarray(getattr(state, name))
        for name in ("u", "v", "w", "delz", "pt", "delp", "ps", "pe",
                     "pk", "peln", "pkz", "phis", "q_con", "omga", "ua",
                     "va", "uc", "vc", "mfxd", "mfyd", "cxd", "cyd",
                     "diss_estd")
    }
    q = np.stack(
        [np.asarray(getattr(state, name)) for name in TRACER_NAMES], -1
    )
    out = wrapper(q, **fields)
    assert set(out) == set(fields) | {"q"}
    h, n = 3, 12
    interior = out["pt"][:, h:h + n, h:h + n]
    assert np.isfinite(interior).all()
    assert 150.0 < interior.min() and interior.max() < 350.0
    # zonality preserved through the wrapper path
    va = out["va"][:, h:h + n, h:h + n]
    assert np.abs(va).max() < 1.0
    assert out["q"].shape[-1] == len(TRACER_NAMES)
