"""PACE_DEBUG_NANCHECK per-stage finiteness mode (the analogue of the
reference's injected SDFG NaN-checker pass, sdfg_debug_passes.py:247)."""

import numpy as np
import pytest


def test_host_check_raises_with_stage_and_field():
    from pace_tpu.utils.debug import NaNDetected, _host_check

    good = np.ones((6, 10, 10, 4))
    bad = np.ones((6, 10, 10, 4))
    bad[2, 5, 5, 1] = np.nan
    _host_check("stage_a", 4, 3, ("x",), good)  # must not raise
    with pytest.raises(NaNDetected, match=r"stage_b.*field 'y'"):
        _host_check("stage_b", 4, 3, ("x", "y"), good, bad)


def test_halo_padding_nans_ignored():
    """NaN outside the compute domain must not trip the checker — padding
    cells legitimately hold NaN mid-graph."""
    from pace_tpu.utils.debug import _host_check

    n, h = 4, 3
    arr = np.ones((6, 16, 16, 2))
    arr[:, 0, 0, :] = np.nan  # corner-wedge / padding region
    arr[:, h + n + 1:, :, :] = np.nan
    _host_check("stage", n, h, ("f",), arr)  # no raise


def test_nancheck_noop_when_disabled():
    """With the env var unset (the default in this process), nancheck must
    not insert anything into the graph."""
    import jax
    import jax.numpy as jnp

    from pace_tpu.utils import debug

    assert not debug.NANCHECK_ENABLED

    def f(x):
        debug.nancheck("s", 4, 3, x=x)
        return x * 2

    text = jax.jit(f).lower(jnp.ones((6, 16, 16))).as_text()
    assert "callback" not in text


def test_nancheck_fires_inside_jit(monkeypatch):
    import jax
    import jax.numpy as jnp

    from pace_tpu.utils import debug

    monkeypatch.setattr(debug, "NANCHECK_ENABLED", True)
    n, h = 4, 3

    def f(x):
        y = jnp.where(x > 0, jnp.nan, x)
        debug.nancheck("poisoned", n, h, y=y)
        return y

    x = jnp.ones((6, 16, 16))
    with pytest.raises(Exception, match="poisoned"):
        jax.block_until_ready(jax.jit(f)(x))
