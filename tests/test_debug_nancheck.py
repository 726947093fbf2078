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


def test_statecheck_negative_delp(monkeypatch):
    """PACE_DEBUG_STATECHECK: delp < 0 in the compute domain must raise
    (reference sdfg_debug_passes.py:185 negative_delp_checker)."""
    from pace_tpu.utils import debug

    monkeypatch.setattr(debug, "STATECHECK_ENABLED", True)
    n, h = 4, 3
    good = np.full((6, 16, 16, 2), 10.0)
    bad = good.copy()
    bad[1, h + 1, h + 2, 0] = -1.0
    debug._host_check("stage", n, h, ("delp",), good)  # no raise
    with pytest.raises(debug.NegativeValueDetected,
                       match=r"negative delp.*'delp'"):
        debug._host_check("stage", n, h, ("delp",), bad)
    # negative delp in the halo padding is legitimate mid-graph
    pad = good.copy()
    pad[:, 0, 0, :] = -5.0
    debug._host_check("stage", n, h, ("delp",), pad)  # no raise


def test_statecheck_negative_tracer(monkeypatch):
    """Tracer < -1e-8 raises; tiny negative round-off (> -1e-8) passes,
    matching the reference threshold (sdfg_debug_passes.py:238)."""
    from pace_tpu.utils import debug

    monkeypatch.setattr(debug, "STATECHECK_ENABLED", True)
    n, h = 4, 3
    roundoff = np.full((6, 16, 16, 2), 1e-6)
    roundoff[2, h, h, 1] = -5e-9  # within tolerance
    debug._host_check("s", n, h, ("qvapor",), roundoff)  # no raise
    bad = roundoff.copy()
    bad[2, h, h, 1] = -1e-3
    with pytest.raises(debug.NegativeValueDetected,
                       match=r"negative tracer.*'qvapor'"):
        debug._host_check("s", n, h, ("qvapor",), bad)
    # non-tracer fields may be negative (winds etc.)
    debug._host_check("s", n, h, ("u",), np.full((6, 16, 16, 2), -40.0))


def test_statecheck_disabled_means_finite_only():
    """With only NANCHECK semantics (STATECHECK off), negative values are
    not an error."""
    from pace_tpu.utils import debug

    assert not debug.STATECHECK_ENABLED
    n, h = 4, 3
    neg = np.full((6, 16, 16, 2), -1.0)
    debug._host_check("s", n, h, ("delp", "qvapor"), neg, neg)  # no raise
