"""External numerics anchor: Jablonowski & Williamson (2006) baroclinic
wave, day-by-day thresholded regression.

`tests/golden/jw_day9.json` is the committed artifact produced by
`scripts/jw_regression.py` (C24/79 f32, dt=300, 9 simulated days on the
TPU chip).  This test validates it against *published* JW06 behavior
(Figs. 6-8: quiet until ~day 4, explosive deepening to ~960-975 hPa by
day 9 at medium resolution, cyclone in the northern mid-latitudes
downstream of the 20E perturbation) — an external anchor that any
regression in halo rotation, pressure-gradient, or remap numerics
breaks, unlike the self-referential golden digests.

The artifact must be REGENERATED (not hand-edited) whenever numerics
intentionally change: `python scripts/jw_regression.py`.
"""

import json
import os

import pytest

ARTIFACT = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "golden", "jw_day9.json")


@pytest.fixture(scope="module")
def artifact():
    with open(ARTIFACT) as f:
        return json.load(f)


def _day(artifact, d):
    for rec in artifact["days"]:
        if rec["day"] == d:
            return rec
    raise AssertionError(f"day {d} missing from artifact")


def test_artifact_covers_nine_days(artifact):
    assert [r["day"] for r in artifact["days"]] == list(range(1, 10))
    assert artifact["config"]["n"] == 24


def test_early_days_quiescent(artifact):
    """Days 1-4: the 1 m/s perturbation has not yet amplified — surface
    pressure stays within a few hPa of the initial 1000 hPa minimum
    (JW06 Fig. 6: deepening begins ~day 4-6)."""
    for d in (1, 2, 3, 4):
        rec = _day(artifact, d)
        assert 995.0 < rec["ps_min_hpa"] < 1001.0, rec
        assert rec["max_abs_va"] < 10.0, rec


def test_explosive_deepening_by_day9(artifact):
    """Day 8-9: the wave breaks; ps_min reaches ~960-980 hPa and
    meridional winds tens of m/s (JW06 Fig. 8; coarse-resolution runs
    deepen slightly less than the converged ~955 hPa)."""
    d8, d9 = _day(artifact, 8), _day(artifact, 9)
    assert d8["ps_min_hpa"] < 990.0, d8
    assert 945.0 < d9["ps_min_hpa"] < 985.0, d9
    assert 15.0 < d9["max_abs_va"] < 60.0, d9
    assert d9["ps_min_hpa"] < d8["ps_min_hpa"], (d8, d9)


def test_monotone_amplification(artifact):
    """From day 5 on the cyclone only deepens."""
    mins = [_day(artifact, d)["ps_min_hpa"] for d in range(5, 10)]
    assert all(b <= a + 0.5 for a, b in zip(mins, mins[1:])), mins


def test_cyclone_position(artifact):
    """Day 9 low sits in the northern mid-latitudes downstream (east)
    of the 20E perturbation (JW06 Fig. 7: ~120-220E, 40-80N at day 9;
    generous windows for coarse resolution)."""
    d9 = _day(artifact, 9)
    assert 25.0 < d9["ps_min_lat_deg"] < 85.0, d9
    lon = d9["ps_min_lon_deg"] % 360.0
    assert 60.0 < lon < 300.0, d9


def test_pressure_stays_physical(artifact):
    for rec in artifact["days"]:
        assert 900.0 < rec["ps_min_hpa"] <= rec["ps_max_hpa"] < 1080.0
