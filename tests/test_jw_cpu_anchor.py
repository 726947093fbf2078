"""CPU-verifiable JW trajectory anchor (VERDICT r4 next #7).

Reruns one simulated day of the C12/79 f64 JW baroclinic wave
(tests/golden/make_jw_day1.py run_day1 — the exact program that produced
the committed record) and compares interior digests at a calibrated
threshold, so a code change that alters the trajectory fails in-suite
without chip access — unlike the 9-day chip artifact
(tests/test_jw_regression.py), which only validates the committed file.

Threshold: 1e-7 relative.  f64 reruns are bit-reproducible on a fixed
toolchain; fusion-order/XLA-revision drift lands <=1e-9 after one day of
amplification; real numerics changes land >=1e-4 (calibration notes in
make_jw_day1.py).
"""

import json
import os

import pytest

from tests.golden.make_jw_day1 import PATH, run_day1

RTOL = 1e-7


@pytest.mark.slow
def test_jw_day1_matches_committed_record():
    assert os.path.exists(PATH), (
        "regenerate with: python tests/golden/make_jw_day1.py")
    with open(PATH) as f:
        ref = json.load(f)["digest"]
    got = run_day1()
    assert set(got) == set(ref)
    for name, vals in ref.items():
        for i, (a, b) in enumerate(zip(vals, got[name])):
            scale = max(abs(a), abs(b), 1e-30)
            rel = abs(a - b) / scale
            assert rel <= RTOL, (
                f"{name}[{i}]: committed {a!r} vs rerun {b!r} "
                f"(rel {rel:.3e} > {RTOL}) — if this change is an "
                f"intentional numerics change, regenerate the anchor "
                f"with tests/golden/make_jw_day1.py AND the 9-day chip "
                f"artifact with scripts/jw_regression.py"
            )
