"""CPU-verifiable JW trajectory anchor (VERDICT r4 next #7).

Reruns one simulated day of the C12/79 f64 JW baroclinic wave — the
exact program that produced the committed record
(tests/golden/jw_day1_c12_f64.json) — and compares interior digests at
a calibrated threshold, so a code change that alters the trajectory
fails in-suite without chip access, unlike the 9-day chip artifact
(tests/test_jw_regression.py) which only validates the committed file.

The rerun happens in a SUBPROCESS with the generator's own environment
(single CPU device): under this suite's 8-virtual-device conftest the
jit would compile a different executable and miss the generator's
persistent-cache entry, costing an hour instead of minutes.  Threshold
1e-7 relative: f64 reruns are bit-reproducible on a fixed toolchain;
fusion-order/XLA-revision drift lands <=1e-9 after one day of chaotic
amplification; real numerics changes land >=1e-4 (calibration notes in
make_jw_day1.py).  After an INTENTIONAL numerics change, regenerate
with `python tests/golden/make_jw_day1.py` AND the 9-day chip artifact
with `scripts/jw_regression.py`.
"""

import os
import subprocess
import sys

import pytest

from tests.golden.make_jw_day1 import PATH

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_jw_day1_matches_committed_record():
    assert os.path.exists(PATH), (
        "regenerate with: python tests/golden/make_jw_day1.py")
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["JAX_ENABLE_X64"] = "1"
    # strip the suite's virtual-device flag so the subprocess compiles
    # (or cache-hits) the generator's single-device executable
    env["XLA_FLAGS"] = " ".join(
        f for f in env.get("XLA_FLAGS", "").split()
        if "host_platform_device_count" not in f
    )
    env.pop("PYTHONWARNINGS", None)
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tests", "golden",
                                      "make_jw_day1.py"), "--check"],
        env=env, cwd=REPO, capture_output=True, text=True, timeout=7200,
    )
    assert proc.returncode == 0, (
        f"JW day-1 anchor mismatch or failure:\n{proc.stdout[-3000:]}\n"
        f"{proc.stderr[-2000:]}"
    )
