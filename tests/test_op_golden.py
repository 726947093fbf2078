"""Per-operator golden regression: every pinned operator must reproduce
its recorded digest (the translate-test analogue; see
tests/golden/op_suite.py).  Regenerate deliberately with
tests/golden/make_op_golden.py after intentional numerics changes."""

import json
import os

import numpy as np
import pytest

GOLDEN = os.path.join(os.path.dirname(__file__), "golden",
                      "c12_op_digest.json")


@pytest.mark.skipif(not os.path.exists(GOLDEN),
                    reason="op digest not generated")
def test_op_golden():
    from tests.golden.op_suite import compute_op_outputs, digest

    with open(GOLDEN) as f:
        golden = json.load(f)
    outs = compute_op_outputs()
    assert set(outs) == set(golden)
    failures = []
    for op, fields in outs.items():
        for name, arr in fields.items():
            got = digest(arr)
            ref = golden[op][name]
            scale = max(abs(ref["max"]), abs(ref["min"]), 1e-30)
            for stat in ("mean", "std", "min", "max"):
                if abs(got[stat] - ref[stat]) > 1e-9 * scale:
                    failures.append(f"{op}.{name}.{stat}: "
                                    f"{got[stat]} != {ref[stat]}")
            if not np.allclose(got["samples"], ref["samples"], rtol=1e-9,
                               atol=1e-9 * scale, equal_nan=True):
                failures.append(f"{op}.{name}.samples")
    assert not failures, "\n".join(failures[:30])
