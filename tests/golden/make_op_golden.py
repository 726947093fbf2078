"""Generate per-operator golden digests (tests/golden/c12_op_digest.json).

Run deliberately after intentional numerics changes:
    python tests/golden/make_op_golden.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))


def main():
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

    from tests.golden.op_suite import compute_op_outputs, digest

    outs = compute_op_outputs()
    golden = {
        op: {name: digest(arr) for name, arr in fields.items()}
        for op, fields in outs.items()
    }
    path = os.path.join(os.path.dirname(__file__), "c12_op_digest.json")
    with open(path, "w") as f:
        json.dump(golden, f, indent=1)
    print(f"wrote {path} ({len(golden)} operators)")


if __name__ == "__main__":
    main()
