"""Digest-cluster gate for flag-matrix rows.

A TPU miscompilation can stay FINITE and still be wrong: the round-5
2-D shared-pad shift candidate produced a finite C48 k1/n2 step whose
20-step digest left the correct-program cluster by ~5% in u and 2.8x
in w-max (docs/ROADMAP.md "Shift lowering: 2-D shared pad rejected"),
while every known-correct program family lands within ~0.05% of each
other (fusion-reassociation noise only).  This checker makes that
screen automatic: every candidate row must sit within a tolerance band
of the committed reference matrix's rows for the SAME config
(k_split/n_split), per digest component.

Usage:
    python scripts/digest_cluster.py /tmp/flag_matrix.jsonl \
        [--ref docs/flag_matrix_r5.jsonl] [--rtol 0.005]

Exit 1 if any row is nonfinite or out of cluster.  Rows whose config
has no reference counterpart are reported but do not fail the gate
(first measurement of a new config seeds the next reference matrix).
"""

import argparse
import json
import sys


def _config_key(flags):
    return (flags.get("PACE_BENCH_N", "48"),
            flags.get("PACE_BENCH_KSPLIT", "1"),
            flags.get("PACE_BENCH_NSPLIT", "2"),
            flags.get("PACE_BENCH_STEPS", "10"))


def load(path):
    rows = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line:
                rows.append(json.loads(line))
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("matrix")
    ap.add_argument("--ref", default="docs/flag_matrix_r5.jsonl")
    ap.add_argument("--rtol", type=float, default=0.005,
                    help="relative band around the reference cluster "
                         "envelope (default 0.5%%, ~10x the observed "
                         "correct-program spread)")
    args = ap.parse_args()

    ref_rows = [r for r in load(args.ref) if r.get("finite")]
    clusters = {}
    for r in ref_rows:
        key = _config_key(r.get("flags", {}))
        for field, (mean, amean, amax) in r["digest"].items():
            lo, hi = clusters.setdefault(key, {}).setdefault(
                field, [amean, amean])
            clusters[key][field] = [min(lo, amean), max(hi, amean)]

    failures = []
    for r in load(args.matrix):
        name = r.get("name", str(r.get("flags", "?")))
        if r.get("rc") == "FAIL":
            failures.append(f"{name}: run FAILED")
            continue
        if not r.get("finite"):
            failures.append(f"{name}: NONFINITE")
            continue
        key = _config_key(r.get("flags", {}))
        cluster = clusters.get(key)
        if cluster is None:
            print(f"  {name}: no reference rows for config {key} "
                  f"(seeding row, not gated)")
            continue
        for field, (mean, amean, amax) in r["digest"].items():
            lo, hi = cluster.get(field, (amean, amean))
            scale = max(abs(lo), abs(hi), 1e-30)
            pad = args.rtol * scale
            if not (lo - pad <= amean <= hi + pad):
                failures.append(
                    f"{name}: {field} abs-mean {amean:.6g} outside "
                    f"cluster [{lo:.6g}, {hi:.6g}] +/- {args.rtol:.1%}")
    if failures:
        print("DIGEST-CLUSTER GATE FAILED:")
        for f in failures:
            print("  " + f)
        sys.exit(1)
    print("digest-cluster gate: all rows finite and in-cluster")


if __name__ == "__main__":
    main()
