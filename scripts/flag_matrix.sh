#!/bin/bash
# On-chip validation + timing sweep of the Pallas kernel flags.
# Each combo runs in its own process (the PACE_* flags are read at
# trace time).  Results append to /tmp/flag_matrix.jsonl.
#
# Round-5 state: the fused d_sw transport passed its trajectory gate
# (scripts/fused_dsw_trajectory.sh) and is default-ON for n_split >= 4,
# so prod_k2n6 runs fused by default and prod_k2n6_unfused is the
# comparison row.  ALL rows are expected finite; any finite=false is a
# regression (docs/KNOWN_ISSUES.md for the resolved round-4 history).
set -u
set -o pipefail
cd "$(dirname "$0")/.."
OUT=${1:-/tmp/flag_matrix.jsonl}

run() {
  local name="$1"; shift
  echo "=== $name ($*) ===" >&2
  env "$@" timeout 1800 python scripts/flag_run.py 2>>/tmp/flag_matrix.err \
    | sed "s/^{/{\"name\": \"$name\", /" >> "$OUT" \
    || echo "{\"name\": \"$name\", \"rc\": \"FAIL\"}" >> "$OUT"
}

run baseline      PACE_NOOP=0
run nosim1        PACE_PALLAS_SIM1=0
run fillz         PACE_PALLAS_FILLZ=1
run fused_dsw     PACE_FUSED_DSW=1
run prod_k2n6     PACE_BENCH_KSPLIT=2 PACE_BENCH_NSPLIT=6
run prod_k2n6_unfused PACE_FUSED_DSW=0 PACE_BENCH_KSPLIT=2 PACE_BENCH_NSPLIT=6
cat "$OUT"
# Digest-cluster gate: a miscompile can stay finite and still be wrong
# (round-5 pad2d shift: in-spec timing, ~5% u-digest shift).  Every row
# must land inside the committed reference matrix's per-config digest
# envelope.
python scripts/digest_cluster.py "$OUT"
