#!/bin/bash
# On-chip validation + timing sweep of the Pallas kernel flags.
# Each combo runs in its own process (the PACE_* flags are read at
# trace time).  Results append to /tmp/flag_matrix.jsonl.
#
# Round-4 additions: the production-configured k2/n6 rows.  n_split >= 4
# is the configuration class where the fused five-field d_sw transport
# (PACE_FUSED_DSW) corrupts u/v on the chip (docs/KNOWN_ISSUES.md);
# the *_fused rows are regression canaries EXPECTED to report
# finite=false until the miscompile is root-caused — a finite=true there
# means the bug has shifted, not that it is fixed (verify against the
# unfused digest before re-enabling the default).
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
run spline        PACE_PALLAS_SPLINE=1
run fillz         PACE_PALLAS_FILLZ=1
run fused_dsw     PACE_FUSED_DSW=1
run prod_k2n6     PACE_BENCH_KSPLIT=2 PACE_BENCH_NSPLIT=6
run prod_k2n6_fused PACE_FUSED_DSW=1 PACE_BENCH_KSPLIT=2 PACE_BENCH_NSPLIT=6
cat "$OUT"
