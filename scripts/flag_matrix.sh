#!/bin/bash
# On-chip validation + timing sweep of the opt-in Pallas kernels.
# Each combo runs in its own process (the PACE_* flags are read at
# trace time).  Results append to /tmp/flag_matrix.jsonl.
set -u
set -o pipefail
cd "$(dirname "$0")/.."
OUT=${1:-/tmp/flag_matrix.jsonl}

run() {
  local name="$1"; shift
  echo "=== $name ($*) ===" >&2
  env "$@" timeout 1200 python scripts/flag_run.py 2>>/tmp/flag_matrix.err \
    | sed "s/^{/{\"name\": \"$name\", /" >> "$OUT" \
    || echo "{\"name\": \"$name\", \"rc\": \"FAIL\"}" >> "$OUT"
}

run baseline    PACE_NOOP=0
run sim1        PACE_PALLAS_SIM1=1
run spline      PACE_PALLAS_SPLINE=1
run fused_dsw   PACE_FUSED_DSW=1
run fillz       PACE_PALLAS_FILLZ=1
run all         PACE_PALLAS_SIM1=1 PACE_PALLAS_SPLINE=1 PACE_FUSED_DSW=1 PACE_PALLAS_FILLZ=1
cat "$OUT"
