#!/bin/bash
# Trajectory-level validation of the fused d_sw five-field transport
# (PACE_FUSED_DSW, all-ones unit-flux formulation) — the round-5 gate
# for flipping the default (VERDICT r4 #5, KNOWN_ISSUES "Fused d_sw").
#
# Runs, on the chip:
#   1. C24 300-step digests at n_split in {2, 4, 6}, fused vs unfused
#      (the round-4 corruption class was n_split >= 4 onset-by-step-4;
#      300 steps at C24 is ~75x that horizon);
#   2. the full 9-day JW06 baroclinic wave with the fused path, written
#      to /tmp/jw_fused.json for window + vs-artifact comparison.
set -u
set -o pipefail
cd "$(dirname "$0")/.."
OUT=${1:-/tmp/fused_traj.jsonl}

run() {
  local name="$1"; shift
  echo "=== $name ($*) ===" >&2
  env "$@" PACE_BENCH_N=24 PACE_BENCH_STEPS=150 timeout 2400 \
    python scripts/flag_run.py 2>>/tmp/fused_traj.err \
    | sed "s/^{/{\"name\": \"$name\", /" >> "$OUT" \
    || echo "{\"name\": \"$name\", \"rc\": \"FAIL\"}" >> "$OUT"
}

for ns in 2 4 6; do
  run "unfused_n${ns}" PACE_BENCH_NSPLIT=$ns
  run "fused_n${ns}"   PACE_BENCH_NSPLIT=$ns PACE_FUSED_DSW=1
done

echo "=== JW 9-day fused ===" >&2
PACE_FUSED_DSW=1 PACE_JW_OUT=/tmp/jw_fused.json timeout 3600 \
  python scripts/jw_regression.py 2>>/tmp/fused_traj.err \
  || echo '{"name": "jw_fused", "rc": "FAIL"}' >> "$OUT"
cat "$OUT"
