#!/bin/bash
# Pre-commit smoke tier (<5 min with a warm XLA cache): topology tables,
# per-op golden digests, and the C12 whole-step golden digests.  This is
# the gate that must pass before EVERY commit; the full chunked suite
# (scripts/run_tests.sh) runs before round snapshots / nightly.
#
# Rationale: VERDICT r3 weak #6 — the full suite costs ~2 h serial, which
# is how a red test got committed.  This tier catches API drift between
# ops and their callers (the r3 failure mode) in minutes.
#
# Round-5 trim (VERDICT r4 weak #6: measured 5:48 vs the <5 min budget):
# test_translate_harness.py moved out of the tier — harness-internal
# drift is not a per-commit risk (ops/caller drift is caught by
# test_op_golden + test_golden), and the harness suite runs in the full
# chunked tier.  The tier now prints its own wall time so a budget
# regression is visible in CI output.
set -u
cd "$(dirname "$0")/.."
export JAX_PLATFORMS=cpu
export XLA_FLAGS="${XLA_FLAGS:---xla_force_host_platform_device_count=8}"

start=$(date +%s)
python -m pytest \
  tests/test_topology.py \
  tests/test_op_golden.py \
  tests/test_golden.py \
  -q "$@"
rc=$?
end=$(date +%s)
echo "smoke tier wall time: $((end - start)) s (budget 300 s)"
exit $rc
