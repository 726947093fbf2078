#!/bin/bash
# Pre-commit smoke tier (<5 min with a warm XLA cache): topology tables,
# per-op golden digests, and the C12 whole-step golden digests.  This is
# the gate that must pass before EVERY commit; the full chunked suite
# (scripts/run_tests.sh) runs before round snapshots / nightly.
#
# Rationale: VERDICT r3 weak #6 — the full suite costs ~2 h serial, which
# is how a red test got committed.  This tier catches API drift between
# ops and their callers (the r3 failure mode) in minutes.
set -u
cd "$(dirname "$0")/.."
export JAX_PLATFORMS=cpu
export XLA_FLAGS="${XLA_FLAGS:---xla_force_host_platform_device_count=8}"

python -m pytest \
  tests/test_topology.py \
  tests/test_op_golden.py \
  tests/test_golden.py \
  tests/test_translate_harness.py \
  -q "$@"
