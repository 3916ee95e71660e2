#!/usr/bin/env bash
# Run the test suite sharded per-module in separate processes.
#
# Rationale (VERDICT r2, weak #8): all test modules pass individually, but a
# single long-lived pytest process occasionally dies with SIGABRT/SIGSEGV
# inside XLA-CPU compilation after many dozens of large jit compilations —
# an upstream native flake, not a test failure.  Per-module processes make
# the suite's green status reproducible with one command.
#
# Usage: scripts/run_tests.sh [extra pytest args]
set -u
cd "$(dirname "$0")/.."
fails=0
for m in tests/test_*.py; do
  echo "=== $m"
  timeout 1800 python -m pytest "$m" -q "$@"
  rc=$?
  if [ $rc -ne 0 ]; then
    echo "FAILED: $m (rc=$rc)"
    fails=$((fails + 1))
  fi
done
if [ $fails -ne 0 ]; then
  echo "$fails module(s) failed"
  exit 1
fi
echo "ALL MODULES GREEN"
