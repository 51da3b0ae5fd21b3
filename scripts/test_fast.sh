#!/bin/sh
# Fast test tier (VERDICT r3 next #7): every non-training production code
# path, minus the `slow`-marked heavyweights (training loops, the int8
# opt-in path, golden module fixtures, torch-twin e2e parity, redundant
# reroute-lane variants — all still run in scripts/test_all.sh).
#
# Tests run ONE FILE PER PYTEST PROCESS: this host's XLA:CPU backend
# deterministically segfaults (SIGSEGV, exit 139) after a few hundred
# in-process compilations (observed at test ~96 and ~250 of monolithic
# runs, inside backend_compile_and_load — same class of host-LLVM
# fragility as the disabled CPU compilation cache, tests/conftest.py), so
# per-file processes bound the accumulation. Measured 1050 s on this
# 1-core host (almost entirely XLA compile time; a <5 min tier would need
# the — unsafe here — CPU compile cache). On multi-core hosts set
# PYTEST_SHARDS=<cores> to run that many file-processes concurrently.
#
# Usage: [PYTEST_SHARDS=N] sh scripts/test_fast.sh [extra pytest args]
set -u
cd "$(dirname "$0")/.."
: "${PYTEST_SHARDS:=1}"
MARK="not slow" TIER=fast SHARDS="$PYTEST_SHARDS" \
    sh scripts/_test_tier.sh "$@"
