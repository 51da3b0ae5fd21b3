#!/bin/sh
# Full test tier: everything, including `slow`-marked tests. Same
# one-file-per-process sharding as test_fast.sh (see there for the
# XLA:CPU segfault rationale). ~45-60 min on this 1-core host;
# PYTEST_SHARDS=<cores> parallelizes on bigger hosts.
#
# Usage: [PYTEST_SHARDS=N] sh scripts/test_all.sh [extra pytest args]
set -u
cd "$(dirname "$0")/.."
: "${PYTEST_SHARDS:=1}"
MARK="" TIER=all SHARDS="$PYTEST_SHARDS" sh scripts/_test_tier.sh "$@"
