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
# per-file processes bound the accumulation. On this 1-core host the tier
# measures ~12-17 min (a <5 min tier is not reachable without the —
# unsafe here — CPU compile cache); the cost is almost entirely XLA
# compile time, so multi-core hosts divide it by their core count via
# PYTEST_SHARDS parallel processes.
#
# Usage: sh scripts/test_fast.sh [extra pytest args]
set -u
cd "$(dirname "$0")/.."
fail=0
t0=$(date +%s)
for f in tests/test_*.py; do
    python -m pytest "$f" -q -m "not slow" -p no:cacheprovider \
        --no-header -x "$@" > /tmp/ocrjax_fast_$(basename "$f").log 2>&1
    rc=$?
    # rc 5 = no tests collected (whole file slow/tpu-marked) — fine
    if [ $rc -ne 0 ] && [ $rc -ne 5 ]; then
        fail=1
        echo "FAIL $f (rc=$rc)"
        tail -15 /tmp/ocrjax_fast_$(basename "$f").log
    else
        tail -1 /tmp/ocrjax_fast_$(basename "$f").log \
            | sed "s|^|$(basename "$f"): |"
    fi
done
echo "fast tier: $(( $(date +%s) - t0 ))s total, fail=$fail"
exit $fail
