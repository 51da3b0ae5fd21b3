#!/bin/sh
# Full test tier: everything, including `slow`-marked tests. Same
# one-file-per-process sharding as test_fast.sh (see there for the
# XLA:CPU segfault rationale). ~45-60 min on this 1-core host.
#
# Usage: sh scripts/test_all.sh [extra pytest args]
set -u
cd "$(dirname "$0")/.."
fail=0
t0=$(date +%s)
for f in tests/test_*.py; do
    python -m pytest "$f" -q -p no:cacheprovider --no-header "$@" \
        > /tmp/ocrjax_all_$(basename "$f").log 2>&1
    rc=$?
    if [ $rc -ne 0 ] && [ $rc -ne 5 ]; then
        fail=1
        echo "FAIL $f (rc=$rc)"
        tail -15 /tmp/ocrjax_all_$(basename "$f").log
    else
        tail -1 /tmp/ocrjax_all_$(basename "$f").log \
            | sed "s|^|$(basename "$f"): |"
    fi
done
echo "full tier: $(( $(date +%s) - t0 ))s total, fail=$fail"
exit $fail
