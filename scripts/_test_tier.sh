#!/bin/sh
# Shared tier runner (see test_fast.sh for the per-file-process rationale).
# Env: MARK (pytest -m expression, empty = all), TIER (log-name prefix),
# SHARDS (concurrent file-processes). Extra args pass through to pytest.
set -u
fail_dir=$(mktemp -d)
t0=$(date +%s)

run_one() {
    f="$1"; shift
    log="/tmp/ocrjax_${TIER}_$(basename "$f").log"
    if [ -n "$MARK" ]; then
        python -m pytest "$f" -q -m "$MARK" -p no:cacheprovider \
            --no-header "$@" > "$log" 2>&1
    else
        python -m pytest "$f" -q -p no:cacheprovider \
            --no-header "$@" > "$log" 2>&1
    fi
    rc=$?
    # rc 5 = no tests collected (whole file deselected/skipped) — fine
    if [ $rc -ne 0 ] && [ $rc -ne 5 ]; then
        touch "$fail_dir/$(basename "$f")"
        echo "FAIL $f (rc=$rc)"
        tail -15 "$log"
    else
        tail -1 "$log" | sed "s|^|$(basename "$f"): |"
    fi
}

if [ "$SHARDS" -gt 1 ]; then
    # bounded concurrency without bash arrays: round-robin background jobs
    n=0
    for f in tests/test_*.py; do
        run_one "$f" "$@" &
        n=$((n + 1))
        if [ $((n % SHARDS)) -eq 0 ]; then wait; fi
    done
    wait
else
    for f in tests/test_*.py; do
        run_one "$f" "$@"
    done
fi

nfail=$(ls "$fail_dir" | wc -l)
rm -rf "$fail_dir"
echo "$TIER tier: $(( $(date +%s) - t0 ))s total, failed files: $nfail"
[ "$nfail" -eq 0 ]
