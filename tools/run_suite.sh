#!/usr/bin/env bash
# Full verification driver: fast lane + heavy lane, each heavy module in its
# OWN pytest process.
#
# Why lanes: a single monolithic pytest process running all ~240 tests
# accumulated ~5 GB RSS and reproducibly segfaulted inside an XLA:CPU
# compile (jax backend_compile_and_load) at ~72% of the run, while every
# involved module passes standalone (docs/suite_lanes.md has the full
# post-mortem). Process isolation bounds per-process compile-cache and
# executable state, which is the actual fix — not retry hope.
#
# Usage:  bash tools/run_suite.sh          # fast + heavy
#         bash tools/run_suite.sh fast     # fast lane only (default addopts)
#         bash tools/run_suite.sh heavy    # heavy lane only
#
# Exit code: nonzero if ANY lane fails. Prints a per-lane RSS/time summary so
# memory growth is visible run over run.
set -u
cd "$(dirname "$0")/.."

LANE="${1:-all}"
FAILED=0
SUMMARY=()

run_lane() {
    local name="$1"; shift
    local t0=$(date +%s)
    # tools/_timed_pytest.py execs pytest in-process and prints the child's
    # peak RSS on exit (no /usr/bin/time in this image)
    python tools/_timed_pytest.py /tmp/suite_${name}.rss "$@" -q
    local rc=$?
    local t1=$(date +%s)
    local rss=$(cat /tmp/suite_${name}.rss 2>/dev/null || echo 0)
    SUMMARY+=("$(printf '%-28s rc=%-3s %5ss  peak_rss=%sMB' \
                "$name" "$rc" "$((t1-t0))" "$rss")")
    [ $rc -ne 0 ] && FAILED=1
    return $rc
}

if [ "$LANE" = "all" ] || [ "$LANE" = "fast" ]; then
    run_lane fast tests/            # pytest.ini addopts deselect heavy
fi

if [ "$LANE" = "all" ] || [ "$LANE" = "heavy" ]; then
    # One process per module: isolation is the point. -m heavy overrides the
    # pytest.ini deselection.
    for mod in tests/test_localization.py \
               tests/test_loftr.py \
               tests/test_parallel_pipeline.py \
               tests/test_pipeline_e2e.py \
               tests/test_mapper_scale.py; do
        run_lane "$(basename "$mod" .py)" "$mod" -m heavy
    done
fi

echo
echo "=== suite summary ($(date -u +%FT%TZ)) ==="
for line in "${SUMMARY[@]}"; do echo "  $line"; done
[ $FAILED -eq 0 ] && echo "ALL LANES GREEN" || echo "LANE FAILURE"
exit $FAILED
