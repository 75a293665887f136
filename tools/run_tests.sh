#!/usr/bin/env bash
# Run the test suite one pytest process per file.
#
# Why: on few-core hosts, XLA's in-process CPU collectives can wedge when
# a long pytest process accumulates runtime state across many heavy
# sharded tests (observed: a rendezvous that never completes and trips
# the stuck-collective terminate timeout ~20 min into a file that passes
# standalone). Fresh processes per file sidestep the wedge and make one
# file's failure non-fatal to the rest.
#
# Usage: bash tools/run_tests.sh [extra pytest args...]
# Exit code: number of failing files (0 = all green).
#
# Measured full-suite runtime (2026-08-19, round 4): 3305 s wall (55 min),
# 40/40 files green, 195 passed + 1 skipped, on the 1-core build host with
# the committed warm `.jax_cache_cpu` (AVX2-pinned) and one light
# single-chip TPU client running concurrently. Slowest files:
# test_algorithms 1018 s, test_convergence 315 s, test_visualization 199 s.
# Cold-cache or degraded-host runs take substantially longer (CLAUDE.md).
# Re-measured 2026-08-20 (round 5): 41/41 files green, 197 passed +
# 1 skipped, ~3836 s of summed pytest time on an otherwise-idle host.

set -u
cd "$(dirname "$0")/.."

suite_t0=$SECONDS
fails=0
failed=()
for f in tests/test_*.py; do
    echo "=== $f"
    t0=$SECONDS
    if ! timeout 3600 python -m pytest "$f" -q "$@"; then
        fails=$((fails + 1))
        failed+=("$f")
    fi
    echo "=== $f took $((SECONDS - t0))s"
done

echo
echo "SUITE WALL: $((SECONDS - suite_t0))s"
if [ "$fails" -eq 0 ]; then
    echo "ALL FILES GREEN"
else
    echo "FAILING FILES ($fails): ${failed[*]}"
fi
exit "$fails"
