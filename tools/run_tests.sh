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

set -u
cd "$(dirname "$0")/.."

fails=0
failed=()
for f in tests/test_*.py; do
    echo "=== $f"
    if ! timeout 3600 python -m pytest "$f" -q "$@"; then
        fails=$((fails + 1))
        failed+=("$f")
    fi
done

echo
if [ "$fails" -eq 0 ]; then
    echo "ALL FILES GREEN"
else
    echo "FAILING FILES ($fails): ${failed[*]}"
fi
exit "$fails"
