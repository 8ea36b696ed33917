#!/bin/bash
# Run the full test suite as one pytest process PER FILE.
#
# Why not `pytest tests/` in one process: on this host, jaxlib's
# XLA:CPU compiler intermittently SIGSEGVs (exit 139) after several
# hundred compiles accumulate in one process — always late in the
# suite, never in per-file runs (round-4 crash stacks:
# backend_compile_and_load / put_executable_and_time). Per-file
# isolation sidesteps the compiler-state accumulation at the same
# total cost; `pytest -n 2` (xdist) is a faster alternative that
# halves per-process compile counts.
#
#   bash tests/run_suite.sh [extra pytest args...]
set -u
cd "$(dirname "$0")/.."
total=0
failures=0
for f in tests/test_*.py; do
    echo "== $f"
    timeout 3000 python -m pytest "$f" -q "$@"
    rc=$?
    total=$((total + 1))
    if [ "$rc" -ne 0 ]; then
        failures=$((failures + 1))
        echo "FAILED: $f (exit $rc)"
    fi
done
echo "files: $total  failing: $failures"
exit $((failures > 0))
