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
# Repro status (round 5): benchmarks/dev/xla_cpu_sigsegv_repro.py
# compiles 1200 DISTINCT programs (plain / lax.scan / 8-device
# shard_map collectives — ~3x the suite's compile count) in one
# process and SURVIVES on this host (jax 0.9.0). Compile count alone
# does not reproduce the crash: the trigger includes suite-specific
# process state (allocation history / fixture churn), i.e. an
# upstream jaxlib fragility this runner works around rather than a
# compilation pattern this repo could change. Re-test with that
# script after any jaxlib bump; if it stays green AND a full
# single-process `pytest tests/` run stops SIGSEGV-ing, retire this
# runner.
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
