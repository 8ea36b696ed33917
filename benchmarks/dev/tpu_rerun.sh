#!/bin/bash
# One-shot TPU re-validation after a tunnel outage: probe, then run
# the full statistical gates, the headline bench, and the PT
# throughput script, teeing everything to benchmarks/dev/tpu_rerun.log.
#
#   bash benchmarks/dev/tpu_rerun.sh
#
# Each stage is bounded; a wedged tunnel cannot hang the script.
set -u
cd "$(dirname "$0")/../.."
LOG=benchmarks/dev/tpu_rerun.log
: > "$LOG"

echo "== probe ==" | tee -a "$LOG"
if ! timeout 90 python -c "import jax; print(jax.devices())" >> "$LOG" 2>&1; then
    echo "TUNNEL-DOWN — aborting" | tee -a "$LOG"
    exit 1
fi

echo "== validate (48 gates, production n) ==" | tee -a "$LOG"
timeout 3600 python benchmarks/validate.py 2>&1 | tee -a "$LOG"
echo "validate exit: ${PIPESTATUS[0]}" | tee -a "$LOG"

echo "== bench ==" | tee -a "$LOG"
timeout 1800 python bench.py 2>&1 | tee -a "$LOG"

echo "== pt_rate ==" | tee -a "$LOG"
timeout 1800 python benchmarks/dev/pt_rate.py 2>&1 | tee -a "$LOG"

echo "done — record the numbers in benchmarks/RESULTS.md" | tee -a "$LOG"
