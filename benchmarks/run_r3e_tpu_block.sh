#!/bin/bash
# Round-3e TPU block: run AFTER learn_model1_workload finishes.
# ONE TPU process at a time (CLAUDE.md); each step logs to /tmp/r3e_block.log.
set -e -o pipefail
cd "$(dirname "$0")/.."
LOG=/tmp/r3e_block.log
echo "=== r3e block $(date) ===" | tee -a "$LOG"

echo "--- two-step parity artifact (3 arms) ---" | tee -a "$LOG"
timeout 5400 python benchmarks/twostep_parity_run.py 2>&1 | tail -20 | tee -a "$LOG"

echo "--- headline bench re-measure ---" | tee -a "$LOG"
timeout 2400 python bench.py 2>&1 | tail -2 | tee -a "$LOG"

echo "=== r3e block done $(date) ===" | tee -a "$LOG"
