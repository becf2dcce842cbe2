#!/bin/bash
# Round-5d TPU block: production-safety evidence for the conv decomp
# (numerics changed by ~1 bf16 ulp per conv) + train-step re-itemization.
#  1-2. the published-widths pipeline parity artifacts (bf16 + int8) rerun
#       with the decomp — every reference gate must still pass;
#  3-4. train_sol with the decomp (the fwd/fwd+bwd rows moved: step 405->316).
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/r5d_block.log
echo "=== r5d block start $(date -u +%FT%TZ) ===" | tee -a "$LOG"

run() { # name cmd...
  local name=$1; shift
  echo "--- $name: $*" | tee -a "$LOG"
  timeout 7200 "$@" > "/tmp/r5d_${name}.log" 2>&1
  local rc=$?
  echo "--- $name exit=$rc" | tee -a "$LOG"
  grep -v -E 'WARNING|cpu_aot|^E08' "/tmp/r5d_${name}.log" | tail -8 | tee -a "$LOG"
}

run parity_w256 python benchmarks/pipeline_parity_run.py --width 256
run parity_w256_int8 python benchmarks/pipeline_parity_run.py --width 256 --quantize int8

run train_sol_cold python benchmarks/train_sol.py
run train_sol python benchmarks/train_sol.py

echo "=== r5d block done $(date -u +%FT%TZ) ===" | tee -a "$LOG"
