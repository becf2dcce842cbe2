#!/bin/bash
# Round-5f TPU block: why do isolated 1.5-2.5x per-conv decomp wins shrink to
# +6-10 % end to end? Output-DCE prefix attribution of the REAL graph
# (fwd_breakdown) with the decomp on vs off, both archs. Every leg needs a
# cold pass (the fused-upwarp change in r5 altered these graphs and r5's
# block never ran fwd_breakdown).
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/r5f_block.log
echo "=== r5f block start $(date -u +%FT%TZ) ===" | tee -a "$LOG"

run() { # name cmd...
  local name=$1; shift
  echo "--- $name: $*" | tee -a "$LOG"
  timeout 7200 "$@" > "/tmp/r5f_${name}.log" 2>&1
  local rc=$?
  echo "--- $name exit=$rc" | tee -a "$LOG"
  grep -v -E 'WARNING|cpu_aot|^E08' "/tmp/r5f_${name}.log" | tail -10 | tee -a "$LOG"
}

run fb256_on_cold python benchmarks/fwd_breakdown.py --arch infer256
run fb256_on python benchmarks/fwd_breakdown.py --arch infer256
run fb256_off_cold env MMREG_CONV2D_DECOMP=0 python benchmarks/fwd_breakdown.py --arch infer256
run fb256_off env MMREG_CONV2D_DECOMP=0 python benchmarks/fwd_breakdown.py --arch infer256

run fb64_on_cold python benchmarks/fwd_breakdown.py --arch train
run fb64_on python benchmarks/fwd_breakdown.py --arch train
run fb64_off_cold env MMREG_CONV2D_DECOMP=0 python benchmarks/fwd_breakdown.py --arch train
run fb64_off env MMREG_CONV2D_DECOMP=0 python benchmarks/fwd_breakdown.py --arch train

echo "=== r5f block done $(date -u +%FT%TZ) ===" | tee -a "$LOG"
