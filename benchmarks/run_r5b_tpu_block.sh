#!/bin/bash
# Round-5b TPU measurement block: end-to-end numbers for the three-Conv2D
# lowering of the U-Net's 3x3x3 convs (commit e0a71f3), which landed AFTER
# the r5 block — so every bench/train HLO changed again. One TPU process at
# a time (CLAUDE.md). Cold pass populates the persistent cache (also needed
# so the DRIVER's end-of-round bench.py run is warm), warm pass is the
# numbers. The decomp-off controls reuse the r5-block cache entries (same
# HLO), so they get a single run each.
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/r5b_block.log
echo "=== r5b block start $(date -u +%FT%TZ) ===" | tee -a "$LOG"

run() { # name cmd...
  local name=$1; shift
  echo "--- $name: $*" | tee -a "$LOG"
  timeout 7200 "$@" > "/tmp/r5b_${name}.log" 2>&1
  local rc=$?
  echo "--- $name exit=$rc" | tee -a "$LOG"
  grep -v -E 'WARNING|cpu_aot|^E08' "/tmp/r5b_${name}.log" | tail -8 | tee -a "$LOG"
}

# 1. int8 x int8 tap2d vs Conv3D probe (decides whether _int8_conv should
#    also route through the decomposition)
run int8probe_cold python benchmarks/conv2d_decomp_int8_probe.py
run int8probe python benchmarks/conv2d_decomp_int8_probe.py

# 2. three-metric bench with the decomp (auto-on for TPU): cold then warm
run bench_cold python bench.py
run bench_warm python bench.py

# 3. decomp-off controls (HLOs already cached by the r5 block): one run each
run bench64_ctl env MMREG_CONV2D_DECOMP=0 python bench.py --arch train64
run bench256_ctl env MMREG_CONV2D_DECOMP=0 python bench.py --arch infer256

# 4. train step with the decomp (tap2d backward = three Conv2D adjoints):
#    cold then warm, plus the decomp-off control (cached)
run train_cold python benchmarks/train_bench.py
run train_warm python benchmarks/train_bench.py
run train_ctl env MMREG_CONV2D_DECOMP=0 python benchmarks/train_bench.py

echo "=== r5b block done $(date -u +%FT%TZ) ===" | tee -a "$LOG"
