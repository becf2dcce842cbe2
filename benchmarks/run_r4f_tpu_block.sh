#!/bin/bash
# Round-4f TPU measurement block — the int8 quantized-inference story.
# One TPU process at a time (CLAUDE.md: a second TPU process can wedge the
# first). Each stage logs to /tmp and appends a status line here.
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/r4f_block.log
echo "=== r4f block start $(date -u +%FT%TZ) ===" | tee -a "$LOG"

run() { # name cmd...
  local name=$1; shift
  echo "--- $name: $*" | tee -a "$LOG"
  timeout 7200 "$@" > "/tmp/r4f_${name}.log" 2>&1
  local rc=$?
  echo "--- $name exit=$rc" | tee -a "$LOG"
  grep -v -E 'WARNING|cpu_aot|^E08' "/tmp/r4f_${name}.log" | tail -5 | tee -a "$LOG"
}

# 1. int8 conv shape probe (true warm timings; the adoption-gate numbers)
run int8probe python benchmarks/int8_conv_probe.py

# 2. quantized published-architecture bench (cold compile run, then a fresh
#    warm process — fresh-compile processes keep ~5x inflated step times)
run bench256_q_cold python bench.py --arch infer256 --quantize int8
run bench256_q python bench.py --arch infer256 --quantize int8

# 3. bf16 reference point in the same block
run bench256 python bench.py --arch infer256

# 4. quality gate: trained w256 checkpoint, bf16 vs int8 held-out Dice/NMI
run quantqual python benchmarks/quantize_quality_probe.py

echo "=== r4f block done $(date -u +%FT%TZ) ===" | tee -a "$LOG"
