#!/bin/bash
# Round-5c TPU measurement block: rerun of the r5b decomp-on legs after the
# z-slab OOM fix (conv3d_tap2d_slab — full-volume f32 partials at the
# published widths' first conv exceeded HBM). Also re-runs the int8 probe's
# warm pass (its r5b warm process hit the known tunnel wedge and was killed).
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/r5c_block.log
echo "=== r5c block start $(date -u +%FT%TZ) ===" | tee -a "$LOG"

run() { # name cmd...
  local name=$1; shift
  echo "--- $name: $*" | tee -a "$LOG"
  timeout 7200 "$@" > "/tmp/r5c_${name}.log" 2>&1
  local rc=$?
  echo "--- $name exit=$rc" | tee -a "$LOG"
  grep -v -E 'WARNING|cpu_aot|^E08' "/tmp/r5c_${name}.log" | tail -8 | tee -a "$LOG"
}

run int8probe_warm python benchmarks/conv2d_decomp_int8_probe.py

# three-metric bench with the slabbed decomp: cold (compile) then warm
run bench_cold python bench.py
run bench_warm python bench.py

# train step with the fixed decomp (compute-dtype accumulation — the r5b
# train legs hit the bf16/f32 conv-transpose dtype mismatch): cold then warm
run train_cold python benchmarks/train_bench.py
run train_warm python benchmarks/train_bench.py

echo "=== r5c block done $(date -u +%FT%TZ) ===" | tee -a "$LOG"
