#!/bin/bash
# Round-4 TPU measurement block — run AFTER the w256 training completes.
# One TPU process at a time (CLAUDE.md: a second TPU process can wedge the
# first). Each stage logs to /tmp and appends a status line here.
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/r4_block.log
echo "=== r4 block start $(date -u +%FT%TZ) ===" | tee -a "$LOG"

run() { # name cmd...
  local name=$1; shift
  echo "--- $name: $*" | tee -a "$LOG"
  timeout 7200 "$@" > "/tmp/r4_${name}.log" 2>&1
  local rc=$?
  echo "--- $name exit=$rc" | tee -a "$LOG"
  grep -v -E 'WARNING|cpu_aot|^E08' "/tmp/r4_${name}.log" | tail -5 | tee -a "$LOG"
}

# 1. published-architecture quality artifact (enc-256 checkpoint trained here)
run parity_w256 python benchmarks/pipeline_parity_run.py --width 256

# 2. five-arm displaced-subject artifact (raw arm now sigma-pinned; adds the
#    opt-in rigid fallback arm)
run twostep5 python benchmarks/twostep_parity_run.py

# 3. fresh headline numbers, warm cache (best-of-blocks)
run bench64 python bench.py
run bench256 python bench.py --arch infer256

echo "=== r4 block done $(date -u +%FT%TZ) ===" | tee -a "$LOG"
