#!/bin/bash
# Round-5 TPU measurement block.
# One TPU process at a time (CLAUDE.md: a second TPU process can wedge the
# first). Every bench HLO changed this round (params-as-argument + fused
# up-warp), so each timed target gets a COLD pass (populates the persistent
# cache) and a WARM pass (the numbers) — fresh-compile processes keep ~5x
# inflated step times (PERF.md round 4b).
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/r5_block.log
echo "=== r5 block start $(date -u +%FT%TZ) ===" | tee -a "$LOG"

run() { # name cmd...
  local name=$1; shift
  echo "--- $name: $*" | tee -a "$LOG"
  timeout 7200 "$@" > "/tmp/r5_${name}.log" 2>&1
  local rc=$?
  echo "--- $name exit=$rc" | tee -a "$LOG"
  grep -v -E 'WARNING|cpu_aot|^E08' "/tmp/r5_${name}.log" | tail -6 | tee -a "$LOG"
}

# 0. network probe (VERDICT r4 directive 6) — no TPU
run netprobe python - <<'EOF'
import socket
for host in ("github.com", "surfer.nmr.mgh.harvard.edu", "pypi.org"):
    try:
        print(host, socket.getaddrinfo(host, 443)[0][4])
    except OSError as e:
        print(host, "FAIL:", e)
EOF

# 1. int8 full-pipeline artifact at the published widths (directive 1b);
#    lazy calibration persists the w256 checkpoint's .quant.json sidecar
run parity_int8 python benchmarks/pipeline_parity_run.py --width 256 --quantize int8

# 2. three-metric bench: cold (compile) then warm (numbers).
#    infer256 int8 now picks up the sidecar written by stage 1.
run bench_cold python bench.py
run bench_warm python bench.py

# 3. fused-upwarp ablation on the headline arch (directive 2 adoption gate:
#    >= 8.2 pairs/s fused, vs the unfused control on the SAME new harness)
run bench_unfused_cold env MMREG_FUSED_UPWARP=0 python bench.py --arch train64
run bench_unfused env MMREG_FUSED_UPWARP=0 python bench.py --arch train64

# 4. train-step speed-of-light itemization (directive 3): cold then warm
run train_sol_cold python benchmarks/train_sol.py
run train_sol python benchmarks/train_sol.py

# 5. full train step with the fused up-warp model (compose path unchanged;
#    the model's moved-warp is inside the step) — cold then warm
run train_bench_cold python benchmarks/train_bench.py
run train_bench python benchmarks/train_bench.py

echo "=== r5 block done $(date -u +%FT%TZ) ===" | tee -a "$LOG"
