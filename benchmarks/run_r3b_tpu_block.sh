#!/bin/bash
# Round-3 continuation TPU block (post tunnel outage). One TPU process at a
# time (CLAUDE.md), strictly sequential. Order: cheap probes first (pool
# adjoint v3 timing, blur lowering head-to-head, residual-op trace), then
# full train-step measurements under the candidate flags, then the headline.
cd /root/repo || exit 1
set -u
run() {  # run <name> <cmd...>
  local name=$1; shift
  echo "=== $name: $*" >&2
  timeout 1800 "$@" > "/tmp/r3b_${name}.json" 2> "/tmp/r3b_${name}.err"
  echo "--- $name exit=$? ---" >&2
  tail -c 2000 "/tmp/r3b_${name}.json" >&2
}

run pool_bwd  python benchmarks/pool_bwd_probe.py
run blur      python benchmarks/blur_probe.py
run profile   python benchmarks/train_profile.py
run tb_base   python benchmarks/train_breakdown.py
MMREG_PALLAS_POOL_BWD=1 run tb_pool python benchmarks/train_breakdown.py
MMREG_BLUR_MODE=shifts  run tb_blur python benchmarks/train_breakdown.py
MMREG_PALLAS_POOL_BWD=1 MMREG_BLUR_MODE=shifts run tb_both python benchmarks/train_breakdown.py
run bench_b1  python bench.py
echo ALL_DONE >&2
