#!/bin/bash
# Round-3 TPU measurement block. Run ONLY after the training run has exited —
# one TPU process at a time (CLAUDE.md), strictly sequential.
cd /root/repo || exit 1
set -u
run() {  # run <name> <cmd...>
  local name=$1; shift
  echo "=== $name: $*" >&2
  timeout 1800 "$@" > "/tmp/r3_${name}.json" 2> "/tmp/r3_${name}.err"
  echo "--- $name exit=$? ---" >&2
  tail -c 2000 "/tmp/r3_${name}.json" >&2
}

run fused_conv python benchmarks/fused_conv_probe.py
run zline      python benchmarks/zline_probe.py
run rescale    python benchmarks/rescale_probe.py
run fwd_flags  python benchmarks/forward_flags_probe.py
run tb_base    python benchmarks/train_breakdown.py
run tb_zline   python benchmarks/train_breakdown.py --zline
run tb_zlc     python benchmarks/train_breakdown.py --zline --zline-compose
run bench_b1   python bench.py
run bench_b2   python bench.py --batch 2
run bench_b4   python bench.py --batch 4
echo ALL_DONE >&2
