#!/bin/bash
# Round-4 solo-TPU measurement block (run ONLY with nothing else on the
# chip/host — bench + in-scan deltas are contention-sensitive).
#  1. VERDICT r3 item 4: bs=512 bf16 train attribution, stock vs
#     TDM_FAST_NOISE=1 (counter-hash noise/dropout), mnist + text.
#  2. VERDICT r3 item 8: attention routing crossover in bf16 + train mode.
#  3. VERDICT r3 item 3: bench --quick with the adaptive chain windows.
# Usage: bash tools/solo_r4.sh [xprof|kernels|bench]...  (default: all)
set -u
cd "$(dirname "$0")/.."
mkdir -p runs

run_xprof() {
  for prog in mnist_train text_train; do
    echo "=== xprof $prog bs512 bf16 (stock rng) ==="
    timeout 900 python tools/xprof_ops.py --program "$prog" \
      --batches 512 --top 16 2>/dev/null | tee "runs/xprof_${prog}_stock.txt"
    echo "=== xprof $prog bs512 bf16 (TDM_FAST_NOISE=1) ==="
    TDM_FAST_NOISE=1 timeout 900 python tools/xprof_ops.py --program "$prog" \
      --batches 512 --top 16 2>/dev/null | tee "runs/xprof_${prog}_fast.txt"
  done
}

run_kernels() {
  echo "=== kernel_bench bf16 (eval + train-mode grad crossover) ==="
  timeout 1800 python tools/kernel_bench.py bf16 2>/dev/null \
    | tee runs/kernel_bench_bf16.txt
}

run_bench() {
  echo "=== bench --quick (adaptive chain windows) ==="
  timeout 1800 python bench.py --quick | tee runs/bench_quick_r4.json
}

for p in "${@:-xprof kernels bench}"; do
  "run_$p"
done
echo "=== solo_r4 done ==="
