#!/bin/bash
# Round-3 long-run quality showcase (VERDICT r2 item 9).
# MNIST at the reference's deployed config scale (1000 epochs, bs=64 —
# deployment/configs/mnist-training.yaml pins exactly this) with EMA, then
# sample grids (ancestral-1000 and DPM++-20) + classifier IS.
# Usage: bash tools/showcase_runs.sh
set -u
cd "$(dirname "$0")/.."
mkdir -p runs samples

CKPT=runs/showcase_mnist.pth
if [ ! -f "$CKPT" ]; then
  echo "=== mnist showcase: training 1000 epochs (bs=64, EMA) ==="
  timeout 7200 python -m tinydiffusionmodels_tpu.mnist --train \
    --epochs 1000 --batch_size 64 --ema_decay 0.999 --no_epoch_samples \
    --ckpt "$CKPT" > runs/showcase_mnist.train.log 2>&1 || exit 1
fi

echo "=== mnist showcase: grids ==="
timeout 1800 python -m tinydiffusionmodels_tpu.mnist --sample \
  --ckpt "$CKPT" > runs/showcase_mnist.sample.log 2>&1
mv -f samples/samples.png samples/showcase_ancestral1000.png 2>/dev/null
timeout 1800 python -m tinydiffusionmodels_tpu.mnist --sample --sampler dpm++ \
  --steps 20 --ckpt "$CKPT" >> runs/showcase_mnist.sample.log 2>&1
mv -f samples/samples.png samples/showcase_dpmpp20.png 2>/dev/null

echo "=== mnist showcase: fidelity ==="
for s in "ancestral" "dpm++"; do
  steps=""; [ "$s" = "dpm++" ] && steps="--steps 20"
  timeout 3600 python tools/fidelity.py --ckpt "$CKPT" --n 256 \
    --sampler "$s" $steps 2>runs/showcase_fid_$s.log \
    | grep '^{' | tail -1 > "runs/showcase_mnist_fid_${s//+/p}.json"
  cat "runs/showcase_mnist_fid_${s//+/p}.json"
done
echo "=== showcase done ==="
