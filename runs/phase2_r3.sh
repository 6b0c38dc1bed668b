#!/bin/bash
# Round-3 phase 2 (exclusive TPU): train the RGB realtime display net, then
# the mono production net, then the golden eval (f32 + bf16) on the mono.
set -u
cd /root/repo
RGB_MIN=${1:-35}
MONO_MIN=${2:-48}

echo "=== [$(date)] RGB realtime net ${RGB_MIN}m ==="
LITBOX_TRAIN_RGB=1 LITBOX_TRAIN_PAD=zeros LITBOX_TRAIN_UNET=4 \
LITBOX_TRAIN_FEATS=16 LITBOX_TRAIN_BATCH=16 \
timeout $(( (RGB_MIN + 25) * 60 )) python -u runs/train_denoiser_r3.py \
  ${RGB_MIN} --out runs/denoiser_r3_rgb 2>&1 | tail -30

echo "=== [$(date)] mono production net (unet5/feats32) ${MONO_MIN}m ==="
timeout $(( (MONO_MIN + 25) * 60 )) python -u runs/train_denoiser_r3.py \
  ${MONO_MIN} --out runs/denoiser_r3 2>&1 | tail -30

echo "=== [$(date)] golden eval mono best (f32) ==="
timeout 2700 python -u runs/eval_goldens.py runs/denoiser_r3/model_best.npz \
  --report GOLDEN_EVAL.md 2>&1 | tail -22

echo "=== [$(date)] golden eval mono best (bf16) ==="
timeout 2700 python -u runs/eval_goldens.py runs/denoiser_r3/model_best.npz \
  --bf16 2>&1 | tail -4

echo "=== [$(date)] phase2 done ==="
