#!/bin/bash
# Round-3 phase 3 (exclusive TPU): quality reports with the pair-blend
# production inference mode, then the bench records.
set -u
cd /root/repo

echo "=== [$(date)] REALTIME_EVAL mono (pair-blend) ==="
timeout 2400 python -u runs/eval_realtime_r3.py runs/denoiser_r3/model_best.npz \
  --pair-blend --report REALTIME_EVAL.md 2>&1 | tail -5

echo "=== [$(date)] HELDOUT_EVAL mono (pair-blend) ==="
timeout 2400 python -u runs/eval_heldout.py runs/denoiser_r3/model_best.npz \
  --pair-blend --report HELDOUT_EVAL.md 2>&1 | tail -6

echo "=== [$(date)] realtime RGB display net (pair-blend, bf16) ==="
timeout 1800 python -u runs/eval_realtime_r3.py runs/denoiser_r3_rgb/model_best.npz \
  --pair-blend --bf16 --report runs/REALTIME_EVAL_rgb.md 2>&1 | tail -4

echo "=== [$(date)] bench.py (production cull) ==="
timeout 1200 python -u bench.py 2>&1 | tail -2

echo "=== [$(date)] bench.py --no-cull ==="
timeout 1200 python -u bench.py --no-cull 2>&1 | tail -2

echo "=== [$(date)] bench_1080p with trained RGB weights ==="
timeout 1500 python -u runs/bench_1080p.py runs/denoiser_r3_rgb/model_best.npz \
  --groups 16 --bounce 32768 --rgb --unet 4 --feats 16 --pad zeros --bf16 \
  2>&1 | tail -8

echo "=== [$(date)] phase3 done ==="
