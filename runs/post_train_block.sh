#!/bin/bash
# Post-training exclusive-TPU sequence: held-out eval -> golden eval -> 1080p.
set -u
cd /root/repo
CKPT=${1:-runs/denoiser_r2/model_final.npz}

echo "=== [$(date)] held-out eval ==="
timeout 2400 python -u runs/eval_heldout.py "$CKPT" --report HELDOUT_EVAL.md 2>&1 | tail -8

echo "=== [$(date)] golden eval ==="
timeout 3600 python -u runs/eval_goldens.py "$CKPT" --report GOLDEN_EVAL.md 2>&1 | tail -22

echo "=== [$(date)] 1080p with trained weights (bf16) ==="
timeout 2400 python -u runs/bench_1080p.py "$CKPT" --bf16 2>&1 | tail -8

echo "=== [$(date)] 1080p f32 ==="
timeout 1800 python -u runs/bench_1080p.py "$CKPT" 2>&1 | tail -8

echo "=== [$(date)] post-train block done ==="
