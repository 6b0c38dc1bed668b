#!/bin/bash
# Exclusive-TPU work block: bench -> 1080p -> training -> eval.
# ONE TPU client at a time (a second client wedges the axon tunnel).
# Usage: runs/tpu_block.sh [train_minutes]
set -u
cd /root/repo
TRAIN_MIN=${1:-150}
STAMP=$(date +%H%M)

echo "=== [$(date)] bench.py ==="
timeout 900 python -u bench.py 2>&1 | tail -3

echo "=== [$(date)] bench_1080p (random weights) ==="
timeout 1800 python -u runs/bench_1080p.py 2>&1 | tail -8

echo "=== [$(date)] training ${TRAIN_MIN}m ==="
timeout $(( (TRAIN_MIN + 20) * 60 )) python -u runs/train_denoiser_r2.py ${TRAIN_MIN} 2>&1 | tail -40

echo "=== [$(date)] golden eval with checkpoint ==="
timeout 2700 python -u runs/eval_goldens.py runs/denoiser_r2/model_final.npz --report GOLDEN_EVAL.md 2>&1 | tail -22

echo "=== [$(date)] bench_1080p with trained weights bf16 ==="
timeout 1800 python -u runs/bench_1080p.py runs/denoiser_r2/model_final.npz --bf16 2>&1 | tail -8

echo "=== [$(date)] TPU block done ==="
