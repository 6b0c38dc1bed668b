#!/bin/bash
# 1080p sweep (exclusive TPU): close the 60 FPS gap (VERDICT r2 next #1).
# Baseline from NOTES_ROUND3: groups=8/rgb/unet4/feats16/zeros/bf16 -> 18.01 ms.
set -u
cd /root/repo

for cfg in "--groups 16" "--groups 16 --bounce 32768"; do
  echo "=== [$(date)] bench_1080p $cfg rgb/unet4/feats16/zeros/bf16 ==="
  timeout 1500 python -u runs/bench_1080p.py $cfg --rgb --unet 4 --feats 16 \
    --pad zeros --bf16 2>&1 | tail -8
done
echo "=== [$(date)] sweep done ==="
