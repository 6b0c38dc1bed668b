#!/bin/bash
# Round-3 session phase 1 (exclusive TPU): realtime-tier inputs for the
# committed ref scenes, then time-boxed factory resume to grow the corpus,
# then realtime tiers for the newly generated refs.
set -u
cd /root/repo

echo "=== [$(date)] RT inputs for existing refs ==="
timeout 1500 python -u runs/gen_realtime_inputs.py

echo "=== [$(date)] factory resume (time-boxed 55m) ==="
timeout 3300 python -u runs/gen_dataset_r2.py 104

echo "=== [$(date)] RT inputs for new refs ==="
timeout 1500 python -u runs/gen_realtime_inputs.py

echo "=== [$(date)] phase1 done ==="
