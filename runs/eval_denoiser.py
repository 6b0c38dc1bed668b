"""Evaluate the trained denoiser: PSNR of noisy input vs denoised output
against converged references (BASELINE config 1 analog, self-hosted goldens
since the reference repo's exr goldens are git-LFS stubs)."""
import glob
import os
import sys

sys.path.insert(0, "/root/repo")
import numpy as np

from litbox_tpu.io.images import read_image_linear
from litbox_tpu.nn.infer import infer_large
from litbox_tpu.nn.loss import psnr
from litbox_tpu.nn.train import TrainConfig, Trainer

dataset_dir = sorted(glob.glob("/root/repo/runs/dataset/*"))[-1]
model_path = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/runs/denoiser/model.npz"
eval_ids = sys.argv[2].split(",") if len(sys.argv) > 2 else None
input_set = "Input1"

from litbox_tpu.nn.unet import TransformConfig

cfg = TrainConfig(unet_size=5, initial_features=32, crop_size=192,
                  transform=TransformConfig(normalize_input=True))
trainer = Trainer(cfg)
trainer.load(model_path)
run = trainer.eval_fn()

refs = sorted(glob.glob(os.path.join(dataset_dir, "Output_Reference_*.exr")))
rows = []
for ref_path in refs:
    sid = ref_path.split("_")[-1].split(".")[0]
    if eval_ids is not None and sid not in eval_ids:
        continue
    noisy_path = os.path.join(dataset_dir, f"{input_set}_Radiance_A_{sid}.exr")
    if not os.path.exists(noisy_path):
        continue
    ref = read_image_linear(ref_path)
    noisy = read_image_linear(noisy_path)
    peak = max(float(ref.max()), 1e-6)
    denoised = infer_large(run, noisy, tile=192, overlap=32)
    p_in = float(psnr(noisy, ref, peak))
    p_out = float(psnr(denoised, ref, peak))
    rows.append((sid, p_in, p_out))
    print(f"scene {sid}: input PSNR {p_in:6.2f} dB -> denoised {p_out:6.2f} dB "
          f"({'+' if p_out > p_in else ''}{p_out - p_in:.2f})", flush=True)

if rows:
    gains = [r[2] - r[1] for r in rows]
    print(f"\nmean input {np.mean([r[1] for r in rows]):.2f} dB, "
          f"mean denoised {np.mean([r[2] for r in rows]):.2f} dB, "
          f"mean gain {np.mean(gains):+.2f} dB over {len(rows)} scenes")
