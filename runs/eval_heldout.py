"""Held-out denoiser evaluation over all input profiles.

Usage: python runs/eval_heldout.py [checkpoint.npz] [--report HELDOUT_EVAL.md]

Reports, for each input profile (Input0 = 5x8192 rays noisiest, Input1 =
65536, Input2 = 262144), the mean PSNR of noisy-vs-reference and
denoised-vs-reference over the held-out scenes (every 8th; never trained
on), in the gray-point exposure-normalized space used for training.
"""
import glob
import json
import os
import sys

sys.path.insert(0, "/root/repo")

if "--cpu" in sys.argv:
    # Pin before any litbox import: with the TPU tunnel busy (one client at
    # a time) a late first-touch axon init blocks on the tunnel lock.
    import jax

    jax.config.update("jax_platforms", "cpu")

import numpy as np

dataset_dir = sorted(glob.glob("/root/repo/runs/dataset_r2/*"))[-1]
# Exclude flag VALUES when scanning for the positional checkpoint, or
# `--report X.md` with no checkpoint loads X.md as the model (ADVICE r3).
_flag_vals = {sys.argv[sys.argv.index(f) + 1]
              for f in ("--report",) if f in sys.argv}
ckpt = next((a for a in sys.argv[1:]
             if not a.startswith("--") and a not in _flag_vals),
            "/root/repo/runs/denoiser_r2/model_final.npz")
report = None
if "--report" in sys.argv:
    report = sys.argv[sys.argv.index("--report") + 1]

from litbox_tpu.io.images import read_image_linear
from litbox_tpu.nn.infer import blend_from_pair, fit_blend, infer_large
from litbox_tpu.nn.train import Trainer, load_train_config

refs = sorted(glob.glob(os.path.join(dataset_dir, "Output_Reference_*.exr")))
ids = [p.split("_")[-1].split(".")[0] for p in refs]
held = [i for k, i in enumerate(ids) if k % 8 == 7]
train_ids = [i for k, i in enumerate(ids) if k % 8 != 7]
USE_BLEND = "--blend" in sys.argv
PAIR_BLEND = "--pair-blend" in sys.argv
print(f"dataset {dataset_dir}: {len(ids)} scenes, {len(held)} held-out")

trainer = Trainer(load_train_config(ckpt))
trainer.load(ckpt)
fn = trainer.eval_fn()


def scale_of(i):
    ref = read_image_linear(os.path.join(dataset_dir, f"Output_Reference_{i}.exr"))
    return 0.18 / max(float(ref.mean()), 1e-6), ref


rows = []
for prof in (0, 1, 2):
    k = 1.0
    if USE_BLEND:
        def _pairs(prof=prof, n=8):
            for i in train_ids[:n]:
                s, ref = scale_of(i)
                pth = os.path.join(dataset_dir,
                                   f"Input{prof}_Radiance_A_{i}.exr")
                if os.path.exists(pth):
                    yield read_image_linear(pth) * s, ref * s
        k = fit_blend(fn, _pairs(), rgb=trainer.cfg.rgb)
        print(f"Input{prof}: calibrated blend k={k:.3f}", flush=True)
    base_all, den_all = [], []
    for i in held:
        s, ref = scale_of(i)
        ref = ref * s
        for tracer, other_t in (("A", "B"), ("B", "A")):
            p = os.path.join(dataset_dir, f"Input{prof}_Radiance_{tracer}_{i}.exr")
            noisy = read_image_linear(p) * s
            out = infer_large(fn, noisy, rgb=trainer.cfg.rgb, blend=k)
            if PAIR_BLEND:
                other = read_image_linear(os.path.join(
                    dataset_dir,
                    f"Input{prof}_Radiance_{other_t}_{i}.exr")) * s
                kp = blend_from_pair(out, noisy, other.astype(np.float32))
                out = noisy + kp * (out - noisy)
            peak = max(float(ref.max()), 1e-6)
            psnr = lambda x: 10 * np.log10(
                peak**2 / max(float(((x - ref) ** 2).mean()), 1e-12))
            base_all.append(psnr(noisy))
            den_all.append(psnr(out))
    row = dict(profile=f"Input{prof}"
               + (f" k={k:.2f}" if USE_BLEND else "")
               + (" auto-k" if PAIR_BLEND else ""), n=len(base_all),
               base_db=float(np.mean(base_all)),
               denoised_db=float(np.mean(den_all)),
               gain_db=float(np.mean(den_all) - np.mean(base_all)))
    rows.append(row)
    print(" ".join(f"{k}={v:.3f}" if isinstance(v, float) else f"{k}={v}"
                   for k, v in row.items()), flush=True)

if report:
    with open(report, "w") as f:
        f.write("# Held-out denoiser evaluation\n\n")
        f.write(f"Checkpoint: `{ckpt}`; dataset `{os.path.basename(dataset_dir)}`; "
                f"{len(held)} held-out scenes x 2 tracers, gray-point "
                "exposure-normalized PSNR vs converged references."
                + (" Inference uses the residual-blend factor k calibrated "
                   "per profile on TRAINING scenes (nn.infer.fit_blend)."
                   if USE_BLEND else "")
                + (" Inference is the production auto-blend mode: each "
                   "sample self-calibrates k against the other tracer of "
                   "its pair (nn.infer.blend_from_pair); no reference data "
                   "is used." if PAIR_BLEND else "") + "\n\n")
        f.write("| profile | n | noisy dB | denoised dB | gain dB |\n|---|---|---|---|---|\n")
        for r in rows:
            f.write(f"| {r['profile']} | {r['n']} | {r['base_db']:.2f} | "
                    f"{r['denoised_db']:.2f} | {r['gain_db']:+.2f} |\n")
    print("wrote", report)
