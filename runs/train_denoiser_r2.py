"""Round-2 denoiser training on the MC-direct (genuinely noisy) dataset.

Usage: python runs/train_denoiser_r2.py [minutes] [--dataset DIR]

Differences from round 1 (VERDICT.md next-round item 4):
  * inputs carry Monte-Carlo direct-light noise (dataset_r2, generated with
    mc_direct_inputs=True) — there is real noise to learn to remove;
  * per-scene exposure normalization: radiance tensors scaled by
    10**(-log10(sum I^2)) from each Scene json (the factory's auto-exposure,
    data/factory.py:175) so HdrLoss weights see comparable magnitudes;
  * held-out scenes (every 8th) are never trained on; checkpoints report
    held-out PSNR gain (denoised vs noisy, against the converged reference).
"""
import glob
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np

from litbox_tpu.nn.dataset import DenoiserDataset
from litbox_tpu.nn.train import TrainConfig, Trainer
from litbox_tpu.nn.unet import TransformConfig

args = [a for a in sys.argv[1:] if not a.startswith("--")]
minutes = float(args[0]) if args else 60.0
if "--dataset" in sys.argv:
    dataset_dir = sys.argv[sys.argv.index("--dataset") + 1]
else:
    dataset_dir = sorted(glob.glob("/root/repo/runs/dataset_r2/*"))[-1]
print("dataset:", dataset_dir, flush=True)

refs = sorted(glob.glob(os.path.join(dataset_dir, "Output_Reference_*.exr")))
ids = [p.split("_")[-1].split(".")[0] for p in refs]
print("scenes:", len(ids), flush=True)


_scale_cache: dict = {}


def scene_scale(i: str) -> float:
    """Gray-point exposure: scale so the converged reference's mean
    luminance sits at photographic middle gray. The factory's light-power
    auto-exposure (10^-log10(sum I^2)) spans x1000 for dim scenes and lets
    near-source pixels blow the HdrLoss adaptive weights up by 1e4+ —
    mean-luminance normalization achieves the intent (comparable loss
    magnitudes across scenes) robustly."""
    if i not in _scale_cache:
        from litbox_tpu.io.images import read_image_linear

        ref = read_image_linear(os.path.join(dataset_dir, f"Output_Reference_{i}.exr"))
        _scale_cache[i] = 0.18 / max(float(ref.mean()), 1e-6)
    return _scale_cache[i]


train_ids = [i for k, i in enumerate(ids) if k % 8 != 7]
held_ids = [i for k, i in enumerate(ids) if k % 8 == 7]
print(f"train {len(train_ids)} held-out {len(held_ids)}", flush=True)


def stage(name: str, profile: int, use_ids: list, crop: int) -> DenoiserDataset:
    return DenoiserDataset(
        [os.path.join(dataset_dir, f"Input{profile}_Radiance_A_{i}.exr") for i in use_ids],
        [os.path.join(dataset_dir, f"Input{profile}_Radiance_B_{i}.exr") for i in use_ids],
        [os.path.join(dataset_dir, f"Albedo_{i}.png") for i in use_ids],
        [os.path.join(dataset_dir, f"Transmissibility_{i}.exr") for i in use_ids],
        [os.path.join(dataset_dir, f"Output_Reference_{i}.exr") for i in use_ids],
        crop_size=crop, scales=[scene_scale(i) for i in use_ids])


def stage_rt(name: str, tier: int, use_ids: list, crop: int) -> DenoiserDataset:
    return DenoiserDataset(
        [os.path.join(dataset_dir, f"InputRT{tier}_Radiance_A_{i}.exr") for i in use_ids],
        [os.path.join(dataset_dir, f"InputRT{tier}_Radiance_B_{i}.exr") for i in use_ids],
        [os.path.join(dataset_dir, f"Albedo_{i}.png") for i in use_ids],
        [os.path.join(dataset_dir, f"Transmissibility_{i}.exr") for i in use_ids],
        [os.path.join(dataset_dir, f"Output_Reference_{i}.exr") for i in use_ids],
        crop_size=crop, scales=[scene_scale(i) for i in use_ids])


SMOKE = "--smoke" in sys.argv
if SMOKE:  # tiny wiring check on CPU
    import jax

    jax.config.update("jax_platforms", "cpu")
CROP = 64 if SMOKE else 192
# Curriculum Easy -> Final (reference: train_litbox_denoiser.py:142-164):
# Input2 = 262144 rays (least noisy), Input1 = 65536, Input0 = 5x8192.
stages = [("Easy", stage("Easy", 2, train_ids, CROP)),
          ("Medium", stage("Medium", 1, train_ids, CROP)),
          ("Final", stage("Final", 0, train_ids, CROP))]
# Realtime tiers (1 frame, single phase — runs/gen_realtime_inputs.py): the
# PRODUCTION noise regime (VERDICT round 1 item 2). Trained alongside the
# accumulated tiers so the model covers both.
have_rt = bool(glob.glob(os.path.join(dataset_dir, "InputRT0_Radiance_A_*.exr")))
if have_rt:
    stages += [("RT1", stage_rt("RT1", 1, train_ids, CROP)),
               ("RT0", stage_rt("RT0", 0, train_ids, CROP))]
print("stages:", [s[0] for s in stages], flush=True)

import os as _os

UNET = int(_os.environ.get("LITBOX_TRAIN_UNET", "5"))
FEATS = int(_os.environ.get("LITBOX_TRAIN_FEATS", "32"))
LR = float(_os.environ.get("LITBOX_TRAIN_LR", "1e-4"))
BATCH = int(_os.environ.get("LITBOX_TRAIN_BATCH", "8"))
WCAP = float(_os.environ.get("LITBOX_TRAIN_WCAP", "0")) or None
# RGB realtime variant (out_channels=3, one pass/frame) + padding mode:
# reflect pad measured +6.4 ms/frame at 480x272 (runs/prof_display4.py);
# the realtime display net trains with zero padding.
RGB = _os.environ.get("LITBOX_TRAIN_RGB", "0") == "1"
PAD = _os.environ.get("LITBOX_TRAIN_PAD", "reflect")
from litbox_tpu.nn.loss import HdrLossConfig

cfg = TrainConfig(unet_size=3 if SMOKE else UNET,
                  initial_features=8 if SMOKE else FEATS,
                  crop_size=CROP, learn_rate=LR, epochs=1,
                  batch_size=2 if SMOKE else BATCH, global_residual=True,
                  rgb=RGB, padding_mode=PAD,
                  loss=HdrLossConfig(weight_cap=WCAP),
                  transform=TransformConfig(normalize_input=True))
trainer = Trainer(cfg)
if "--resume" in sys.argv:
    trainer.load("/root/repo/runs/denoiser_r2/model.npz")
    print("resumed", flush=True)


def heldout_gain(max_scenes: int = 6, prefix: str | None = None) -> tuple[float, float]:
    """Mean PSNR of a noisy held-out input vs reference, and of denoised vs
    reference (exposure-normalized space). The selection metric uses the
    REALTIME tier (InputRT1) when it exists — the production regime — and
    falls back to the accumulated Input1."""
    from litbox_tpu.nn.infer import infer_large

    if prefix is None:
        prefix = "InputRT1" if have_rt else "Input1"
    fn = trainer.eval_fn()
    base, den = [], []
    for i in held_ids[:max_scenes]:
        s = scene_scale(i)
        from litbox_tpu.io.images import read_image_linear

        noisy = read_image_linear(os.path.join(dataset_dir, f"{prefix}_Radiance_A_{i}.exr")) * s
        ref = read_image_linear(os.path.join(dataset_dir, f"Output_Reference_{i}.exr")) * s
        out = infer_large(fn, noisy, rgb=trainer.cfg.rgb)
        peak = max(float(ref.max()), 1e-6)
        psnr = lambda x: 10 * np.log10(peak**2 / max(float(((x - ref) ** 2).mean()), 1e-12))
        base.append(psnr(noisy))
        den.append(psnr(out))
    return float(np.mean(base)), float(np.mean(den))


t0 = time.time()
rng = np.random.default_rng(0)
step = 0
last_eval = 0.0
best_gain = -1e9
budget = minutes * 60

# time-sliced curriculum: 30% Easy, 30% Medium, 40% Final.
# LITBOX_TRAIN_MIX=1 instead samples a random stage per pass — the 4.6k-step
# models over-adapt to whichever profile they saw last, so a mixed polish
# balances performance across noise levels.
MIX = _os.environ.get("LITBOX_TRAIN_MIX", "") == "1"


def active_stage() -> tuple:
    if MIX:
        return stages[int(rng.integers(0, len(stages)))]
    f = (time.time() - t0) / budget
    if len(stages) == 3:
        return stages[0] if f < 0.3 else stages[1] if f < 0.6 else stages[2]
    # With realtime tiers: Easy/Medium warmup, then Final + RT emphasis.
    cuts = (0.15, 0.30, 0.55, 0.75)
    for idx, c in enumerate(cuts):
        if f < c:
            return stages[idx]
    return stages[4]


while time.time() - t0 < budget:
    name, ds = active_stage()
    for batch in ds.batches(cfg.batch_size, rng, shuffle=True):
        if rng.random() < 0.5:  # both tracers' outputs are training samples
            batch["input_a"] = batch["input_b"]
        inp, tgt = trainer.select_random_channel(batch, rng)
        loss = trainer.train_batch(inp, tgt)
        step += 1
        if step % 20 == 0:
            print(f"{time.time()-t0:7.1f}s step {step} [{name}] loss {loss:.5f}", flush=True)
        if time.time() - t0 > budget:
            break
    if time.time() - t0 - last_eval > 1500:
        last_eval = time.time() - t0
        # Periodic saves skip the optimizer state: fetching the full 3.8 GB
        # trainer state through the ~13 MB/s tunnel costs ~5 minutes; the
        # 1.3 GB params+stats take ~100 s. Final save keeps the optimizer.
        b, d = heldout_gain(3)
        print(f"CHECKPOINT {last_eval:.0f}s heldout base {b:.2f} dB denoised {d:.2f} dB "
              f"gain {d-b:+.2f} dB", flush=True)
        # Model selection ON the held-out metric (VERDICT round 1 weak #3:
        # a +0.56 dB checkpoint existed and a -0.85 dB final shipped). The
        # BEST checkpoint is what ships as model_best.npz.
        if d - b > best_gain:
            best_gain = d - b
            trainer.save("/root/repo/runs/denoiser_r2/model_best.npz",
                         include_optimizer=False)
            print(f"BEST so far {best_gain:+.2f} dB -> model_best.npz", flush=True)
        trainer.save("/root/repo/runs/denoiser_r2/model.npz", include_optimizer=False)

trainer.save("/root/repo/runs/denoiser_r2/model.npz", include_optimizer=True)
trainer.save("/root/repo/runs/denoiser_r2/model_final.npz", include_optimizer=False)
b, d = heldout_gain(len(held_ids))
print(f"FINAL steps {step} heldout base {b:.2f} dB denoised {d:.2f} dB gain {d-b:+.2f} dB", flush=True)
if d - b > best_gain:
    best_gain = d - b
    trainer.save("/root/repo/runs/denoiser_r2/model_best.npz", include_optimizer=False)
print(f"BEST heldout gain {best_gain:+.2f} dB (model_best.npz)", flush=True)
