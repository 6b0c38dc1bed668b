"""Round-3 denoiser training: production-regime quality (VERDICT r2 next #2).

Trains on dataset_r2 with BOTH the accumulated profiles (Input0/1/2) and the
realtime tiers (InputRT0/1: 1 frame, low rays, single jitter phase — the
regime the net sees in production, runs/gen_realtime_inputs.py). Model
selection is on the held-out REALTIME metric.

Two configs this round (env-selected):
  * production mono  (default): unet5/feats32, reflect pad — the reference's
    train_litbox_denoiser.py:37-43 architecture.
  * RGB realtime     (LITBOX_TRAIN_RGB=1 LITBOX_TRAIN_PAD=zeros + size env):
    out_channels=3 display net, one UNet pass per 1080p frame.

Usage: python runs/train_denoiser_r3.py [minutes] [--dataset DIR] [--resume]
       [--out DIR] [--smoke]
"""
import glob
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np

from litbox_tpu.nn.dataset import DenoiserDataset
from litbox_tpu.nn.loss import HdrLossConfig
from litbox_tpu.nn.train import TrainConfig, Trainer
from litbox_tpu.nn.unet import TransformConfig

args = [a for a in sys.argv[1:] if not a.startswith("--")]
minutes = float(args[0]) if args else 60.0
if "--dataset" in sys.argv:
    dataset_dir = sys.argv[sys.argv.index("--dataset") + 1]
else:
    dataset_dir = sorted(glob.glob("/root/repo/runs/dataset_r2/*"))[-1]
OUT = (sys.argv[sys.argv.index("--out") + 1] if "--out" in sys.argv
       else "/root/repo/runs/denoiser_r3")
os.makedirs(OUT, exist_ok=True)
print("dataset:", dataset_dir, "out:", OUT, flush=True)

refs = sorted(glob.glob(os.path.join(dataset_dir, "Output_Reference_*.exr")))
ids = [p.split("_")[-1].split(".")[0] for p in refs]
train_ids = [i for k, i in enumerate(ids) if k % 8 != 7]
held_ids = [i for k, i in enumerate(ids) if k % 8 == 7]
print(f"scenes {len(ids)}: train {len(train_ids)} held-out {len(held_ids)}", flush=True)

_scale_cache: dict = {}


def scene_scale(i: str) -> float:
    """Gray-point exposure (runs/train_denoiser_r2.py rationale): scale each
    scene so the converged reference's mean luminance sits at middle gray."""
    if i not in _scale_cache:
        from litbox_tpu.io.images import read_image_linear

        ref = read_image_linear(os.path.join(dataset_dir, f"Output_Reference_{i}.exr"))
        _scale_cache[i] = 0.18 / max(float(ref.mean()), 1e-6)
    return _scale_cache[i]


def stage(prefix: str, use_ids: list, crop: int) -> DenoiserDataset:
    return DenoiserDataset(
        [os.path.join(dataset_dir, f"{prefix}_Radiance_A_{i}.exr") for i in use_ids],
        [os.path.join(dataset_dir, f"{prefix}_Radiance_B_{i}.exr") for i in use_ids],
        [os.path.join(dataset_dir, f"Albedo_{i}.png") for i in use_ids],
        [os.path.join(dataset_dir, f"Transmissibility_{i}.exr") for i in use_ids],
        [os.path.join(dataset_dir, f"Output_Reference_{i}.exr") for i in use_ids],
        crop_size=crop, scales=[scene_scale(i) for i in use_ids])


SMOKE = "--smoke" in sys.argv
if SMOKE:
    import jax

    jax.config.update("jax_platforms", "cpu")

UNET = int(os.environ.get("LITBOX_TRAIN_UNET", "5"))
FEATS = int(os.environ.get("LITBOX_TRAIN_FEATS", "32"))
LR = float(os.environ.get("LITBOX_TRAIN_LR", "1e-4"))
BATCH = int(os.environ.get("LITBOX_TRAIN_BATCH", "8"))
RGB = os.environ.get("LITBOX_TRAIN_RGB", "0") == "1"
PAD = os.environ.get("LITBOX_TRAIN_PAD", "reflect")
CROP = 64 if SMOKE else int(os.environ.get("LITBOX_TRAIN_CROP", "192"))

cfg = TrainConfig(unet_size=3 if SMOKE else UNET,
                  initial_features=8 if SMOKE else FEATS,
                  crop_size=CROP, learn_rate=LR, epochs=1,
                  batch_size=2 if SMOKE else BATCH, global_residual=True,
                  rgb=RGB, padding_mode=PAD,
                  loss=HdrLossConfig(),
                  transform=TransformConfig(normalize_input=True))
trainer = Trainer(cfg)
if "--resume" in sys.argv:
    trainer.load(os.path.join(OUT, "model.npz"))
    print("resumed", flush=True)

have_rt = bool(glob.glob(os.path.join(dataset_dir, "InputRT0_Radiance_A_*.exr")))
stages = [("Easy", stage("Input2", train_ids, CROP)),
          ("Medium", stage("Input1", train_ids, CROP)),
          ("Final", stage("Input0", train_ids, CROP))]
if have_rt:
    stages += [("RT1", stage("InputRT1", train_ids, CROP)),
               ("RT0", stage("InputRT0", train_ids, CROP))]
print("stages:", [s[0] for s in stages], flush=True)


def heldout_gain(max_scenes: int = 6, prefix: str | None = None):
    """Held-out PSNR (noisy, denoised) on the REALTIME tier when present."""
    from litbox_tpu.io.images import read_image_linear
    from litbox_tpu.nn.infer import infer_large

    if prefix is None:
        prefix = "InputRT1" if have_rt else "Input1"
    fn = trainer.eval_fn()
    base, den = [], []
    for i in held_ids[:max_scenes]:
        s = scene_scale(i)
        noisy = read_image_linear(
            os.path.join(dataset_dir, f"{prefix}_Radiance_A_{i}.exr")) * s
        ref = read_image_linear(
            os.path.join(dataset_dir, f"Output_Reference_{i}.exr")) * s
        out = infer_large(fn, noisy, rgb=trainer.cfg.rgb)
        peak = max(float(ref.max()), 1e-6)
        psnr = lambda x: 10 * np.log10(
            peak**2 / max(float(((x - ref) ** 2).mean()), 1e-12))
        base.append(psnr(noisy))
        den.append(psnr(out))
    return float(np.mean(base)), float(np.mean(den))


t0 = time.time()
rng = np.random.default_rng(0)
step = 0
last_eval = 0.0
best_gain = -1e9
budget = minutes * 60

# Time-sliced curriculum. With realtime tiers the back half of the budget
# emphasizes them (production regime) while still revisiting the accumulated
# profiles so the HELDOUT accumulated metric stays non-negative: after the
# warmup cuts, a random stage weighted toward RT.
CUTS = (0.12, 0.24, 0.40)
RT_WEIGHTS = (0.1, 0.1, 0.2, 0.3, 0.3)  # Easy, Medium, Final, RT1, RT0


def active_stage():
    f = (time.time() - t0) / budget
    if not have_rt:
        return stages[0] if f < 0.3 else stages[1] if f < 0.6 else stages[2]
    for idx, c in enumerate(CUTS):
        if f < c:
            return stages[idx]
    return stages[int(rng.choice(len(stages), p=RT_WEIGHTS))]


while time.time() - t0 < budget:
    name, ds = active_stage()
    for batch in ds.batches(cfg.batch_size, rng, shuffle=True):
        if rng.random() < 0.5:  # both tracers' outputs are training samples
            batch["input_a"] = batch["input_b"]
        if cfg.rgb:
            import jax.numpy as jnp

            inp = jnp.asarray(batch["input_a"])
            tgt = jnp.asarray(batch["reference"])
        else:
            inp, tgt = trainer.select_random_channel(batch, rng)
        loss = trainer.train_batch(inp, tgt)
        step += 1
        if step % 20 == 0:
            print(f"{time.time()-t0:7.1f}s step {step} [{name}] loss {loss:.5f}", flush=True)
        if time.time() - t0 > budget:
            break
    if time.time() - t0 - last_eval > 1500:
        last_eval = time.time() - t0
        b, d = heldout_gain(3)
        print(f"CHECKPOINT {last_eval:.0f}s heldout base {b:.2f} dB denoised "
              f"{d:.2f} dB gain {d-b:+.2f} dB", flush=True)
        if d - b > best_gain:
            best_gain = d - b
            trainer.save(os.path.join(OUT, "model_best.npz"),
                         include_optimizer=False)
            print(f"BEST so far {best_gain:+.2f} dB -> model_best.npz", flush=True)
        trainer.save(os.path.join(OUT, "model.npz"), include_optimizer=False)

trainer.save(os.path.join(OUT, "model.npz"), include_optimizer=True)
trainer.save(os.path.join(OUT, "model_final.npz"), include_optimizer=False)
b, d = heldout_gain(len(held_ids))
print(f"FINAL steps {step} heldout base {b:.2f} dB denoised {d:.2f} dB "
      f"gain {d-b:+.2f} dB", flush=True)
if d - b > best_gain:
    best_gain = d - b
    trainer.save(os.path.join(OUT, "model_best.npz"), include_optimizer=False)
print(f"BEST heldout gain {best_gain:+.2f} dB (model_best.npz)", flush=True)
