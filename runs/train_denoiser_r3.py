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

if "--smoke" in sys.argv:
    # Pin the platform BEFORE any litbox import can touch a backend: with
    # the TPU tunnel busy (one client at a time), a late pin leaves a
    # first-touch axon init blocked on the tunnel lock.
    import jax

    jax.config.update("jax_platforms", "cpu")

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

def rt_prefixes() -> list:
    """InputRT tiers present on disk, noisiest (lowest rays = highest k by
    gen convention? no — k indexes the --tiers list ascending) ordered so
    the curriculum ends on the noisiest tier: RT ray counts ascend with k,
    so reverse-k = cleanest-first is wrong; order stages clean -> noisy,
    i.e. descending rays = descending k."""
    ks = sorted({int(p.split("InputRT")[1].split("_")[0]) for p in glob.glob(
        os.path.join(dataset_dir, "InputRT*_Radiance_A_*.exr"))})
    return [f"InputRT{k}" for k in reversed(ks)]  # high rays (clean) first


RT = rt_prefixes()
have_rt = bool(RT)


def ids_with(prefix: str, use_ids: list) -> list:
    """Scenes whose files exist for this tier (the factory and the RT input
    renderer run in sequence; a scene can have a ref before its RT tiers)."""
    return [i for i in use_ids if os.path.exists(
        os.path.join(dataset_dir, f"{prefix}_Radiance_B_{i}.exr"))]


stages = [("Easy", stage("Input2", ids_with("Input2", train_ids), CROP)),
          ("Medium", stage("Input1", ids_with("Input1", train_ids), CROP)),
          ("Final", stage("Input0", ids_with("Input0", train_ids), CROP))]
stages += [(p, stage(p, ids_with(p, train_ids), CROP)) for p in RT]
print("stages:", [(s[0], len(s[1])) for s in stages], flush=True)


def heldout_gain(max_scenes: int = 6, prefix: str | None = None):
    """Held-out PSNR (noisy, denoised) on the REALTIME tier when present."""
    from litbox_tpu.io.images import read_image_linear
    from litbox_tpu.nn.infer import infer_large

    if prefix is None:
        prefix = RT[-1] if have_rt else "Input1"  # noisiest realtime tier
    fn = trainer.eval_fn()
    base, den = [], []
    for i in ids_with(prefix, held_ids)[:max_scenes]:
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
# Accumulated stages keep 0.4 of the post-warmup sampling; RT tiers split
# the remaining 0.6 evenly.
RT_WEIGHTS = tuple([0.1, 0.1, 0.2] + [0.6 / max(len(RT), 1)] * len(RT))


def active_stage():
    f = (time.time() - t0) / budget
    if not have_rt:
        return stages[0] if f < 0.3 else stages[1] if f < 0.6 else stages[2]
    for idx, c in enumerate(CUTS):
        if f < c:
            return stages[idx]
    return stages[int(rng.choice(len(stages), p=RT_WEIGHTS))]


def selection_score(max_scenes: int = 3):
    """Model-selection metric: held-out REALTIME gain, penalized 3x for any
    NEGATIVE accumulated-profile gain (VERDICT r2 requires the realtime win
    to not reintroduce the -3.6 dB accumulated regression)."""
    rb, rd = heldout_gain(max_scenes)
    ab, ad = heldout_gain(max_scenes, prefix="Input1")
    rt_gain, acc_gain = rd - rb, ad - ab
    return rt_gain + 3.0 * min(0.0, acc_gain), rt_gain, acc_gain


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
    if time.time() - t0 - last_eval > 600:
        last_eval = time.time() - t0
        score, rt_g, acc_g = selection_score()
        print(f"CHECKPOINT {last_eval:.0f}s heldout rt {rt_g:+.2f} dB "
              f"acc {acc_g:+.2f} dB score {score:+.2f}", flush=True)
        if score > best_gain:
            best_gain = score
            trainer.save(os.path.join(OUT, "model_best.npz"),
                         include_optimizer=False)
            print(f"BEST so far {best_gain:+.2f} -> model_best.npz", flush=True)
        trainer.save(os.path.join(OUT, "model.npz"), include_optimizer=False)

trainer.save(os.path.join(OUT, "model.npz"), include_optimizer=True)
trainer.save(os.path.join(OUT, "model_final.npz"), include_optimizer=False)
score, rt_g, acc_g = selection_score(len(held_ids))
print(f"FINAL steps {step} heldout rt {rt_g:+.2f} dB acc {acc_g:+.2f} dB "
      f"score {score:+.2f}", flush=True)
if score > best_gain:
    best_gain = score
    trainer.save(os.path.join(OUT, "model_best.npz"), include_optimizer=False)
print(f"BEST selection score {best_gain:+.2f} (model_best.npz)", flush=True)
