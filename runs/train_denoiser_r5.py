"""Round-5 denoiser training: optimize the PRODUCTION composition itself.

VERDICT r4 next #3: four rounds of nets whose raw output loses to the pair
mean, winning only through k-shrinkage. Round-4 measurements localized the
remaining gap: the per-frame k estimator is structurally blind to common-mode
corrections, and the banded-k experiment (runs/eval_banded.py) proved the
oracle headroom (+2.5 dB vs +1.2 extracted on RT0) is NOT spatial — it
sits in scenes where the net's real correction cancels in d_a - d_b and
earns k = 0.

The round-5 answer is to train THROUGH the estimator: the loss scores the
exact displayed image x + k*(d_a + d_b)/2 with k the same per-crop
cross-projection blend_pair_symmetric ships (Trainer.train_batch_pair_async,
TrainConfig.pair_composition). Gradients flow through k, so corrections
that cancel in the estimator earn no loss reduction unless they also
survive the raw term (raw_loss_weight * loss(pair-mean output)) — the net
is pushed toward corrections the production calibration can actually
credit, and toward neutrality where it cannot.

Other changes vs runs/train_denoiser_r4.py:
  * warm start from the r4 production checkpoint (same unet4/feats16 RGB
    architecture) unless --fresh;
  * curriculum unchanged; n2n is dropped (the composition target needs the
    true reference; tracer-swap augmentation stays in sample_batch_pair).

Usage: python runs/train_denoiser_r5.py [minutes] [--dataset DIR] [--resume]
       [--out DIR] [--smoke] [--fresh]
"""
import glob
import os
import sys
import time

sys.path.insert(0, "/root/repo")

if "--smoke" in sys.argv:
    import jax

    jax.config.update("jax_platforms", "cpu")

import numpy as np

from litbox_tpu.nn.infer import blend_pair_symmetric, infer_large
from litbox_tpu.nn.loss import HdrLossConfig
from litbox_tpu.nn.train import TrainConfig, Trainer
from litbox_tpu.nn.unet import TransformConfig

args = [a for a in sys.argv[1:] if not a.startswith("--")]
minutes = float(args[0]) if args else 60.0
flag_vals = {sys.argv[sys.argv.index(f) + 1]
             for f in ("--dataset", "--out") if f in sys.argv}
if "--dataset" in sys.argv:
    dataset_dir = sys.argv[sys.argv.index("--dataset") + 1]
else:
    dataset_dir = sorted(glob.glob("/root/repo/runs/dataset_r2/*"))[-1]
OUT = (sys.argv[sys.argv.index("--out") + 1] if "--out" in sys.argv
       else "/root/repo/runs/denoiser_r5")
os.makedirs(OUT, exist_ok=True)
print("dataset:", dataset_dir, "out:", OUT, flush=True)

refs = sorted(glob.glob(os.path.join(dataset_dir, "Output_Reference_*.exr")))
ids = [p.split("_")[-1].split(".")[0] for p in refs]
train_ids = [i for k, i in enumerate(ids) if k % 8 != 7]
held_ids = [i for k, i in enumerate(ids) if k % 8 == 7]
print(f"scenes {len(ids)}: train {len(train_ids)} held-out {len(held_ids)}",
      flush=True)

_scale_cache: dict = {}


def scene_scale(i: str) -> float:
    if i not in _scale_cache:
        from litbox_tpu.io.images import read_image_linear

        ref = read_image_linear(
            os.path.join(dataset_dir, f"Output_Reference_{i}.exr"))
        _scale_cache[i] = 0.18 / max(float(ref.mean()), 1e-6)
    return _scale_cache[i]


def stage_arrays(prefix: str, use_ids: list):
    from litbox_tpu.nn.device_data import stack_stage

    return stack_stage(
        [os.path.join(dataset_dir, f"{prefix}_Radiance_A_{i}.exr")
         for i in use_ids],
        [os.path.join(dataset_dir, f"{prefix}_Radiance_B_{i}.exr")
         for i in use_ids],
        [os.path.join(dataset_dir, f"Output_Reference_{i}.exr")
         for i in use_ids],
        [scene_scale(i) for i in use_ids])


SMOKE = "--smoke" in sys.argv
UNET = int(os.environ.get("LITBOX_TRAIN_UNET", "4"))
FEATS = int(os.environ.get("LITBOX_TRAIN_FEATS", "16"))
LR = float(os.environ.get("LITBOX_TRAIN_LR", "1.5e-5"))
BATCH = int(os.environ.get("LITBOX_TRAIN_BATCH", "16"))
PAD = os.environ.get("LITBOX_TRAIN_PAD", "reflect")
CROP = 64 if SMOKE else int(os.environ.get("LITBOX_TRAIN_CROP", "192"))
LOG_L1 = float(os.environ.get("LITBOX_TRAIN_LOGL1", "0.25"))
REL_L2 = float(os.environ.get("LITBOX_TRAIN_RELL2", "1.0"))
RAW_W = float(os.environ.get("LITBOX_TRAIN_RAW_W", "0.5"))
# Identity augmentation (see device_data.sample_batch_pair): the measured
# fix for converged-scene hallucination (held-out 00024 raw -73 dB).
ID_P = float(os.environ.get("LITBOX_TRAIN_IDP", "0.15"))
WARM = ("" if "--fresh" in sys.argv else os.environ.get(
    "LITBOX_TRAIN_WARM", "/root/repo/runs/denoiser_r4_rgb/model_best.npz"))
SEC_PER_STEP = 0.12 if not SMOKE else 0.5  # pair step = 2x batch through the net
DECAY_STEPS = int(os.environ.get(
    "LITBOX_TRAIN_STEPS", str(max(int(minutes * 60 / SEC_PER_STEP), 100))))

cfg = TrainConfig(unet_size=3 if SMOKE else UNET,
                  initial_features=8 if SMOKE else FEATS,
                  crop_size=CROP, learn_rate=LR, epochs=1,
                  lr_decay_steps=DECAY_STEPS, lr_min=LR * 0.02,
                  warmup_steps=min(200, DECAY_STEPS // 20),
                  batch_size=2 if SMOKE else BATCH, global_residual=True,
                  rgb=True, padding_mode=PAD,
                  pair_composition=True, raw_loss_weight=RAW_W,
                  loss=HdrLossConfig(normalize_weights=True, log_l1=LOG_L1,
                                     rel_l2=REL_L2, compress="log1p"),
                  transform=TransformConfig(use_log_space=True,
                                            normalize_input=True))
trainer = Trainer(cfg)
if "--resume" in sys.argv:
    trainer.load(os.path.join(OUT, "model.npz"))
    print("resumed", flush=True)
elif WARM and not SMOKE and os.path.exists(WARM):
    from litbox_tpu.nn.train import load_train_config

    wc = load_train_config(WARM)
    assert (wc.unet_size, wc.initial_features, wc.rgb) == (
        cfg.unet_size, cfg.initial_features, cfg.rgb), "architecture mismatch"
    trainer.load(WARM)
    print("warm-started from", WARM, flush=True)

from litbox_tpu.nn.device_data import DeviceStages


def rt_prefixes() -> list:
    ks = sorted({int(p.split("InputRT")[1].split("_")[0]) for p in glob.glob(
        os.path.join(dataset_dir, "InputRT*_Radiance_A_*.exr"))})
    return [f"InputRT{k}" for k in reversed(ks)]


RT = rt_prefixes()
have_rt = bool(RT)


def ids_with(prefix: str, use_ids: list) -> list:
    return [i for i in use_ids if os.path.exists(
        os.path.join(dataset_dir, f"{prefix}_Radiance_B_{i}.exr"))]


stage_names = ["Easy", "Medium", "Final"] + RT
stage_prefix = {"Easy": "Input2", "Medium": "Input1", "Final": "Input0",
                **{p: p for p in RT}}
print("decoding stages...", flush=True)
dev = DeviceStages({name: stage_arrays(stage_prefix[name],
                                       ids_with(stage_prefix[name], train_ids))
                    for name in stage_names})
print("stages:", [(n, d[0].shape) for n, d in dev.data.items()], flush=True)


def production_gain(prefix: str, max_scenes: int = 6):
    """Held-out production gain AND raw-net gain (the two VERDICT targets:
    gain >= +1.8, raw_gain >= 0). Returns (gain, raw_gain, mean_k)."""
    from litbox_tpu.io.images import read_image_linear

    fn = trainer.eval_fn()
    gains, raws, ks = [], [], []
    for i in ids_with(prefix, held_ids)[:max_scenes]:
        s = scene_scale(i)
        a = read_image_linear(os.path.join(
            dataset_dir, f"{prefix}_Radiance_A_{i}.exr")) * s
        b = read_image_linear(os.path.join(
            dataset_dir, f"{prefix}_Radiance_B_{i}.exr")) * s
        ref = read_image_linear(os.path.join(
            dataset_dir, f"Output_Reference_{i}.exr")) * s
        out_a = infer_large(fn, a.astype(np.float32), rgb=True)
        out_b = infer_large(fn, b.astype(np.float32), rgb=True)
        disp, k = blend_pair_symmetric(out_a, out_b, a, b)
        x = (a + b) * 0.5
        peak = max(float(ref.max()), 1e-6)
        psnr = lambda v: 10 * np.log10(
            peak**2 / max(float(((v - ref) ** 2).mean()), 1e-12))
        base = psnr(x)
        gains.append(psnr(disp) - base)
        raws.append(psnr((out_a + out_b) * 0.5) - base)
        ks.append(float(k))
    return float(np.mean(gains)), float(np.mean(raws)), float(np.mean(ks))


def selection_score(max_scenes: int = 3):
    rt_prefix = RT[-1] if have_rt else "Input1"
    rt_gain, rt_raw, rt_k = production_gain(rt_prefix, max_scenes)
    acc_gain, _, _ = production_gain("Input1", max_scenes)
    return rt_gain + 3.0 * min(0.0, acc_gain), rt_gain, rt_raw, acc_gain, rt_k


t0 = time.time()
rng = np.random.default_rng(0)
step = 0
last_eval = 0.0
best_gain = -1e9
budget = minutes * 60

CUTS = (0.10, 0.20, 0.32)
RT_WEIGHTS = tuple([0.1, 0.1, 0.2] + [0.6 / max(len(RT), 1)] * len(RT))
# Fine-tune mode (default ON when warm-starting): the warm-started net
# already knows the accumulated tiers — re-running the Easy->Final ramp
# with a hot LR measurably destroyed the r4 quality before relearning it
# (first r5 launch: +1.21 -> +0.21 in 600 s). Mix all tiers from step 0.
MIX_FROM_START = os.environ.get("LITBOX_TRAIN_MIX", "1") == "1"


def active_stage() -> str:
    f = (time.time() - t0) / budget
    if not have_rt:
        return ("Easy" if f < 0.3 else "Medium" if f < 0.6 else "Final")
    if not MIX_FROM_START:
        for idx, c in enumerate(CUTS):
            if f < c:
                return stage_names[idx]
    return stage_names[int(rng.choice(len(stage_names), p=RT_WEIGHTS))]


import jax

base_key = jax.random.key(cfg.seed + 1)
while time.time() - t0 < budget:
    name = active_stage()
    loss = None
    for _ in range(20):
        a, b, ref = dev.sample_pair(name, jax.random.fold_in(base_key, step),
                                    cfg.batch_size, CROP, True,
                                    identity_p=ID_P)
        loss = trainer.train_batch_pair_async(a, b, ref)
        step += 1
    print(f"{time.time()-t0:7.1f}s step {step} [{name}] "
          f"loss {float(loss):.5f}", flush=True)
    if time.time() - t0 - last_eval > 600:
        last_eval = time.time() - t0
        score, rt_g, rt_raw, acc_g, rt_k = selection_score()
        print(f"CHECKPOINT {last_eval:.0f}s prod-gain rt {rt_g:+.2f} dB "
              f"raw {rt_raw:+.2f} dB (k={rt_k:.2f}) acc {acc_g:+.2f} dB "
              f"score {score:+.2f}", flush=True)
        if score > best_gain:
            best_gain = score
            trainer.save(os.path.join(OUT, "model_best.npz"),
                         include_optimizer=False)
            print(f"BEST so far {best_gain:+.2f} -> model_best.npz",
                  flush=True)
        trainer.save(os.path.join(OUT, "model.npz"), include_optimizer=False)

trainer.save(os.path.join(OUT, "model.npz"), include_optimizer=True)
trainer.save(os.path.join(OUT, "model_final.npz"), include_optimizer=False)
score, rt_g, rt_raw, acc_g, rt_k = selection_score(len(held_ids))
print(f"FINAL steps {step} prod-gain rt {rt_g:+.2f} dB raw {rt_raw:+.2f} "
      f"(k={rt_k:.2f}) acc {acc_g:+.2f} dB score {score:+.2f}", flush=True)
if score > best_gain:
    best_gain = score
    trainer.save(os.path.join(OUT, "model_best.npz"), include_optimizer=False)
print(f"BEST selection score {best_gain:+.2f} (model_best.npz)", flush=True)
