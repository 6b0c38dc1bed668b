"""Round-4 denoiser training: make the production composition WIN.

Changes vs runs/train_denoiser_r3.py, each tied to a measured r3 failure:

1. Log-space parametrization (TransformConfig.use_log_space): r3's net left
   a ~2e-4 linear glow in black regions — invisible to the linear loss but
   ~5/255 after gamma decode, which halved golden SSIM (runs/diag_ssim.py:
   the entire SSIM drop sits at ref-lum < 0.02). Relative-error space makes
   the black floor scale-free.
2. Stable loss scale (HdrLossConfig.normalize_weights + log_l1): r3's loss
   oscillated 1 -> 27k batch-to-batch (runs/phase2_r3.log) because the
   adaptive HDR weight rescaled the objective per crop.
3. Warmup-cosine LR over the budget (TrainConfig.lr_decay_steps).
4. Model selection on the EXACT production composition: denoise both
   tracers, blend the pair mean with the cross-calibrated k
   (nn.infer.blend_pair_symmetric — what AIAccelerator blend='auto' ships),
   scored against the pair-mean baseline. r3 selected on single-tracer raw
   gain, which is not the shipped estimator (ADVICE r3 #2).
5. Optional noise2noise mixing (LITBOX_TRAIN_N2N): with probability p the
   target is the OTHER tracer's render — an unbiased L2 target (Lehtinen et
   al. 2018) the dual-tracer factory gives us for free (VERDICT r3 next #2).
6. ON-DEVICE data pipeline (nn/device_data.py): stage tensors live in HBM,
   batches are drawn inside jit, and the loss is fetched every 20 steps
   instead of every step. Host-batch feeding measured 1.1 s/step through
   the ~20 MB/s TPU tunnel vs ~0.07 s/step of compute for the RGB net.

Usage: python runs/train_denoiser_r4.py [minutes] [--dataset DIR] [--resume]
       [--out DIR] [--smoke]
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
       else "/root/repo/runs/denoiser_r4")
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
    """Gray-point exposure: scale each scene so the converged reference's
    mean luminance sits at middle gray (runs/train_denoiser_r2.py)."""
    if i not in _scale_cache:
        from litbox_tpu.io.images import read_image_linear

        ref = read_image_linear(
            os.path.join(dataset_dir, f"Output_Reference_{i}.exr"))
        _scale_cache[i] = 0.18 / max(float(ref.mean()), 1e-6)
    return _scale_cache[i]


def stage_arrays(prefix: str, use_ids: list):
    """Decode one tier into stacked (N, H, W, 3) arrays (device_data)."""
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
UNET = int(os.environ.get("LITBOX_TRAIN_UNET", "5"))
FEATS = int(os.environ.get("LITBOX_TRAIN_FEATS", "32"))
LR = float(os.environ.get("LITBOX_TRAIN_LR", "1e-4"))
BATCH = int(os.environ.get("LITBOX_TRAIN_BATCH", "8"))
RGB = os.environ.get("LITBOX_TRAIN_RGB", "0") == "1"
PAD = os.environ.get("LITBOX_TRAIN_PAD", "reflect")
CROP = 64 if SMOKE else int(os.environ.get("LITBOX_TRAIN_CROP", "192"))
N2N = float(os.environ.get("LITBOX_TRAIN_N2N", "0.25"))
LOGSPACE = os.environ.get("LITBOX_TRAIN_LOG", "1") == "1"
LOG_L1 = float(os.environ.get("LITBOX_TRAIN_LOGL1", "0.25"))
# Cosine schedule length from the budget and the measured step cost with
# the on-device pipeline (mono unet5/feats32 ~0.22 s/step on v5e at crop
# 192 batch 8; the small RGB net ~0.09 s/step including dispatch).
SEC_PER_STEP = 0.22 if (UNET >= 5 and not SMOKE) else 0.09
DECAY_STEPS = int(os.environ.get(
    "LITBOX_TRAIN_STEPS", str(max(int(minutes * 60 / SEC_PER_STEP), 100))))

cfg = TrainConfig(unet_size=3 if SMOKE else UNET,
                  initial_features=8 if SMOKE else FEATS,
                  crop_size=CROP, learn_rate=LR, epochs=1,
                  lr_decay_steps=DECAY_STEPS, lr_min=LR * 0.02,
                  warmup_steps=min(200, DECAY_STEPS // 20),
                  batch_size=2 if SMOKE else BATCH, global_residual=True,
                  rgb=RGB, padding_mode=PAD,
                  loss=HdrLossConfig(normalize_weights=True, log_l1=LOG_L1,
                                     compress=os.environ.get(
                                         "LITBOX_TRAIN_COMPRESS", "log1p")),
                  transform=TransformConfig(use_log_space=LOGSPACE,
                                            normalize_input=True))
trainer = Trainer(cfg)
if "--resume" in sys.argv:
    trainer.load(os.path.join(OUT, "model.npz"))
    print("resumed", flush=True)


def rt_prefixes() -> list:
    ks = sorted({int(p.split("InputRT")[1].split("_")[0]) for p in glob.glob(
        os.path.join(dataset_dir, "InputRT*_Radiance_A_*.exr"))})
    return [f"InputRT{k}" for k in reversed(ks)]  # high rays (clean) first


RT = rt_prefixes()
have_rt = bool(RT)


def ids_with(prefix: str, use_ids: list) -> list:
    return [i for i in use_ids if os.path.exists(
        os.path.join(dataset_dir, f"{prefix}_Radiance_B_{i}.exr"))]


from litbox_tpu.nn.device_data import DeviceStages

stage_names = ["Easy", "Medium", "Final"] + RT
stage_prefix = {"Easy": "Input2", "Medium": "Input1", "Final": "Input0",
                **{p: p for p in RT}}
print("decoding stages...", flush=True)
dev = DeviceStages({name: stage_arrays(stage_prefix[name],
                                       ids_with(stage_prefix[name], train_ids))
                    for name in stage_names})
print("stages:", [(n, d[0].shape) for n, d in dev.data.items()], flush=True)


def production_gain(prefix: str, max_scenes: int = 6):
    """Held-out gain of the SHIPPED estimator: PSNR(blended denoised pair
    mean) - PSNR(pair mean). Returns (gain_db, mean_k)."""
    from litbox_tpu.io.images import read_image_linear

    fn = trainer.eval_fn()
    gains, ks = [], []
    for i in ids_with(prefix, held_ids)[:max_scenes]:
        s = scene_scale(i)
        a = read_image_linear(os.path.join(
            dataset_dir, f"{prefix}_Radiance_A_{i}.exr")) * s
        b = read_image_linear(os.path.join(
            dataset_dir, f"{prefix}_Radiance_B_{i}.exr")) * s
        ref = read_image_linear(os.path.join(
            dataset_dir, f"Output_Reference_{i}.exr")) * s
        out_a = infer_large(fn, a.astype(np.float32), rgb=trainer.cfg.rgb)
        out_b = infer_large(fn, b.astype(np.float32), rgb=trainer.cfg.rgb)
        disp, k = blend_pair_symmetric(out_a, out_b, a, b)
        x = (a + b) * 0.5
        peak = max(float(ref.max()), 1e-6)
        psnr = lambda v: 10 * np.log10(
            peak**2 / max(float(((v - ref) ** 2).mean()), 1e-12))
        gains.append(psnr(disp) - psnr(x))
        ks.append(float(k))
    return float(np.mean(gains)), float(np.mean(ks))


def selection_score(max_scenes: int = 3):
    """Production realtime gain, penalized 3x for any NEGATIVE
    accumulated-profile production gain (same guard as r3)."""
    rt_prefix = RT[-1] if have_rt else "Input1"
    rt_gain, rt_k = production_gain(rt_prefix, max_scenes)
    acc_gain, _ = production_gain("Input1", max_scenes)
    return rt_gain + 3.0 * min(0.0, acc_gain), rt_gain, acc_gain, rt_k


t0 = time.time()
rng = np.random.default_rng(0)
step = 0
last_eval = 0.0
best_gain = -1e9
budget = minutes * 60

CUTS = (0.12, 0.24, 0.40)
RT_WEIGHTS = tuple([0.1, 0.1, 0.2] + [0.6 / max(len(RT), 1)] * len(RT))
# LITBOX_TRAIN_RT_ONLY=1: skip the accumulated-tier curriculum ramp and mix
# realtime tiers from step 0 (for fine-tuning an already-trained checkpoint
# on the production regime; keeps a 20% accumulated-tier floor so the
# selection guard's acc profiles don't regress).
RT_ONLY = os.environ.get("LITBOX_TRAIN_RT_ONLY", "0") == "1"
RT_ONLY_WEIGHTS = tuple([0.05, 0.05, 0.10] + [0.8 / max(len(RT), 1)] * len(RT))


def active_stage() -> str:
    f = (time.time() - t0) / budget
    if not have_rt:
        return ("Easy" if f < 0.3 else "Medium" if f < 0.6 else "Final")
    if RT_ONLY:
        return stage_names[int(rng.choice(len(stage_names), p=RT_ONLY_WEIGHTS))]
    for idx, c in enumerate(CUTS):
        if f < c:
            return stage_names[idx]
    return stage_names[int(rng.choice(len(stage_names), p=RT_WEIGHTS))]


import jax

base_key = jax.random.key(cfg.seed + 1)
while time.time() - t0 < budget:
    name = active_stage()
    # Chunks of 20 steps with ONE host sync at the end (the loss fetch):
    # dispatches queue back-to-back through the async tunnel; per-step
    # float(loss) would add a full ~30 ms round-trip each step.
    loss = None
    for _ in range(20):
        inp, tgt = dev.sample(name, jax.random.fold_in(base_key, step),
                              cfg.batch_size, CROP, cfg.rgb, n2n_p=N2N)
        loss = trainer.train_batch_async(inp, tgt)
        step += 1
    print(f"{time.time()-t0:7.1f}s step {step} [{name}] "
          f"loss {float(loss):.5f}", flush=True)
    if time.time() - t0 - last_eval > 600:
        last_eval = time.time() - t0
        score, rt_g, acc_g, rt_k = selection_score()
        print(f"CHECKPOINT {last_eval:.0f}s prod-gain rt {rt_g:+.2f} dB "
              f"(k={rt_k:.2f}) acc {acc_g:+.2f} dB score {score:+.2f}",
              flush=True)
        if score > best_gain:
            best_gain = score
            trainer.save(os.path.join(OUT, "model_best.npz"),
                         include_optimizer=False)
            print(f"BEST so far {best_gain:+.2f} -> model_best.npz",
                  flush=True)
        trainer.save(os.path.join(OUT, "model.npz"), include_optimizer=False)

trainer.save(os.path.join(OUT, "model.npz"), include_optimizer=True)
trainer.save(os.path.join(OUT, "model_final.npz"), include_optimizer=False)
score, rt_g, acc_g, rt_k = selection_score(len(held_ids))
print(f"FINAL steps {step} prod-gain rt {rt_g:+.2f} dB (k={rt_k:.2f}) "
      f"acc {acc_g:+.2f} dB score {score:+.2f}", flush=True)
if score > best_gain:
    best_gain = score
    trainer.save(os.path.join(OUT, "model_best.npz"), include_optimizer=False)
print(f"BEST selection score {best_gain:+.2f} (model_best.npz)", flush=True)
