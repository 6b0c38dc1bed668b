"""REALTIME_EVAL: production-regime denoiser evaluation from dataset files.

The denoiser's production use is cleaning REALTIME frames (one frame, low
rays, single jitter phase — AIAccelerator.cs:57-84 runs the model every
step). runs/gen_realtime_inputs.py renders exactly that regime for every
dataset scene as InputRT{0,1}_Radiance_{A,B}_#####.exr (8192 / 32768 rays).
This script measures noisy-vs-reference and denoised-vs-reference PSNR on
the held-out scenes (k % 8 == 7, never trained on) for both tiers and
writes REALTIME_EVAL.md.

File-based on purpose: it needs no simulation, so with --cpu it runs
concurrently with TPU training (one TPU client at a time in this
environment).

Usage: python runs/eval_realtime_r3.py CKPT [--cpu] [--bf16] [--blend]
       [--report REALTIME_EVAL.md] [--dataset DIR] [--all-scenes]

--blend: calibrate the residual-blend factor k per tier on TRAINING scenes
(closed form, nn.infer.fit_blend) and evaluate the blended output on the
held-out scenes.
--pair-blend: single-tracer self-calibrated blend — k from the OTHER
tracer (nn.infer.blend_from_pair), applied around ONE tracer. NOTE (ADVICE
r3 #2): this is NOT the shipped production composition. AIAccelerator
blend='auto' denoises BOTH tracers and blends the pair MEAN with the
symmetric cross-calibrated k (nn.infer.blend_pair_symmetric); that exact
composition is what runs/quality_report.py evaluates — use QUALITY.md for
production-mode numbers. This script's estimator is kept for the
round-over-round comparison of single-tracer figures only.
"""
import glob
import os
import sys

sys.path.insert(0, "/root/repo")

if "--cpu" in sys.argv:
    import jax

    jax.config.update("jax_platforms", "cpu")

import numpy as np

from litbox_tpu.io.images import read_image_linear
from litbox_tpu.nn.infer import blend_from_pair, fit_blend, infer_large
from litbox_tpu.nn.train import Trainer, load_train_config

if "--dataset" in sys.argv:
    dataset_dir = sys.argv[sys.argv.index("--dataset") + 1]
else:
    dataset_dir = sorted(glob.glob("/root/repo/runs/dataset_r2/*"))[-1]
flag_vals = {sys.argv[sys.argv.index(f) + 1]
             for f in ("--dataset", "--report") if f in sys.argv}
ckpt = next(a for a in sys.argv[1:]
            if not a.startswith("--") and a not in flag_vals)
report = (sys.argv[sys.argv.index("--report") + 1]
          if "--report" in sys.argv else None)

refs = sorted(glob.glob(os.path.join(dataset_dir, "Output_Reference_*.exr")))
ids = [p.split("_")[-1].split(".")[0] for p in refs]
held = ids if "--all-scenes" in sys.argv else [
    i for k, i in enumerate(ids) if k % 8 == 7]
train_ids = [i for k, i in enumerate(ids) if k % 8 != 7]
USE_BLEND = "--blend" in sys.argv
PAIR_BLEND = "--pair-blend" in sys.argv
print(f"dataset {os.path.basename(dataset_dir)}: {len(ids)} scenes, "
      f"{len(held)} evaluated; ckpt {ckpt}", flush=True)

trainer = Trainer(load_train_config(ckpt))
trainer.load(ckpt)
USE_BF16 = "--bf16" in sys.argv
if USE_BF16:
    # The fused 1080p display runs the net in bf16 (runs/bench_1080p.py
    # --bf16); measure the production regime at production precision.
    import jax
    import jax.numpy as jnp

    cast = lambda t: jax.tree.map(
        lambda x: x.astype(jnp.bfloat16)
        if hasattr(x, "dtype") and x.dtype == jnp.float32 else x, t)
    trainer.params = cast(trainer.params)
    trainer.batch_stats = cast(trainer.batch_stats)
    _inner = trainer.eval_fn()
    fn = lambda x: _inner(jnp.asarray(x).astype(jnp.bfloat16)).astype(
        jnp.float32)
else:
    fn = trainer.eval_fn()

def calib_pairs(prefix, n=8):
    for i in train_ids[:n]:
        pr = os.path.join(dataset_dir, f"{prefix}_Radiance_A_{i}.exr")
        pf = os.path.join(dataset_dir, f"Output_Reference_{i}.exr")
        if not os.path.exists(pr):
            continue
        ref = read_image_linear(pf)
        s = 0.18 / max(float(ref.mean()), 1e-6)
        yield read_image_linear(pr) * s, ref * s


TIERS = (("InputRT0", 8192), ("InputRT1", 32768))
rows = []
for prefix, rays in TIERS:
    k = 1.0
    if USE_BLEND:
        k = fit_blend(fn, calib_pairs(prefix), rgb=trainer.cfg.rgb)
        print(f"{prefix}: calibrated blend k={k:.3f} on train scenes",
              flush=True)
    base_all, den_all = [], []
    for i in held:
        ref = read_image_linear(
            os.path.join(dataset_dir, f"Output_Reference_{i}.exr"))
        s = 0.18 / max(float(ref.mean()), 1e-6)
        ref = ref * s
        peak = max(float(ref.max()), 1e-6)
        for tracer, other_t in (("A", "B"), ("B", "A")):
            p = os.path.join(dataset_dir, f"{prefix}_Radiance_{tracer}_{i}.exr")
            if not os.path.exists(p):
                continue
            noisy = read_image_linear(p) * s
            out = infer_large(fn, noisy.astype(np.float32),
                              rgb=trainer.cfg.rgb, blend=k)
            if PAIR_BLEND:
                other = read_image_linear(os.path.join(
                    dataset_dir,
                    f"{prefix}_Radiance_{other_t}_{i}.exr")) * s
                kp = blend_from_pair(out, noisy, other.astype(np.float32))
                out = noisy + kp * (out - noisy)
            psnr = lambda x: 10 * np.log10(
                peak**2 / max(float(((x - ref) ** 2).mean()), 1e-12))
            base_all.append(psnr(noisy))
            den_all.append(psnr(out))
    if not base_all:
        print(f"{prefix}: no files — run runs/gen_realtime_inputs.py first")
        continue
    row = dict(tier=f"{prefix} (1 frame x {rays} rays)"
               + (f" k={k:.2f}" if USE_BLEND else "")
               + (" auto-k" if PAIR_BLEND else ""), n=len(base_all),
               base_db=float(np.mean(base_all)),
               denoised_db=float(np.mean(den_all)),
               gain_db=float(np.mean(den_all) - np.mean(base_all)))
    rows.append(row)
    print(" ".join(f"{k}={v:.3f}" if isinstance(v, float) else f"{k}={v}"
                   for k, v in row.items()), flush=True)

if report and rows:
    with open(report, "w") as f:
        f.write("# Realtime-regime denoiser evaluation\n\n")
        f.write(
            f"Checkpoint: `{ckpt}`; dataset `{os.path.basename(dataset_dir)}`; "
            f"{len(held)} held-out scenes x 2 tracers. Inputs are single-frame "
            "single-jitter-phase MC renders (the production regime the net "
            "sees in the fused pipeline, runs/gen_realtime_inputs.py); PSNR "
            "is gray-point exposure-normalized vs the converged reference."
            + (" Net run in bf16 (production display precision)."
               if USE_BF16 else "")
            + (" Inference uses the residual-blend factor k calibrated "
               "per tier on TRAINING scenes (nn.infer.fit_blend; the "
               "production AIAccelerator blend knob)." if USE_BLEND else "")
            + (" Inference is the single-tracer self-calibrated blend "
               "(nn.infer.blend_from_pair; NOT the shipped pair-mean "
               "composition — see QUALITY.md for production numbers): each "
               "sample self-calibrates k against the other tracer of its "
               "pair — no reference data is used." if PAIR_BLEND else "")
            + "\n\n")
        f.write("| tier | n | noisy dB | denoised dB | gain dB |\n"
                "|---|---|---|---|---|\n")
        for r in rows:
            f.write(f"| {r['tier']} | {r['n']} | {r['base_db']:.2f} | "
                    f"{r['denoised_db']:.2f} | **{r['gain_db']:+.2f}** |\n")
    print("wrote", report)
