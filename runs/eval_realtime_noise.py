"""Denoiser evaluation at realtime noise levels.

The dataset's accumulated input profiles measure 38-43 dB against the
converged references — the RBT engine's line-integral deposits and jitter
ladder leave little noise at dataset ray counts (the reference's own noisy
tiers sit at 8-23 dB). The denoiser's production use is REALTIME frames:
one frame, low rays, a single jitter phase. This eval renders exactly that
for each held-out scene and measures the denoiser against the converged
reference.

Usage: python runs/eval_realtime_noise.py [ckpt] [rays] [--report OUT.md]
"""
import glob
import json
import os
import sys

sys.path.insert(0, "/root/repo")
import numpy as np

dataset_dir = sorted(glob.glob("/root/repo/runs/dataset_r2/*"))[-1]
args = [a for a in sys.argv[1:] if not a.startswith("--")]
ckpt = args[0] if args else "/root/repo/runs/denoiser_r2/model_final.npz"
rays = int(args[1]) if len(args) > 1 else 16384
report = None
if "--report" in sys.argv:
    report = sys.argv[sys.argv.index("--report") + 1]

import jax

from litbox_tpu.core.types import SimulationProfile
from litbox_tpu.data.factory import build_scene_from_description
from litbox_tpu.engine import Mode, Simulation
from litbox_tpu.io.images import read_image_linear
from litbox_tpu.nn.infer import infer_large
from litbox_tpu.nn.train import Trainer, load_train_config

refs = sorted(glob.glob(os.path.join(dataset_dir, "Output_Reference_*.exr")))
ids = [p.split("_")[-1].split(".")[0] for p in refs]
held = [i for k, i in enumerate(ids) if k % 8 == 7]

trainer = Trainer(load_train_config(ckpt))
trainer.load(ckpt)
fn = trainer.eval_fn()

rows = []
for i in held:
    with open(os.path.join(dataset_dir, f"Scene_{i}.json")) as f:
        desc = json.load(f)
    scene, _ = build_scene_from_description(desc, 256, 256)
    sim = Simulation(width=256, height=256, mode=Mode.REFERENCE,
                     rays_per_frame=rays, measurement_interval=0,
                     seed=7777 + int(i))
    sim.set_scene(scene)
    for t in (sim.tracer_a, sim.tracer_b):
        t.forward.analytic_direct = False
        t.forward.jitter_bins = True  # single frame -> single phase anyway
        t.forward.bounce_rays = rays // 4
    sim.frame_limit = 1
    sim.run(max_frames=1)
    noisy = np.asarray(sim.tracer_a.tracer_output)

    ref = read_image_linear(os.path.join(dataset_dir, f"Output_Reference_{i}.exr"))
    s = 0.18 / max(float(ref.mean()), 1e-6)
    ref = ref * s
    noisy = noisy * s
    out = infer_large(fn, noisy.astype(np.float32), rgb=trainer.cfg.rgb)
    peak = max(float(ref.max()), 1e-6)
    psnr = lambda x: 10 * np.log10(peak**2 / max(float(((x - ref) ** 2).mean()), 1e-12))
    rows.append(dict(scene=i, base=psnr(noisy), den=psnr(out)))
    print(f"scene {i}: 1-frame {rays} rays base {rows[-1]['base']:.2f} dB "
          f"denoised {rows[-1]['den']:.2f} dB gain {rows[-1]['den']-rows[-1]['base']:+.2f}",
          flush=True)

base = float(np.mean([r["base"] for r in rows]))
den = float(np.mean([r["den"] for r in rows]))
print(f"MEAN base {base:.2f} dB denoised {den:.2f} dB gain {den-base:+.2f} dB")

if report:
    with open(report, "a") as f:
        f.write(f"\n## Realtime-noise eval (1 frame x {rays} rays, held-out scenes)\n\n")
        f.write(f"Checkpoint `{ckpt}`: mean noisy {base:.2f} dB, denoised {den:.2f} dB, "
                f"**gain {den-base:+.2f} dB** over {len(rows)} scenes.\n")
    print("appended", report)
