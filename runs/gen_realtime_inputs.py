"""Render realtime-regime noisy inputs for an existing dataset.

The denoiser's production use is cleaning REALTIME frames: one frame, low
rays, a single jitter phase (AIAccelerator.cs:57-84 runs the model every
step). The dataset's accumulated profiles measure 38-43 dB against the
references — far cleaner than a realtime frame — so a model trained only on
them regresses in production (round-1 HELDOUT_EVAL.md). This script renders
1-frame inputs for every scene of an existing dataset (whose converged
references already exist) and writes them as

    InputRT0_Radiance_{A,B}_#####.exr   (1 frame x 8192 rays)
    InputRT1_Radiance_{A,B}_#####.exr   (1 frame x 32768 rays)

matching the engine configuration of runs/eval_realtime_noise.py
(MC direct, single phase, Russian-roulette bounce cull).

Usage: python runs/gen_realtime_inputs.py [--dataset DIR] [--tiers 8192,32768]
"""
import glob
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np

if "--dataset" in sys.argv:
    dataset_dir = sys.argv[sys.argv.index("--dataset") + 1]
else:
    dataset_dir = sorted(glob.glob("/root/repo/runs/dataset_r2/*"))[-1]
tiers = [int(x) for x in (
    sys.argv[sys.argv.index("--tiers") + 1] if "--tiers" in sys.argv
    else "8192,32768").split(",")]

from litbox_tpu.data.factory import build_scene_from_description
from litbox_tpu.engine import Mode, Simulation
from litbox_tpu.io.exr import write_exr_rgb

refs = sorted(glob.glob(os.path.join(dataset_dir, "Output_Reference_*.exr")))
ids = [p.split("_")[-1].split(".")[0] for p in refs]
print(f"dataset {dataset_dir}: {len(ids)} scenes, tiers {tiers}", flush=True)

t0 = time.time()
for n, i in enumerate(ids):
    done = all(
        os.path.exists(os.path.join(
            dataset_dir, f"InputRT{k}_Radiance_{t}_{i}.exr"))
        for k in range(len(tiers)) for t in "AB")
    if done:  # resume-by-existence, like the factory
        continue
    with open(os.path.join(dataset_dir, f"Scene_{i}.json")) as f:
        desc = json.load(f)
    scene, _ = build_scene_from_description(desc, 256, 256)
    for k, rays in enumerate(tiers):
        sim = Simulation(width=256, height=256, mode=Mode.REFERENCE,
                         rays_per_frame=rays, measurement_interval=0,
                         seed=100_000 * (k + 1) + int(i))
        sim.set_scene(scene)
        sim._validate_tracers()  # tracers build lazily; configure pre-step
        for t in (sim.tracer_a, sim.tracer_b):
            t.forward.analytic_direct = False
            t.forward.jitter_bins = True  # single frame -> single phase
            t.forward.bounce_rays = rays // 4
        sim.frame_limit = 1
        sim.run(max_frames=1)
        for tag, tracer in (("A", sim.tracer_a), ("B", sim.tracer_b)):
            out = np.asarray(tracer.tracer_output, dtype=np.float32)
            write_exr_rgb(os.path.join(
                dataset_dir, f"InputRT{k}_Radiance_{tag}_{i}.exr"), out)
    if n % 10 == 0:
        print(f"{time.time()-t0:7.1f}s scene {i} ({n+1}/{len(ids)})", flush=True)
print(f"done in {time.time()-t0:.0f}s", flush=True)
