"""Round-2 denoiser dataset: MC-direct (genuinely noisy) inputs + jittered
spoke-free converged references. Usage: python gen_dataset_r2.py [n] [--new]"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")
from litbox_tpu.core.types import SimulationProfile
from litbox_tpu.data import TrainingFactory

OUT = "/root/repo/runs/dataset_r2"
os.makedirs(OUT, exist_ok=True)
resume = "--new" not in sys.argv and any(
    os.path.isdir(os.path.join(OUT, d)) for d in os.listdir(OUT))

factory = TrainingFactory(
    output_folder=OUT,
    continue_previous_session=resume,
    samples_to_generate=int(sys.argv[1]) if len(sys.argv) > 1 else 160,
    width=256, height=256,
    input_profiles=(
        SimulationProfile(5, 8192, 0.1, 4),
        SimulationProfile(1, 65536, 0.1, 4),
        SimulationProfile(1, 262144, 0.1, 4),
    ),
    convergence_profile=SimulationProfile(-1, 262144, 0.01, 4),
    convergence_threshold=6e-4,
    max_convergence_frames=250,
    seed=1042,
    mc_direct_inputs=True,
    jitter_bins=True,
)
t0 = time.time()
done = factory.generate(log=lambda m: print(f"[{time.time()-t0:7.1f}s] {m}", flush=True))
print("DONE", len(done), "scenes in", factory.dataset_path)
