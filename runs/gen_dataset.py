"""Generate a denoiser training dataset with the RBT engine on the TPU."""
import sys, time
sys.path.insert(0, "/root/repo")
from litbox_tpu.core.types import SimulationProfile
from litbox_tpu.data import TrainingFactory

factory = TrainingFactory(
    output_folder="/root/repo/runs/dataset",
    continue_previous_session=True,
    samples_to_generate=int(sys.argv[1]) if len(sys.argv) > 1 else 32,
    width=256, height=256,
    input_profiles=(
        SimulationProfile(5, 8192, 0.1, 4),
        SimulationProfile(1, 65536, 0.1, 4),
        SimulationProfile(1, 262144, 0.1, 4),
    ),
    convergence_profile=SimulationProfile(-1, 262144, 0.01, 4),
    convergence_threshold=6e-4,
    max_convergence_frames=250,
    seed=42,
)
t0 = time.time()
done = factory.generate(log=lambda m: print(f"[{time.time()-t0:7.1f}s] {m}", flush=True))
print("DONE", len(done), "scenes in", factory.dataset_path)
