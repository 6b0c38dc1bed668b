"""Train the denoiser on the self-generated dataset (TPU)."""
import glob, os, sys, time
sys.path.insert(0, "/root/repo")
import numpy as np

from litbox_tpu.nn.dataset import DenoiserDataset
from litbox_tpu.nn.train import TrainConfig, Trainer

dataset_dir = sorted(glob.glob("/root/repo/runs/dataset/*"))[-1]
print("dataset:", dataset_dir)

def g(pat):
    return sorted(glob.glob(os.path.join(dataset_dir, pat)))

refs = g("Output_Reference_*.exr")
ids = [p.split("_")[-1].split(".")[0] for p in refs]
def aligned(fmt):
    return [os.path.join(dataset_dir, fmt.format(i)) for i in ids]

# Curriculum: Easy = the long-exposure Input2, Final = the noisier Input1.
stages = []
for name, pat in (("Easy", "Input2_Radiance_{}_{{0}}.exr"), ("Final", "Input1_Radiance_{}_{{0}}.exr")):
    a = [os.path.join(dataset_dir, pat.format("A").format(i)) for i in ids]
    b = [os.path.join(dataset_dir, pat.format("B").format(i)) for i in ids]
    ds = DenoiserDataset(a, b, aligned("Albedo_{0}.png"), aligned("Transmissibility_{0}.exr"),
                         refs, crop_size=192)
    stages.append((name, ds))
print("samples:", len(refs))

minutes = float(sys.argv[1]) if len(sys.argv) > 1 else 30
from litbox_tpu.nn.unet import TransformConfig
cfg = TrainConfig(unet_size=5, initial_features=32, crop_size=192,
                  learn_rate=3e-5, epochs=100000, batch_size=4,
                  checkpoint_interval=300.0,
                  transform=TransformConfig(normalize_input=True))
trainer = Trainer(cfg)
t0 = time.time()
log = []
import litbox_tpu.nn.train as tmod
rng = np.random.default_rng(0)
step = 0
while time.time() - t0 < minutes * 60:
    for name, ds in stages if (time.time()-t0) > minutes*30 else stages[:1]:
        for batch in ds.batches(cfg.batch_size, rng, shuffle=True):
            inp, tgt = trainer.select_random_channel(batch, rng)
            loss = trainer.train_batch(inp, tgt)
            step += 1
            if step % 20 == 0:
                print(f"{time.time()-t0:7.1f}s step {step} [{name}] loss {loss:.5f}", flush=True)
            if time.time() - t0 > minutes * 60:
                break
        if time.time() - t0 > minutes * 60:
            break
trainer.save("/root/repo/runs/denoiser/model.npz", include_optimizer=False)
print("saved /root/repo/runs/denoiser/model.npz after", step, "steps")
