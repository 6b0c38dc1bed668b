"""Isolate the UNet's conv-lowering overhead: reflect-pad vs zero-pad vs
native SAME convs, at unet4/f16 bf16, 4 unrolled reps.

Each Conv3x3 currently does jnp.pad(mode=...) + VALID conv; if the separate
pad op breaks XLA's conv fusion, padding="SAME" (zero) convs should be much
faster — and the realtime net can be trained with zero padding (the
reference's own conv_out already uses default zero padding).

Usage: python runs/prof_display4.py
"""
import sys
import time

sys.path.insert(0, "/root/repo")
import flax.linen as nn
import jax
import jax.numpy as jnp

SIM_W, SIM_H = 480, 272
OUT_W, OUT_H = 1920, 1088
REPS = 4

sys.path.insert(0, "/root/repo/runs")
from bench_1080p import measure_rtt


def main():
    import litbox_tpu.nn.unet as unet_mod
    from litbox_tpu.engine.pipeline import denoise_hdr
    from litbox_tpu.nn.unet import LitboxDenoiserNet, TransformConfig

    rtt = measure_rtt()
    print(f"rtt {rtt*1000:.1f} ms", flush=True)
    hdr = jax.random.uniform(jax.random.key(0), (SIM_H, SIM_W, 3), jnp.float32)
    tcfg = TransformConfig(normalize_input=True)

    def timed(name, fn, *args, n=4):
        f = jax.jit(fn)
        float(f(*args))
        float(f(*args))
        best = 1e9
        for _ in range(n):
            t0 = time.perf_counter()
            float(f(*args))
            best = min(best, time.perf_counter() - t0 - rtt)
        print(f"{name}: {best*1000/REPS:8.2f} ms/frame", flush=True)
        return best

    class Conv3x3Same(nn.Module):
        features: int
        padding_mode: str = "reflect"

        @nn.compact
        def __call__(self, x):
            return nn.Conv(self.features, (3, 3), padding="SAME")(x)

    def run(label, padding_mode, patch_same=False):
        orig = unet_mod.Conv3x3
        if patch_same:
            unet_mod.Conv3x3 = Conv3x3Same
        try:
            model = LitboxDenoiserNet(unet_size=4, initial_features=16,
                                      global_residual=True,
                                      padding_mode=padding_mode)
            variables = model.init(jax.random.key(1),
                                   jnp.zeros((1, 64, 64, 1)), train=False)
        finally:
            unet_mod.Conv3x3 = orig
        vb = jax.tree.map(
            lambda x: x.astype(jnp.bfloat16)
            if isinstance(x, jnp.ndarray) and x.dtype == jnp.float32 else x,
            variables)

        def f(variables, hdr):
            acc = jnp.float32(0.0)
            x = hdr
            for _ in range(REPS):
                if patch_same:
                    unet_mod.Conv3x3 = Conv3x3Same
                try:
                    den = denoise_hdr(model, variables,
                                      x.astype(jnp.bfloat16),
                                      tcfg).astype(jnp.float32)
                finally:
                    unet_mod.Conv3x3 = orig
                acc = acc + den.sum()
                x = hdr + den * 1e-30
            return acc

        timed(label, f, vb, hdr)

    run("unet4/f16 reflect-pad ", "reflect")
    run("unet4/f16 zero-pad    ", "zeros")
    run("unet4/f16 SAME conv   ", "zeros", patch_same=True)


if __name__ == "__main__":
    main()
