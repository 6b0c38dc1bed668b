"""Price the RGB realtime display net (out_channels=3, zero pad) vs the
mono channels-as-batch variant at quarter-1080p, 4 unrolled reps, bf16.

Usage: python runs/prof_display5.py
"""
import sys
import time

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp

SIM_W, SIM_H = 480, 272
OUT_W, OUT_H = 1920, 1088
REPS = 4

sys.path.insert(0, "/root/repo/runs")
from bench_1080p import measure_rtt


def main():
    from litbox_tpu.engine.pipeline import denoise_hdr
    from litbox_tpu.nn.unet import LitboxDenoiserNet, TransformConfig
    from litbox_tpu.post.tonemap import UchimuraShape, tonemap_uchimura

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

    def up_tone(x):
        up = jax.image.resize(x, (OUT_H, OUT_W, 3), "bilinear")
        return tonemap_uchimura(up * 0.5, UchimuraShape())

    for label, unet, feats, rgb, pad in (
            ("rgb  unet4/f16 zeros", 4, 16, True, "zeros"),
            ("rgb  unet4/f8  zeros", 4, 8, True, "zeros"),
            ("rgb  unet5/f32 zeros", 5, 32, True, "zeros"),
            ("mono unet4/f16 zeros", 4, 16, False, "zeros")):
        model = LitboxDenoiserNet(unet_size=unet, initial_features=feats,
                                  global_residual=True, padding_mode=pad,
                                  out_channels=3 if rgb else 1)
        variables = model.init(jax.random.key(1),
                               jnp.zeros((1, 64, 64, 3 if rgb else 1)),
                               train=False)
        vb = jax.tree.map(
            lambda x: x.astype(jnp.bfloat16)
            if isinstance(x, jnp.ndarray) and x.dtype == jnp.float32 else x,
            variables)

        def f_display(variables, hdr):
            acc = jnp.float32(0.0)
            x = hdr
            for _ in range(REPS):
                den = denoise_hdr(model, variables, x.astype(jnp.bfloat16),
                                  tcfg).astype(jnp.float32)
                out = up_tone(den)
                acc = acc + out.sum()
                x = hdr + den * 1e-30
            return acc

        timed(f"display {label}", f_display, vb, hdr)


if __name__ == "__main__":
    main()
