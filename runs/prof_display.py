"""Price the display stage's parts at quarter-1080p (480x272 -> 1920x1088).

display = to_hdr -> UNet denoise (channels-as-batch) -> 4x bilinear
upsample -> Uchimura tonemap.  Round-2 measurement: 35.7 ms/frame f32 —
this script splits it and prices the levers (bf16 params, small realtime
net unet4/feats16, upsample+tonemap alone).

Usage: python runs/prof_display.py
"""
import sys
import time

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp

SIM_W, SIM_H = 480, 272
OUT_W, OUT_H = 1920, 1088

sys.path.insert(0, "/root/repo/runs")
from bench_1080p import measure_rtt


def main():
    from litbox_tpu.engine.pipeline import denoise_hdr
    from litbox_tpu.nn.unet import LitboxDenoiserNet, TransformConfig
    from litbox_tpu.post.tonemap import UchimuraShape, tonemap_uchimura

    rtt = measure_rtt()
    print(f"rtt {rtt*1000:.1f} ms", flush=True)
    key = jax.random.key(0)
    hdr = jax.random.uniform(key, (SIM_H, SIM_W, 3), jnp.float32)
    tcfg = TransformConfig(normalize_input=True)

    def timed(name, fn, *args, n=3):
        float(fn(*args))
        float(fn(*args))
        best = 1e9
        for _ in range(n):
            t0 = time.perf_counter()
            float(fn(*args))
            best = min(best, time.perf_counter() - t0 - rtt)
        print(f"{name}: {best*1000:8.2f} ms", flush=True)
        return best

    @jax.jit
    def f_upsample_tone(x):
        up = jax.image.resize(x, (OUT_H, OUT_W, 3), "bilinear")
        return tonemap_uchimura(up * 0.5, UchimuraShape())[0, 0, 0]

    timed("upsample+tonemap       ", f_upsample_tone, hdr)

    for label, unet, feats in (("unet5/f32 params f32", 5, 32),
                               ("unet4/f16 params f32", 4, 16)):
        model = LitboxDenoiserNet(unet_size=unet, initial_features=feats)
        variables = model.init(jax.random.key(1),
                               jnp.zeros((1, 64, 64, 1)), train=False)

        @jax.jit
        def f_unet(variables, hdr):
            return denoise_hdr(model, variables, hdr, tcfg)[0, 0, 0]

        timed(f"{label}  ", f_unet, variables, hdr)

        vb = jax.tree.map(
            lambda x: x.astype(jnp.bfloat16)
            if isinstance(x, jnp.ndarray) and x.dtype == jnp.float32 else x,
            variables)

        @jax.jit
        def f_unet_bf16(variables, hdr):
            out = denoise_hdr(model, variables, hdr.astype(jnp.bfloat16), tcfg)
            return out.astype(jnp.float32)[0, 0, 0]

        timed(f"{label.split('/')[0]}/bf16 in+params  ", f_unet_bf16, vb, hdr)


if __name__ == "__main__":
    main()
