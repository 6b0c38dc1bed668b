"""Display-stage config sweep at quarter-1080p, FULL materialization.

prof_display.py timed `denoise_hdr(...)[0,0,0]` — single-element indexing
lets XLA DCE tails of the graph; this sweep sums the final tonemapped
1920x1088 frame so every stage is priced. Sweeps UNet size/features with
bf16 params+activations (the realtime display candidates) plus the
upsample+tonemap floor and the full display() of bench_1080p.

Usage: python runs/prof_display2.py
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

    def timed(name, fn, *args, n=4):
        f = jax.jit(fn)
        float(f(*args))
        float(f(*args))
        best = 1e9
        for _ in range(n):
            t0 = time.perf_counter()
            float(f(*args))
            best = min(best, time.perf_counter() - t0 - rtt)
        print(f"{name}: {best*1000:8.2f} ms", flush=True)
        return best

    def up_tone(x):
        up = jax.image.resize(x, (OUT_H, OUT_W, 3), "bilinear")
        return tonemap_uchimura(up * 0.5, UchimuraShape())

    timed("upsample+tonemap [sum]   ", lambda x: up_tone(x).sum(), hdr)

    for unet, feats, res in ((4, 16, True), (4, 8, True), (3, 16, True),
                             (3, 8, True), (2, 16, True), (5, 32, True)):
        model = LitboxDenoiserNet(unet_size=unet, initial_features=feats,
                                  global_residual=res)
        variables = model.init(jax.random.key(1),
                               jnp.zeros((1, 64, 64, 1)), train=False)
        vb = jax.tree.map(
            lambda x: x.astype(jnp.bfloat16)
            if isinstance(x, jnp.ndarray) and x.dtype == jnp.float32 else x,
            variables)

        def f_display(variables, hdr):
            den = denoise_hdr(model, variables, hdr.astype(jnp.bfloat16),
                              tcfg).astype(jnp.float32)
            return up_tone(den).sum()

        timed(f"display unet{unet}/f{feats:<2} bf16 ", f_display, vb, hdr)


if __name__ == "__main__":
    main()
