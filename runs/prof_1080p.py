"""Stage-level profiling for the 1080p pipeline: bisect the fused-program
cost and price display components (UNet size/dtype, upsample, tonemap).

Usage: python runs/prof_1080p.py [checkpoint.npz]
"""
import sys
import time

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np

SIM_W, SIM_H = 480, 272
OUT_W, OUT_H = 1920, 1088
PHOTONS = 262_144
BOUNCE = 65_536

sys.path.insert(0, "/root/repo/runs")
from bench_1080p import build, measure_rtt


def main():
    from litbox_tpu.nn.train import TrainConfig, Trainer
    from litbox_tpu.nn.unet import TransformConfig
    from litbox_tpu.engine.pipeline import denoise_hdr
    from litbox_tpu.post.tonemap import UchimuraShape, tonemap_uchimura
    from litbox_tpu.sim import rbt
    from litbox_tpu.sim.oracle import to_hdr

    scene, gb, brdf, fields = build()
    rtt = measure_rtt()
    print(f"rtt {rtt*1000:.1f} ms", flush=True)
    src0 = rbt.zero_sources(fields)
    key = jax.random.key(0)
    lights, ftex = scene.lights, scene.field_textures

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

    def trace(fields, src, key):
        src, _ = rbt.rbt_trace_frame(
            fields, src, gb, lights, ftex, brdf, key,
            PHOTONS, jnp.int32(-1), max_bounces=2, bounce_photons=BOUNCE,
            mc_direct=True, analytic_direct=False, enable_brdf=False,
            light_kinds=(1,), hist_direct=True)
        return src

    # --- bisect the fused blowup ---
    @jax.jit
    def f_trace(fields, src, key):
        return trace(fields, src, key)[0][0, 0, 0]

    @jax.jit
    def f_trace_resolve(fields, src, key):
        src = trace(fields, src, key)
        return rbt.resolve_raw(fields, src, SIM_H, SIM_W)[0, 0, 0]

    @jax.jit
    def f_trace_resolve_hdr(fields, src, key):
        src = trace(fields, src, key)
        raw = rbt.resolve_raw(fields, src, SIM_H, SIM_W)
        return to_hdr(raw, jnp.float32(1.0), gb, True)[0, 0, 0]

    timed("trace only           ", f_trace, fields, src0, key)
    timed("trace+resolve        ", f_trace_resolve, fields, src0, key)
    timed("trace+resolve+hdr    ", f_trace_resolve_hdr, fields, src0, key)

    raw1 = jax.jit(lambda f, s, k: rbt.resolve_raw(
        f, trace(f, s, k), SIM_H, SIM_W))(fields, src0, key)
    hdr1 = jax.jit(lambda r: to_hdr(r, jnp.float32(1.0), gb, True))(raw1)

    # --- display components ---
    @jax.jit
    def f_upsample_tonemap(hdr):
        up = jax.image.resize(hdr, (OUT_H, OUT_W, 3), "bilinear")
        return tonemap_uchimura(up * 0.5, UchimuraShape())[0, 0, 0]

    timed("upsample+tonemap     ", f_upsample_tonemap, hdr1)

    for unet, feats in ((5, 32), (4, 16)):
        for dtype in ("f32", "bf16"):
            cfg = TrainConfig(unet_size=unet, initial_features=feats,
                              transform=TransformConfig(normalize_input=True))
            tr = Trainer(cfg)
            variables = {"params": tr.params, "batch_stats": tr.batch_stats}
            if dtype == "bf16":
                variables = jax.tree.map(
                    lambda x: x.astype(jnp.bfloat16)
                    if isinstance(x, jnp.ndarray) and x.dtype == jnp.float32
                    else x, variables)

            def f_unet(hdr, mv, _m=tr.model, _t=cfg.transform, _d=dtype):
                x = hdr.astype(jnp.bfloat16) if _d == "bf16" else hdr
                return denoise_hdr(_m, mv, x, _t).astype(jnp.float32)[0, 0, 0]

            timed(f"unet{unet}/{feats:2d} {dtype:4s}        ",
                  jax.jit(f_unet), hdr1, variables)
            del variables, tr

    # --- fused with the small net (the likely production config) ---
    cfg = TrainConfig(unet_size=4, initial_features=16,
                      transform=TransformConfig(normalize_input=True))
    tr = Trainer(cfg)
    variables = {"params": tr.params, "batch_stats": tr.batch_stats}
    variables = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16)
        if isinstance(x, jnp.ndarray) and x.dtype == jnp.float32 else x,
        variables)

    @jax.jit
    def f_fused_small(fields, src, key, mv):
        src = trace(fields, src, key)
        raw = rbt.resolve_raw(fields, src, SIM_H, SIM_W)
        hdr = to_hdr(raw, jnp.float32(1.0), gb, True)
        den = denoise_hdr(tr.model, mv, hdr.astype(jnp.bfloat16),
                          cfg.transform).astype(jnp.float32)
        up = jax.image.resize(den, (OUT_H, OUT_W, 3), "bilinear")
        return tonemap_uchimura(up * 0.5, UchimuraShape())[0, 0, 0]

    timed("FUSED unet4/16 bf16  ", f_fused_small, fields, src0, key, variables)


if __name__ == "__main__":
    main()
