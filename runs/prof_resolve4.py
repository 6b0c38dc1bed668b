"""Bisect the resolve_raw composition blowup (scan 3.2 + fused rotate 17.7
chained measured 55 ms in prof_resolve3).

Usage: python runs/prof_resolve4.py
"""
import sys
import time

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo/runs")
from bench_1080p import build, measure_rtt

SIM_W, SIM_H = 480, 272
REPS = 10


def main():
    from litbox_tpu.ops.attnscan import attenuation_scan_rows
    from litbox_tpu.ops.rotate import rotate_planar_sum_fused
    from litbox_tpu.sim import rbt

    scene, gb, brdf, fields = build()
    rtt = measure_rtt()
    s, d = fields.size, fields.n_bins
    print(f"rtt {rtt*1000:.1f} ms  S={s} D={d}", flush=True)

    key = jax.random.key(0)
    src0 = rbt.zero_sources(fields)
    src1, _ = rbt.rbt_trace_frame(
        fields, src0, gb, scene.lights, scene.field_textures, brdf, key,
        262_144, jnp.int32(-1), max_bounces=2, bounce_photons=65_536,
        mc_direct=True, analytic_direct=False, enable_brdf=False,
        light_kinds=(1,), hist_direct=True)
    channels = attenuation_scan_rows(fields.trans, *src1)

    def timed(name, fn, x, *args, n=3):
        @jax.jit
        def reps(x, *args):
            def body(carry, i):
                xi = x.at[(0,) * x.ndim].add(carry * 1e-30)
                y = fn(xi, *args)
                return y.reshape(-1)[0], 0.0
            out, _ = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(REPS))
            return out

        float(reps(x, *args))
        float(reps(x, *args))
        best = 1e9
        for _ in range(n):
            t0 = time.perf_counter()
            float(reps(x, *args))
            best = min(best, time.perf_counter() - t0 - rtt)
        print(f"{name}: {best / REPS * 1000:8.2f} ms", flush=True)

    base = tuple(-i * 2.0 * np.pi / d for i in range(d))

    # scan alone
    def f_scan(trans, c0, c1, c2):
        return jnp.stack(attenuation_scan_rows(trans, c0, c1, c2), 0)

    timed("scan alone            ", f_scan, fields.trans, *src1)

    # scan -> fused rotate chained, no crop
    def f_chain(trans, c0, c1, c2):
        dep = attenuation_scan_rows(trans, c0, c1, c2)
        return rotate_planar_sum_fused(dep, base, 0.0)

    timed("scan + fused          ", f_chain, fields.trans, *src1)

    # with optimization barrier between
    def f_chain_bar(trans, c0, c1, c2):
        dep = attenuation_scan_rows(trans, c0, c1, c2)
        dep = jax.lax.optimization_barrier(dep)
        return rotate_planar_sum_fused(dep, base, 0.0)

    timed("scan + barrier + fused", f_chain_bar, fields.trans, *src1)

    # fused + crop + moveaxis (the resolve epilogue), no scan
    def f_rot_crop(c0, c1, c2):
        out = rotate_planar_sum_fused((c0, c1, c2), base, 0.0)
        oy = (s - SIM_H) // 2
        ox = (s - SIM_W) // 2
        return jnp.moveaxis(out[:, oy:oy + SIM_H, ox:ox + SIM_W], 0, -1)

    timed("fused + crop          ", f_rot_crop, *channels)


if __name__ == "__main__":
    main()
