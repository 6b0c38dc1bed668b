"""Time the FUSED rotate-and-sum resolve at S=640/D=128 on chip.

Usage: python runs/prof_resolve3.py [--bins D]
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


def arg(flag, default, cast=int):
    return cast(sys.argv[sys.argv.index(flag) + 1]) if flag in sys.argv else default


def main():
    from litbox_tpu.ops.attnscan import attenuation_scan_rows
    from litbox_tpu.ops.rotate import rotate_planar_sum_fused
    from litbox_tpu.sim import rbt

    n_bins = arg("--bins", 128)
    scene, gb, brdf, fields = build()
    if n_bins != fields.n_bins:
        fields = rbt.precompute_rotated_fields(gb, n_bins=n_bins)
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

    def f_fused(c0, c1, c2):
        return rotate_planar_sum_fused((c0, c1, c2), base, 0.0)

    timed("rotate fused (static)   ", f_fused, *channels)

    def f_fused_traced(c0, c1, c2, delta):
        return rotate_planar_sum_fused((c0, c1, c2), base, delta)

    timed("rotate fused (traced d) ", f_fused_traced, *channels,
          jnp.float32(-0.01))

    def f_resolve(src0c, src1c, src2c, trans, cum, coarse, cos, sin, center,
                  phase):
        f2 = rbt.RotatedFields(cos=cos, sin=sin, trans=trans, cum_log=cum,
                               cum_coarse=coarse, center=center, phase=phase)
        return rbt.resolve_raw(f2, (src0c, src1c, src2c), SIM_H, SIM_W)

    timed("resolve_raw total       ", f_resolve, *src1, fields.trans,
          fields.cum_log, fields.cum_coarse, fields.cos, fields.sin,
          fields.center, fields.phase)


if __name__ == "__main__":
    main()
