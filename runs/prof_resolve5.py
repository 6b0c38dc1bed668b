"""Bisect the resolve_raw overhead: components sum to ~16 ms but the
shipped jit measures ~54 ms at S=640/D=128. Times the inlined fast-path
body with flat args vs the fields-pytree arg vs the shipped function.

Usage: python runs/prof_resolve5.py
"""
import sys
import time

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo/runs")
from bench_1080p import SIM_H, SIM_W, build, measure_rtt


def main():
    from litbox_tpu.ops.attnscan import attenuation_scan_rows
    from litbox_tpu.ops.rotate import rotate_planar_sum_fused
    from litbox_tpu.sim import rbt

    scene, gb, brdf, fields = build()
    src = rbt.zero_sources(fields)
    src, _ = jax.jit(lambda *a: rbt.rbt_trace_frame(*a, 65536, jnp.int32(-1),
                                                    max_bounces=2,
                                                    bounce_photons=16384,
                                                    mc_direct=True,
                                                    analytic_direct=False,
                                                    light_kinds=(1,),
                                                    hist_direct=True))(
        fields, src, gb, scene.lights, scene.field_textures, brdf,
        jax.random.key(0))
    s, d = fields.size, fields.n_bins
    rtt = measure_rtt()
    print(f"S={s} D={d} rtt {rtt*1000:.1f} ms", flush=True)

    def timed(name, f, *args, n=3):
        float(f(*args))
        float(f(*args))
        best = 1e9
        for _ in range(n):
            t0 = time.perf_counter()
            float(f(*args))
            best = min(best, time.perf_counter() - t0 - rtt)
        print(f"{name}: {best*1000:8.2f} ms", flush=True)

    base = tuple(-i * 2.0 * np.pi / d for i in range(d))
    oy = (s - SIM_H) // 2
    ox = (s - SIM_W) // 2

    def body(trans, src):
        dep = attenuation_scan_rows(trans, *src)
        out = rotate_planar_sum_fused(dep, base, 0.0)
        out = out[:, oy:oy + SIM_H, ox:ox + SIM_W]
        return jnp.moveaxis(out, 0, -1)

    timed("inline flat      ", jax.jit(lambda t, sr: body(t, sr)[0, 0, 0]),
          fields.trans, src)
    timed("inline fieldsarg ", jax.jit(lambda f, sr: body(f.trans, sr)[0, 0, 0]),
          fields, src)
    timed("shipped          ", jax.jit(
        lambda f, sr: rbt.resolve_raw(f, sr, SIM_H, SIM_W)[0, 0, 0]),
        fields, src)
    # stage split inside one jit: scan result summed (forces scan only)
    timed("scan only (jit)  ", jax.jit(
        lambda t, sr: attenuation_scan_rows(t, *sr)[0][0, 0, 0]),
        fields.trans, src)


if __name__ == "__main__":
    main()
