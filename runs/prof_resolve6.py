"""Honest fused-vs-quad rotate pricing: force FULL materialization.

prof_groups.py indexed [0,0,0] of the stacked fused output — since
rotate_planar_sum_fused issues one pallas_call PER CHANNEL, XLA DCE'd
channels 1-2 and reported ~1/3 of the true cost (15.5 ms vs the ~46 ms
seen composed). This script sums the whole output (no DCE possible) for
scan, both rotate kernels, and end-to-end resolve_raw, full + 1/4 bins.

Usage: python runs/prof_resolve6.py
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
    from litbox_tpu.ops.rotate import rotate_planar_sum, rotate_planar_sum_fused
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

    # full-materialization scan (sum of all 3 deposit channels)
    timed("scan full  [sum] ", lambda t, a, b, c:
          sum(x.sum() for x in attenuation_scan_rows(t, a, b, c)),
          fields.trans, *src)

    dep = jax.jit(attenuation_scan_rows)(fields.trans, *src)
    base = tuple(-i * 2.0 * np.pi / d for i in range(d))
    max_delta = 2.0 * np.pi / d
    oy = (s - SIM_H) // 2
    lo = (oy // 64) * 64
    hi = min(-(-(oy + SIM_H) // 64) * 64, s)

    timed("rot fused  [sum] ", lambda dd:
          rotate_planar_sum_fused(dd, base, 0.0).sum(), dep)
    timed("rot quad   [sum] ", lambda dd:
          rotate_planar_sum(dd, base, 0.0, max_delta, lo, hi).sum(), dep)

    for k in (4,):
        bins = tuple(range(0, d, k))
        baseg = tuple(-i * 2.0 * np.pi / d for i in bins)
        depg = jax.jit(lambda dd, k=k: tuple(x[::k] for x in dd))(dep)
        timed(f"rot fused 1/{k}[sum]", lambda dd, bg=baseg:
              rotate_planar_sum_fused(dd, bg, 0.0).sum(), depg)
        timed(f"rot quad  1/{k}[sum]", lambda dd, bg=baseg:
              rotate_planar_sum(dd, bg, 0.0, max_delta, lo, hi).sum(), depg)

    # end-to-end resolve_raw, full materialization
    timed("resolve_raw  [sum]", lambda f, sr:
          rbt.resolve_raw(f, sr, SIM_H, SIM_W).sum(), fields, src)
    timed("resolve_raw 1/4[s]", lambda f, sr:
          rbt.resolve_raw(f, sr, SIM_H, SIM_W, group=0, n_groups=4).sum(),
          fields, src)


if __name__ == "__main__":
    main()
