"""Price resolve_raw variants at quarter-1080p: fused whole-image 3-shear
kernel vs per-quadrant rotate_planar_sum, full vs grouped bins.

The r2a/r2b logs suggest the fused kernel (commit 7d8eec9) regressed the
static-phase resolve (27 -> 56 ms at S=640/D=128); this isolates scan,
rotate (both kernels), the group slice, and end-to-end resolve_raw at
groups 1/2/4/8.

Usage: python runs/prof_groups.py [--bins 128]
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
    print(f"S={s} D={d}", flush=True)
    rtt = measure_rtt()
    print(f"rtt {rtt*1000:.1f} ms", flush=True)

    def timed(name, fn, *args, n=3):
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

    # scan alone (full bins)
    timed("scan full        ", lambda t, a, b, c:
          attenuation_scan_rows(t, a, b, c)[0][0, 0, 0], fields.trans, *src)

    dep = jax.jit(attenuation_scan_rows)(fields.trans, *src)
    base = tuple(-i * 2.0 * np.pi / d for i in range(d))
    max_delta = 2.0 * np.pi / d
    oy = (s - SIM_H) // 2
    lo = (oy // 64) * 64
    hi = min(-(-(oy + SIM_H) // 64) * 64, s)

    # rotate kernels alone (full bins)
    timed("rot fused  full  ", lambda dd:
          rotate_planar_sum_fused(dd, base, 0.0)[0, 0, 0], dep)
    timed("rot quad   full  ", lambda dd:
          rotate_planar_sum(dd, base, 0.0, max_delta, lo, hi)[0, 0, 0], dep)

    for k in (2, 4, 8):
        bins = tuple(range(0, d, k))
        baseg = tuple(-i * 2.0 * np.pi / d for i in bins)
        timed(f"slice+scan  1/{k}  ", lambda t, a, b, c, k=k:
              attenuation_scan_rows(t[::k], a[::k], b[::k], c[::k])[0][0, 0, 0],
              fields.trans, *src)
        depg = jax.jit(lambda dd, k=k: tuple(x[::k] for x in dd))(dep)
        timed(f"rot fused   1/{k}  ", lambda dd, bg=baseg:
              rotate_planar_sum_fused(dd, bg, 0.0)[0, 0, 0], depg)
        timed(f"rot quad    1/{k}  ", lambda dd, bg=baseg:
              rotate_planar_sum(dd, bg, 0.0, max_delta, lo, hi)[0, 0, 0], depg)

    # end-to-end resolve_raw as shipped
    timed("resolve_raw full ", lambda f, sr:
          rbt.resolve_raw(f, sr, SIM_H, SIM_W)[0, 0, 0], fields, src)
    for k in (4,):
        timed(f"resolve_raw  1/{k} ", lambda f, sr, k=k:
              rbt.resolve_raw(f, sr, SIM_H, SIM_W, group=0, n_groups=k)[0, 0, 0],
              fields, src)


if __name__ == "__main__":
    main()
