"""Profile resolve_raw's parts at 1080p quarter-res (S=640, D=128).

Round 1 measured "resolve 13.7 ms/frame" from a scan whose body resolved
the SAME sources every iteration — XLA hoisted the loop-invariant resolve
and the number was amortized 5x. Single-shot resolve is what a display
frame pays; this script prices it and its two stages honestly.

Usage: python runs/prof_resolve.py
"""
import sys
import time

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np

SIM_W, SIM_H = 480, 272

sys.path.insert(0, "/root/repo/runs")
from bench_1080p import build, measure_rtt


def main():
    from litbox_tpu.ops.rotate import rotate_bins_uniform
    from litbox_tpu.sim import rbt

    scene, gb, brdf, fields = build()
    rtt = measure_rtt()
    print(f"rtt {rtt*1000:.1f} ms  S={fields.size} D={fields.n_bins}", flush=True)

    key = jax.random.key(0)
    src0 = rbt.zero_sources(fields)
    src1, _ = rbt.rbt_trace_frame(
        fields, src0, gb, scene.lights, scene.field_textures, brdf, key,
        262_144, jnp.int32(-1), max_bounces=2, bounce_photons=65_536,
        mc_direct=True, analytic_direct=False, enable_brdf=False,
        light_kinds=(1,), hist_direct=True)

    def timed(name, fn, *args, n=3):
        r = fn(*args)
        jax.block_until_ready(r)
        best = 1e9
        for _ in range(n):
            t0 = time.perf_counter()
            jax.block_until_ready(fn(*args))
            best = min(best, time.perf_counter() - t0 - rtt)
        print(f"{name}: {best*1000:8.2f} ms", flush=True)
        return best

    @jax.jit
    def f_scan(fields, src):
        return rbt.attenuation_scan(fields, src)[0, 0, 0, 0]

    @jax.jit
    def f_scan_full(fields, src):
        return rbt.attenuation_scan(fields, src)

    @jax.jit
    def f_resolve(fields, src):
        return rbt.resolve_raw(fields, src, SIM_H, SIM_W)[0, 0, 0]

    timed("attenuation_scan (scalar out)", f_scan, fields, src1)
    dep = f_scan_full(fields, src1)
    jax.block_until_ready(dep)

    d = fields.n_bins
    angles = tuple(-i * 2.0 * np.pi / d for i in range(d))

    @jax.jit
    def f_rot(dep):
        return rotate_bins_uniform(dep, angles).sum(0)[0, 0, 0]

    timed("rotate_back (pallas shears) ", f_rot, dep)

    # NOTE bf16 deposits are not an option: Mosaic's tpu.dynamic_rotate is
    # 32-bit only ("Rotate with non-32-bit data" compile error).

    @jax.jit
    def f_scan_rot(fields, src):
        dep = rbt.attenuation_scan(fields, src)
        return rotate_bins_uniform(dep, angles).sum(0)[0, 0, 0]

    timed("scan+rotate (no crop)       ", f_scan_rot, fields, src1)

    @jax.jit
    def f_rotate_back(fields, dep):
        return rbt.rotate_back(fields, dep, SIM_H, SIM_W)[0, 0, 0]

    timed("rotate_back (full fn)       ", f_rotate_back, fields, dep)
    timed("resolve_raw single-shot     ", f_resolve, fields, src1)

    # Smaller bin count: the realtime lever.
    for nb in (64, 32):
        f2 = rbt.precompute_rotated_fields(gb, n_bins=nb)
        s2 = rbt.zero_sources(f2)
        s2, _ = rbt.rbt_trace_frame(
            f2, s2, gb, scene.lights, scene.field_textures, brdf, key,
            262_144, jnp.int32(-1), max_bounces=2, bounce_photons=65_536,
            mc_direct=True, analytic_direct=False, enable_brdf=False,
            light_kinds=(1,), hist_direct=True)
        timed(f"resolve_raw D={nb:3d}          ", f_resolve, f2, s2)


if __name__ == "__main__":
    main()
