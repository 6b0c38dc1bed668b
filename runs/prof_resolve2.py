"""Split rotate_planar_sum's passes at S=640/D=128 (resolve measured
27 ms/frame in runs/bench1080_r2a.log; scan alone ~1.8 ms).

Methodology: block_until_ready does NOT block through the axon tunnel, so
each op is repeated REPS times inside ONE jitted lax.scan with a forced
data dependence (a 1-element carry add into the input), and the run is
timed around a single float() scalar fetch with RTT subtracted. The
1-element dynamic-update dependence is ~free.

Usage: python runs/prof_resolve2.py
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
    from litbox_tpu.ops.rotate import (_quadrant_groups, shear, shear_reduce)
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

    from litbox_tpu.ops.attnscan import attenuation_scan_rows
    channels = attenuation_scan_rows(fields.trans, *src1)

    base = tuple(-i * 2.0 * np.pi / d for i in range(d))
    groups = _quadrant_groups(base)
    base_res = np.asarray(
        [a - round(a / (np.pi / 2)) * (np.pi / 2) for a in base], np.float32)
    residual = jnp.asarray(base_res)
    a_bound = float(np.tan(np.pi / 8)) + 1e-4
    b_bound = float(np.sin(np.pi / 4)) + 1e-4
    c = 3

    def timed(name, fn, x, *args, n=3):
        """Time fn(x, *args) repeated REPS times in one jit via carry-add.
        x and args are ARGUMENTS (closure constants 413 the remote compile)."""

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

    # Baseline: the dependence-add + scalar slice alone.
    timed("dependence overhead", lambda x: x, channels[0])

    def f_scan(trans, c1, c2, c3):
        return jnp.stack(attenuation_scan_rows(trans, c1, c2, c3), 0)

    timed("scan (pallas)      ", f_scan, fields.trans, *src1)

    def f_pre(ch0, ch1, ch2):
        return jnp.concatenate([
            jnp.rot90(ch[a:b], k, axes=(1, 2)) if k else ch[a:b]
            for ch in (ch0, ch1, ch2) for a, b, k in groups], axis=0)

    timed("rot90 concat       ", f_pre, *channels)
    pre = jax.jit(f_pre)(*channels)
    alpha = jnp.tile(-jnp.tan(residual / 2.0), c)
    beta = jnp.tile(jnp.sin(residual), c)

    def f_shear1(pre, alpha):
        return shear(pre, alpha, row_div=1, elem_scale=1, n_texels=s,
                     coef_bound=a_bound)

    timed("shear x            ", f_shear1, pre, alpha)
    flat = jax.jit(f_shear1)(pre, alpha)

    def f_transpose(flat):
        return flat.transpose(0, 2, 1)

    timed("transpose          ", f_transpose, flat)
    t = jax.jit(f_transpose)(flat)

    def f_shear2(t, beta):
        return shear(t, beta, row_div=1, elem_scale=1, n_texels=s,
                     coef_bound=b_bound)

    timed("shear y            ", f_shear2, t, beta)
    t2 = jax.jit(f_shear2)(t, beta)
    timed("transpose back     ", f_transpose, t2)
    flat2 = jax.jit(f_transpose)(t2)

    oy = (s - SIM_H) // 2
    lo = (oy // 64) * 64
    hi = min(-(-(oy + SIM_H) // 64) * 64, s)

    def f_reduce(flat2, alpha):
        return shear_reduce(flat2, alpha, row_div=1, elem_scale=1, n_texels=s,
                            coef_bound=a_bound, row_lo=lo, row_hi=hi, groups=3)

    timed("shear_reduce       ", f_reduce, flat2, alpha)

    def f_resolve(src0c, src1c, src2c, trans, cum, coarse, cos, sin, center,
                  phase):
        f2 = rbt.RotatedFields(cos=cos, sin=sin, trans=trans, cum_log=cum,
                               cum_coarse=coarse, center=center, phase=phase)
        return rbt.resolve_raw(f2, (src0c, src1c, src2c), SIM_H, SIM_W)

    timed("resolve_raw total  ", f_resolve, *src1, fields.trans,
          fields.cum_log, fields.cum_coarse, fields.cos, fields.sin,
          fields.center, fields.phase)


if __name__ == "__main__":
    main()
