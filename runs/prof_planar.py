"""Stage-price the planar resolve pipeline at S=640, D=128.

Usage: python runs/prof_planar.py [--bins D]
"""
import sys
import time

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np

SIM_W, SIM_H = 480, 272

sys.path.insert(0, "/root/repo/runs")
from bench_1080p import arg, build, measure_rtt

D = arg("--bins", 128)


def main():
    from litbox_tpu.ops.attnscan import attenuation_scan_rows
    from litbox_tpu.ops.rotate import (_quadrant_groups, shear, shear_reduce,
                                       rotate_planar_sum)
    from litbox_tpu.sim import rbt

    scene, gb, brdf, fields = build()
    if D != fields.n_bins:
        fields = rbt.precompute_rotated_fields(gb, n_bins=D)
    rtt = measure_rtt()
    d, s = fields.n_bins, fields.size
    print(f"rtt {rtt*1000:.1f} ms  S={s} D={d}", flush=True)

    rng = np.random.default_rng(0)
    src = tuple(jnp.asarray(rng.uniform(0, 1, (d, s, s)).astype(np.float32))
                for _ in range(3))
    base = tuple(-i * 2.0 * np.pi / d for i in range(d))
    groups = _quadrant_groups(base)
    base_res = np.asarray([a - round(a / (np.pi / 2)) * (np.pi / 2)
                           for a in base], np.float32)
    alpha = jnp.tile(-jnp.tan(jnp.asarray(base_res) / 2.0), 3)
    a_bound = float(np.tan((np.pi / 4 + 2 * np.pi / d) / 2)) + 1e-4
    b_bound = float(np.sin(min(np.pi / 4 + 2 * np.pi / d, np.pi / 2))) + 1e-4
    beta = jnp.tile(jnp.sin(jnp.asarray(base_res)), 3)
    oy = (s - SIM_H) // 2
    lo, hi = (oy // 64) * 64, min(-(-(oy + SIM_H) // 64) * 64, s)

    def timed(name, fn, *args, n=5):
        r = fn(*args)
        jax.block_until_ready(r)
        best = 1e9
        for _ in range(n):
            t0 = time.perf_counter()
            jax.block_until_ready(fn(*args))
            best = min(best, time.perf_counter() - t0 - rtt)
        print(f"{name}: {best*1000:8.2f} ms", flush=True)
        return best

    f_scan = jax.jit(lambda t, a, b, c: attenuation_scan_rows(t, a, b, c))
    dep = f_scan(fields.trans, *src)
    jax.block_until_ready(dep)
    timed("scan planar (full out)", f_scan, fields.trans, *src)

    @jax.jit
    def f_quad(chs):
        return jnp.concatenate([
            jnp.rot90(ch[a:b], k, axes=(1, 2)) if k else ch[a:b]
            for ch in chs for a, b, k in groups], axis=0)

    pre = f_quad(dep)
    jax.block_until_ready(pre)
    timed("quadrant rot90 planar ", f_quad, dep)

    @jax.jit
    def f_xshear(pre):
        return shear(pre, alpha, row_div=1, elem_scale=1, n_texels=s,
                     coef_bound=a_bound)

    flat = f_xshear(pre)
    jax.block_until_ready(flat)
    timed("x-shear planar        ", f_xshear, pre)

    @jax.jit
    def f_t(flat):
        return flat.transpose(0, 2, 1)

    t_img = f_t(flat)
    jax.block_until_ready(t_img)
    timed("transpose planar      ", f_t, flat)

    @jax.jit
    def f_yshear(t_img):
        return shear(t_img, beta, row_div=1, elem_scale=1, n_texels=s,
                     coef_bound=b_bound)

    timed("y-shear planar        ", f_yshear, t_img)

    @jax.jit
    def f_reduce(flat):
        return shear_reduce(flat, alpha, row_div=1, elem_scale=1, n_texels=s,
                            coef_bound=a_bound, row_lo=lo, row_hi=hi, groups=3)

    timed("reduce planar         ", f_reduce, flat)

    @jax.jit
    def f_all(t, s0, s1, s2):
        dep = attenuation_scan_rows(t, s0, s1, s2)
        out = rotate_planar_sum(dep, base, 0.0, 2 * np.pi / d, lo, hi)
        return out[:, oy - lo:oy - lo + SIM_H, :SIM_W]

    timed("scan+planar rotate sum", f_all, fields.trans, *src)

    @jax.jit
    def f_resolve(fields, src):
        return rbt.resolve_raw(fields, src, SIM_H, SIM_W)

    timed("resolve_raw (full out)", f_resolve, fields, src)


if __name__ == "__main__":
    main()
