"""Price the rotate-back pipeline's components at S=640/D=128.

rotate_bins_uniform = quadrant pre-rotate + x-shear + transpose + y-shear +
transpose + (fused reduce) x-shear. This script times each stage alone on
materialized inputs so the 28 ms whole (runs/prof_resolve.py) can be
attributed and attacked.

Usage: python runs/prof_rotate.py
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
    from litbox_tpu.ops.rotate import (ALPHA_BOUND, BETA_BOUND, shear,
                                       shear_reduce)
    from litbox_tpu.ops import rotate as R

    scene, gb, brdf, fields = build()
    rtt = measure_rtt()
    d, s = fields.n_bins, fields.size
    c = 3
    print(f"rtt {rtt*1000:.1f} ms  S={s} D={d}", flush=True)

    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(0, 1, (d, s, s, c)).astype(np.float32))
    flat = img.reshape(d, s, s * c)
    residual = -(np.arange(d) * 2 * np.pi / d) % (np.pi / 2) - np.pi / 4
    alpha = jnp.asarray(-np.tan(residual / 2.0), jnp.float32)
    beta = jnp.asarray(np.sin(residual), jnp.float32)

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
    def f_xshear(flat, alpha):
        return shear(flat, alpha, row_div=1, elem_scale=c, n_texels=s,
                     coef_bound=ALPHA_BOUND)

    @jax.jit
    def f_transpose(flat):
        return flat.reshape(d, s, s, c).transpose(0, 2, 3, 1).reshape(d, s * c, s)

    t_img = f_transpose(flat)
    jax.block_until_ready(t_img)

    @jax.jit
    def f_yshear(t_img, beta):
        return shear(t_img, beta, row_div=c, elem_scale=1, n_texels=s,
                     coef_bound=BETA_BOUND)

    @jax.jit
    def f_transpose_back(t_img):
        return t_img.reshape(d, s, c, s).transpose(0, 3, 1, 2).reshape(d, s, s * c)

    oy = (s - SIM_H) // 2
    lo, hi = (oy // 64) * 64, min(-(-(oy + SIM_H) // 64) * 64, s)

    @jax.jit
    def f_reduce(flat, alpha):
        return shear_reduce(flat, alpha, row_div=1, elem_scale=c, n_texels=s,
                            coef_bound=ALPHA_BOUND, row_lo=lo, row_hi=hi)

    @jax.jit
    def f_quadrant(img):
        # static quadrant pre-rotation from rotate_bins_uniform
        angles = tuple(-i * 2.0 * np.pi / d for i in range(d))
        quad = [int(np.floor((a + np.pi / 4) / (np.pi / 2))) % 4 for a in angles]
        groups = [[i for i in range(d) if quad[i] == q] for q in range(4)]
        parts, order = [], []
        for q, idxs in enumerate(groups):
            if not idxs:
                continue
            sub = img[jnp.asarray(idxs)]
            parts.append(jnp.rot90(sub, k=-q, axes=(1, 2)) if q else sub)
            order += idxs
        pre = jnp.concatenate(parts, 0)
        inv = np.argsort(order)
        return pre[jnp.asarray(inv)][0, 0, 0, 0]

    timed("quadrant pre-rotate ", f_quadrant, img)
    timed("x-shear             ", f_xshear, flat, alpha)
    timed("transpose           ", f_transpose, flat)
    timed("y-shear             ", f_yshear, t_img, beta)
    timed("transpose back      ", f_transpose_back, t_img)
    timed("reduce-shear (fused)", f_reduce, flat, alpha)


if __name__ == "__main__":
    main()
