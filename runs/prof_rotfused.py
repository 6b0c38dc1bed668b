"""Decompose the fused rotate kernel's 46 us/image: DMA floor, in-kernel
transposes, shear passes, dynamic-k loop overhead.

Usage: python runs/prof_rotfused.py
"""
import functools
import sys
import time

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from litbox_tpu.ops.rotate import ROW_BLOCK, _shear_block_dyn

S = 640
D = 384  # C*D equivalent
REPS = 10

sys.path.insert(0, "/root/repo/runs")
from bench_1080p import measure_rtt


def run_variant(name, kernel, x, alpha, beta, rtt, scratch_n=2):
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(D,),
        in_specs=[pl.BlockSpec((1, S, S), lambda i, a, b: (i, 0, 0))],
        out_specs=pl.BlockSpec((1, S, S), lambda i, a, b: (0, 0, 0)),
        scratch_shapes=[pltpu.VMEM((S, S), jnp.float32)
                        for _ in range(scratch_n)],
    )

    def call(x, alpha, beta):
        return pl.pallas_call(
            kernel, grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((1, S, S), jnp.float32),
        )(alpha, beta, x)

    @jax.jit
    def reps(x, alpha, beta):
        def body(carry, i):
            xi = x.at[0, 0, 0].add(carry * 1e-30)
            y = call(xi, alpha, beta)
            return y.reshape(-1)[0], 0.0
        out, _ = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(REPS))
        return out

    float(reps(x, alpha, beta))
    float(reps(x, alpha, beta))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        float(reps(x, alpha, beta))
        best = min(best, time.perf_counter() - t0 - rtt)
    per = best / REPS
    print(f"{name}: {per*1000:8.2f} ms, {per/D*1e6:6.1f} us/img", flush=True)


def main():
    rtt = measure_rtt()
    print(f"rtt {rtt*1000:.1f} ms  S={S} D={D}", flush=True)
    x = jax.random.uniform(jax.random.key(0), (D, S, S), jnp.float32)
    resid = (jax.random.uniform(jax.random.key(1), (D,)) - 0.5) * (np.pi / 2)
    alpha = -jnp.tan(resid / 2.0)
    beta = jnp.sin(resid)
    nblk = S // ROW_BLOCK
    center = S / 2.0

    # 1. copy only (DMA floor + accumulate)
    def k_copy(a_ref, b_ref, img_ref, out_ref, t1, t2):
        d = pl.program_id(0)

        @pl.when(d == 0)
        def _():
            out_ref[0] = img_ref[0]

        @pl.when(d != 0)
        def _():
            out_ref[0] = out_ref[0] + img_ref[0]

    run_variant("copy+accum          ", k_copy, x, alpha, beta, rtt)

    # 2. two transposes + accumulate
    def k_transpose2(a_ref, b_ref, img_ref, out_ref, t1, t2):
        d = pl.program_id(0)
        t1[:] = jnp.swapaxes(img_ref[0], 0, 1)
        t2[:] = jnp.swapaxes(t1[:], 0, 1)

        @pl.when(d == 0)
        def _():
            out_ref[0] = t2[:]

        @pl.when(d != 0)
        def _():
            out_ref[0] = out_ref[0] + t2[:]

    run_variant("2x transpose        ", k_transpose2, x, alpha, beta, rtt)

    # 3. one dynamic shear pass only
    def k_shear1(a_ref, b_ref, img_ref, out_ref, t1, t2):
        d = pl.program_id(0)
        a = a_ref[d]

        def p(i, _):
            ro = pl.multiple_of(i * ROW_BLOCK, ROW_BLOCK)
            t1[pl.ds(ro, ROW_BLOCK), :] = _shear_block_dyn(
                a, ro, img_ref[0, pl.ds(ro, ROW_BLOCK), :], S, center)
            return 0

        jax.lax.fori_loop(0, nblk, p, 0)

        @pl.when(d == 0)
        def _():
            out_ref[0] = t1[:]

        @pl.when(d != 0)
        def _():
            out_ref[0] = out_ref[0] + t1[:]

    run_variant("1 shear (dyn k)     ", k_shear1, x, alpha, beta, rtt)

    # 4. three shears, no transposes (wrong math, right cost)
    def k_shear3(a_ref, b_ref, img_ref, out_ref, t1, t2):
        d = pl.program_id(0)
        a = a_ref[d]
        b = b_ref[d]

        def mk(src, dst, coef):
            def p(i, _):
                ro = pl.multiple_of(i * ROW_BLOCK, ROW_BLOCK)
                dst[pl.ds(ro, ROW_BLOCK), :] = _shear_block_dyn(
                    coef, ro, src[pl.ds(ro, ROW_BLOCK), :], S, center)
                return 0
            jax.lax.fori_loop(0, nblk, p, 0)

        def p1(i, _):
            ro = pl.multiple_of(i * ROW_BLOCK, ROW_BLOCK)
            t1[pl.ds(ro, ROW_BLOCK), :] = _shear_block_dyn(
                a, ro, img_ref[0, pl.ds(ro, ROW_BLOCK), :], S, center)
            return 0

        jax.lax.fori_loop(0, nblk, p1, 0)
        mk(t1, t2, b)
        mk(t2, t1, a)

        @pl.when(d == 0)
        def _():
            out_ref[0] = t1[:]

        @pl.when(d != 0)
        def _():
            out_ref[0] = out_ref[0] + t1[:]

    run_variant("3 shears no transp  ", k_shear3, x, alpha, beta, rtt)


if __name__ == "__main__":
    main()
