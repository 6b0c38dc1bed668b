"""Micro-benchmarks for the fused rotate-and-sum kernel design.

The fused resolve kernel needs a y-shear on a VMEM-resident (S, S) image.
Candidates:
  a. in-kernel 2D transpose (jnp.swapaxes) — y-shear becomes an x-shear
  b. dynamic sublane roll (pltpu.roll axis=0) — shear columns directly
This prices both on-chip, plus the roll-based x-shear as the baseline.

Usage: python runs/prof_microops.py
"""
import sys
import time

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

S = 640
N = 64  # images per call

sys.path.insert(0, "/root/repo/runs")
from bench_1080p import measure_rtt


def timed(name, fn, *args, n=3, rtt=0.0):
    try:
        r = fn(*args)
        jax.block_until_ready(r)
    except Exception as e:
        print(f"{name}: FAILED {type(e).__name__}: {str(e)[:200]}", flush=True)
        return None
    best = 1e9
    for _ in range(n):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        best = min(best, time.perf_counter() - t0 - rtt)
    per = best / N
    print(f"{name}: {best*1000:8.2f} ms total, {per*1e6:7.1f} us/image", flush=True)
    return best


def main():
    rtt = measure_rtt()
    print(f"rtt {rtt*1000:.1f} ms", flush=True)
    x = jax.random.uniform(jax.random.key(0), (N, S, S), jnp.float32)

    # a. in-kernel transpose
    def k_transpose(in_ref, out_ref):
        out_ref[:] = jnp.swapaxes(in_ref[0], 0, 1)[None]

    @jax.jit
    def f_transpose(x):
        return pl.pallas_call(
            k_transpose,
            grid=(N,),
            in_specs=[pl.BlockSpec((1, S, S), lambda d: (d, 0, 0))],
            out_specs=pl.BlockSpec((1, S, S), lambda d: (d, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((N, S, S), jnp.float32),
        )(x)[0, 0, 0]

    timed("in-kernel transpose (640^2)   ", f_transpose, x, rtt=rtt)

    # a2. in-kernel double transpose (what the fused kernel actually does)
    def k_transpose2(in_ref, out_ref):
        t = jnp.swapaxes(in_ref[0], 0, 1)
        out_ref[:] = jnp.swapaxes(t * 2.0, 0, 1)[None]

    @jax.jit
    def f_transpose2(x):
        return pl.pallas_call(
            k_transpose2,
            grid=(N,),
            in_specs=[pl.BlockSpec((1, S, S), lambda d: (d, 0, 0))],
            out_specs=pl.BlockSpec((1, S, S), lambda d: (d, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((N, S, S), jnp.float32),
        )(x)[0, 0, 0]

    timed("in-kernel 2x transpose        ", f_transpose2, x, rtt=rtt)

    # b. dynamic sublane roll of (S, 128) strips
    def k_subroll(shift_ref, in_ref, out_ref):
        d = pl.program_id(0)
        sh = shift_ref[d]
        acc = jnp.zeros((S, S), jnp.float32)
        for strip in range(S // 128):
            blk = in_ref[0, :, strip * 128:(strip + 1) * 128]
            acc = acc.at[:, strip * 128:(strip + 1) * 128].set(
                pltpu.roll(blk, sh % S, axis=0))
        out_ref[0] = acc

    @jax.jit
    def f_subroll(shifts, x):
        return pl.pallas_call(
            k_subroll,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(N,),
                in_specs=[pl.BlockSpec((1, S, S), lambda d, c: (d, 0, 0))],
                out_specs=pl.BlockSpec((1, S, S), lambda d, c: (d, 0, 0)),
            ),
            out_shape=jax.ShapeDtypeStruct((N, S, S), jnp.float32),
        )(shifts, x)[0, 0, 0]

    shifts = jnp.arange(N, dtype=jnp.int32)
    timed("dyn sublane roll (5 strips)   ", f_subroll, shifts, x, rtt=rtt)

    # c. baseline: dynamic lane roll on (8, 640) blocks, whole image
    def k_laneroll(shift_ref, in_ref, out_ref):
        d = pl.program_id(0)
        sh = shift_ref[d]
        for blk in range(S // 8):
            rows = in_ref[0, blk * 8:(blk + 1) * 8, :]
            out_ref[0, blk * 8:(blk + 1) * 8, :] = pltpu.roll(rows, sh % S, axis=1)

    @jax.jit
    def f_laneroll(shifts, x):
        return pl.pallas_call(
            k_laneroll,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(N,),
                in_specs=[pl.BlockSpec((1, S, S), lambda d, c: (d, 0, 0))],
                out_specs=pl.BlockSpec((1, S, S), lambda d, c: (d, 0, 0)),
            ),
            out_shape=jax.ShapeDtypeStruct((N, S, S), jnp.float32),
        )(shifts, x)[0, 0, 0]

    timed("dyn lane roll (80 8-row blks) ", f_laneroll, shifts, x, rtt=rtt)

    # d. XLA minor-dims transpose for comparison (the current pipeline pass)
    @jax.jit
    def f_xla_transpose(x):
        return x.transpose(0, 2, 1)[0, 0, 0]

    timed("XLA transpose (N,S,S)->(N,S,S)", f_xla_transpose, x, rtt=rtt)

    # e. in-kernel flips (for quadrant rot90)
    def k_flip(in_ref, out_ref):
        out_ref[0] = in_ref[0][::-1, ::-1]

    @jax.jit
    def f_flip(x):
        return pl.pallas_call(
            k_flip,
            grid=(N,),
            in_specs=[pl.BlockSpec((1, S, S), lambda d: (d, 0, 0))],
            out_specs=pl.BlockSpec((1, S, S), lambda d: (d, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((N, S, S), jnp.float32),
        )(x)[0, 0, 0]

    timed("in-kernel flip both axes      ", f_flip, x, rtt=rtt)


if __name__ == "__main__":
    main()
