"""Stage-level profiling of the honest RBT frame on the real chip.

Times each hot-path stage in isolation with the bench methodology
(scan-chained inside one jit, double-warm, RTT-subtracted single fetch).
"""
from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

N = 2_000_000
N_B = 524_288
S = 384
D = 128
REPS = 10


def timeit(name, fn, *args):
    out = jax.jit(fn)
    float(out(*args))
    float(out(*args))
    t0 = time.perf_counter()
    float(out(*args))
    dt = (time.perf_counter() - t0 - RTT) / REPS * 1000
    print(f"{name:45s} {dt:8.2f} ms/frame-stage")
    return dt


def chain(body, init):
    def fn(*args):
        def step(c, i):
            return body(c, i, *args[1:]), 0.0
        c, _ = jax.lax.scan(step, args[0], jnp.arange(REPS))
        return jax.tree_util.tree_leaves(c)[0].ravel()[0]
    return fn


def measure_rtt():
    float(jnp.float32(1.0) + 1)
    return min(
        (lambda t0: (float(jnp.sin(jnp.float32(i))), time.perf_counter() - t0)[1])(
            time.perf_counter())
        for i in range(3))


if __name__ == "__main__":
    from litbox_tpu.core import luts
    from litbox_tpu.sim import rbt
    import bench

    RTT = measure_rtt()
    print(f"RTT {RTT*1000:.1f} ms, backend {jax.default_backend()}")

    scene, gb = bench.build_scene(256)
    brdf = jnp.asarray(luts.brdf_lut())
    fields = rbt.precompute_rotated_fields(gb, n_bins=D)
    key = jax.random.key(0)

    # --- full honest frame (reference point) ---
    def full_frame(src, i):
        src, _ = rbt.rbt_trace_frame(
            fields, src, gb, scene.lights, scene.field_textures, brdf,
            jax.random.fold_in(key, i), N, jnp.int32(-1),
            max_bounces=2, bounce_photons=N_B,
            mc_direct=True, analytic_direct=False,
            enable_brdf=False, light_kinds=(1,))
        return src
    t_full = timeit("full frame (2M, 2 waves, cull 4x)", chain(full_frame, None),
                    rbt.zero_sources(fields))

    # --- emission only ---
    from litbox_tpu.sim.emission import assign_photons_to_lights, emit

    def emission(c, i):
        k = jax.random.fold_in(key, i)
        l_idx, rpl = assign_photons_to_lights(scene.lights, N, interleave=N // N_B)
        pos, d, e, bn = emit(scene.lights, scene.field_textures, l_idx, rpl, k,
                             (256, 256), jnp.float32(1.0), jnp.int32(-1),
                             active_kinds=(1,))
        return c + pos.sum() + d.sum() + e.sum()
    timeit("emission 2M", chain(emission, None), jnp.float32(0))

    # --- row gather + free-flight reductions at 2M ---
    cum = fields.cum_log
    def flight(c, i, n):
        k = jax.random.fold_in(key, i)
        ks = jax.random.split(k, 4)
        b = jax.random.randint(ks[0], (n,), 0, D)
        iy = jax.random.randint(ks[1], (n,), 0, S)
        xr = jax.random.uniform(ks[2], (n,), minval=60.0, maxval=320.0)
        xs = jnp.arange(S, dtype=jnp.float32)
        rows = cum.reshape(D * S, S)[b * S + iy]
        tent = jnp.maximum(0.0, 1.0 - jnp.abs((xr - 0.5)[:, None] - xs))
        c0 = jnp.sum(rows * tent, axis=-1)
        t_esc = jnp.exp(jnp.clip(rows[:, -1] - c0, -60.0, 0.0))
        tp = t_esc + jax.random.uniform(ks[3], (n,)) * (1 - t_esc)
        thr = c0 + jnp.log(jnp.maximum(tp, 1e-30))
        x_star = jnp.sum((rows >= thr[:, None]).astype(jnp.int32), axis=-1)
        x_star = jnp.clip(x_star, 1, S - 1)
        c_at = jnp.sum(jnp.where(xs[None] == x_star[:, None].astype(jnp.float32),
                                 rows, 0.0), axis=-1)
        return c + c0.sum() + t_esc.sum() + x_star.sum() + c_at.sum()
    def flight2m(c, i):
        return flight(c, i, N)
    def flight512k(c, i):
        return flight(c, i, N_B)
    timeit("free flight (row gather+reduce) 2M", chain(flight2m, None), jnp.float32(0))
    timeit("free flight 524K", chain(flight512k, None), jnp.float32(0))

    # --- injection: flat scatter-add 2M / 524K ---
    def inject(src, i, n):
        k = jax.random.fold_in(key, i)
        flat = jax.random.randint(k, (n,), 0, D * S * S)
        e = jax.random.uniform(jax.random.fold_in(k, 1), (n, 3))
        return rbt._inject_flat(src, flat, e)
    timeit("inject flat scatter 2M",
           chain(lambda s, i: inject(s, i, N), None), rbt.zero_sources(fields))
    timeit("inject flat scatter 524K",
           chain(lambda s, i: inject(s, i, N_B), None), rbt.zero_sources(fields))

    # --- concentrated injection (stamp-like indices) 2M ---
    def inject_conc(src, i):
        k = jax.random.fold_in(key, i)
        b = jax.random.randint(k, (N,), 0, D)
        cell = jax.random.randint(jax.random.fold_in(k, 1), (N,), 0, 256)
        flat = b * (S * S) + cell
        e = jax.random.uniform(jax.random.fold_in(k, 2), (N, 3))
        return rbt._inject_flat(src, flat, e)
    timeit("inject flat scatter 2M concentrated", chain(inject_conc, None),
           rbt.zero_sources(fields))

    # --- material gather 524K ---
    material = jnp.concatenate([gb.normal, gb.albedo[..., :3]], -1)
    def mat(c, i):
        k = jax.random.fold_in(key, i)
        gx = jax.random.randint(k, (N_B,), 0, 256)
        gy = jax.random.randint(jax.random.fold_in(k, 1), (N_B,), 0, 256)
        m = material[gy, gx]
        return c + m.sum()
    timeit("material gather 524K", chain(mat, None), jnp.float32(0))

    # --- sort 524K / 2M (key+payloads) ---
    def sort_n(c, i, n):
        k = jax.random.fold_in(key, i)
        keys = jax.random.randint(k, (n,), 0, D * S * S)
        p1 = jax.random.uniform(jax.random.fold_in(k, 1), (n,))
        out = jax.lax.sort((keys, p1, p1, p1, p1, p1), num_keys=1)
        return c + out[1].sum()
    timeit("sort 2M key+5payload", chain(lambda c, i: sort_n(c, i, N), None),
           jnp.float32(0))
    timeit("sort 524K key+5payload", chain(lambda c, i: sort_n(c, i, N_B), None),
           jnp.float32(0))

    # --- one-hot MXU row extraction, 2M photons chunked over bins ---
    def onehot_flight(c, i):
        k = jax.random.fold_in(key, i)
        cap = N // D  # photons per bin, perfectly balanced for this probe
        iy = jax.random.randint(k, (D, cap), 0, S)
        xr = jax.random.uniform(jax.random.fold_in(k, 1), (D, cap),
                                minval=60.0, maxval=320.0)
        tp = jax.random.uniform(jax.random.fold_in(k, 2), (D, cap))
        xs = jnp.arange(S, dtype=jnp.float32)

        def per_bin(carry, args):
            iy_b, xr_b, tp_b, cum_b = args
            oh = jax.nn.one_hot(iy_b, S, dtype=jnp.bfloat16)
            rows = jnp.dot(oh, cum_b.astype(jnp.bfloat16),
                           preferred_element_type=jnp.float32)
            tent = jnp.maximum(0.0, 1.0 - jnp.abs((xr_b - 0.5)[:, None] - xs))
            c0 = jnp.sum(rows * tent, axis=-1)
            t_esc = jnp.exp(jnp.clip(rows[:, -1] - c0, -60.0, 0.0))
            thr = c0 + jnp.log(jnp.maximum(tp_b * (1 - t_esc) + t_esc, 1e-30))
            x_star = jnp.sum((rows >= thr[:, None]).astype(jnp.int32), axis=-1)
            return carry + c0.sum() + x_star.sum(), 0.0

        out, _ = jax.lax.scan(per_bin, jnp.float32(0), (iy, xr, tp, cum))
        return c + out
    timeit("one-hot MXU flight 2M (scan over 128 bins)", chain(onehot_flight, None),
           jnp.float32(0))
