"""Round-2 micro-probes: RNG impls, emission breakdown, histogram injection,
one-hot flight at 524K, MXU nearest material gather."""
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


def measure_rtt():
    float(jnp.float32(1.0) + 1)
    out = []
    for i in range(3):
        t0 = time.perf_counter()
        float(jnp.sin(jnp.float32(i)))
        out.append(time.perf_counter() - t0)
    return min(out)


def timeit(name, fn, *args):
    out = jax.jit(fn)
    float(out(*args))
    float(out(*args))
    t0 = time.perf_counter()
    float(out(*args))
    dt = (time.perf_counter() - t0 - RTT) / REPS * 1000
    print(f"{name:50s} {dt:8.2f} ms")
    return dt


def chain(body):
    def fn(*args):
        def step(c, i):
            return body(c, i, *args[1:]), 0.0
        c, _ = jax.lax.scan(step, args[0], jnp.arange(REPS))
        return jax.tree_util.tree_leaves(c)[0].ravel()[0]
    return fn


if __name__ == "__main__":
    from litbox_tpu.core import luts
    from litbox_tpu.sim import rbt
    import bench

    RTT = measure_rtt()
    print(f"RTT {RTT*1000:.1f} ms")

    scene, gb = bench.build_scene(256)
    fields = rbt.precompute_rotated_fields(gb, n_bins=D)
    cum = fields.cum_log
    key_tf = jax.random.key(0)
    key_rbg = jax.random.key(0, impl="rbg")
    key_urbg = jax.random.key(0, impl="unsafe_rbg")

    # --- RNG cost: 10M uniforms ---
    def uni(c, i, k):
        u = jax.random.uniform(jax.random.fold_in(k, i), (N, 5))
        return c + u.sum()
    timeit("threefry uniform (2M,5)", chain(uni), jnp.float32(0), key_tf)
    timeit("rbg uniform (2M,5)", chain(uni), jnp.float32(0), key_rbg)
    timeit("unsafe_rbg uniform (2M,5)", chain(uni), jnp.float32(0), key_urbg)

    def uni2(c, i, k):
        u = jax.random.uniform(jax.random.fold_in(k, i), (N, 2))
        return c + u.sum()
    timeit("rbg uniform (2M,2)", chain(uni2), jnp.float32(0), key_rbg)

    # --- emission breakdown ---
    from litbox_tpu.sim.emission import assign_photons_to_lights, emit

    def assign_only(c, i):
        l_idx, rpl = assign_photons_to_lights(scene.lights, N, interleave=N // N_B)
        return c + l_idx.sum() + rpl.sum()
    timeit("assign_photons_to_lights 2M", chain(assign_only), jnp.float32(0))

    def emit_only(c, i, k):
        l_idx = jnp.zeros((N,), jnp.int32)
        rpl = jnp.full((scene.lights.capacity,), N // scene.lights.capacity, jnp.int32)
        pos, d, e, bn = emit(scene.lights, scene.field_textures, l_idx, rpl,
                             jax.random.fold_in(k, i), (256, 256),
                             jnp.float32(1.0), jnp.int32(-1), active_kinds=(1,))
        return c + pos.sum() + d.sum() + e.sum()
    timeit("emit 2M (threefry, fixed assign)", chain(emit_only), jnp.float32(0), key_tf)
    timeit("emit 2M (rbg, fixed assign)", chain(emit_only), jnp.float32(0), key_rbg)

    # --- histogram injection: scan over bins, one-hot.T @ energy ---
    STAMP = 16
    CAP = N // D  # 15625

    def hist_inject(c, i, k):
        u = jax.random.uniform(jax.random.fold_in(k, i), (D, CAP, 2))
        # disk offsets -> local cell in a STAMP x STAMP bbox
        r = jnp.sqrt(u[..., 0]) * 4.0
        th = u[..., 1] * (2 * np.pi)
        ox = r * jnp.cos(th) + STAMP / 2
        oy = r * jnp.sin(th) + STAMP / 2
        cell = (jnp.clip(oy.astype(jnp.int32), 0, STAMP - 1) * STAMP
                + jnp.clip(ox.astype(jnp.int32), 0, STAMP - 1))

        def body(carry, cell_b):
            oh = jax.nn.one_hot(cell_b, STAMP * STAMP, dtype=jnp.bfloat16)
            counts = jnp.sum(oh, axis=0, dtype=jnp.float32)
            return carry, counts
        _, counts = jax.lax.scan(body, 0.0, cell)
        return c + counts.sum()
    timeit("hist inject 2M (scan 128 bins, one-hot sum)", chain(hist_inject),
           jnp.float32(0), key_rbg)

    # batched (no scan): one-hot (D, CAP, 256) reduced over CAP
    def hist_inject_batched(c, i, k):
        u = jax.random.uniform(jax.random.fold_in(k, i), (D, CAP, 2))
        r = jnp.sqrt(u[..., 0]) * 4.0
        th = u[..., 1] * (2 * np.pi)
        ox = r * jnp.cos(th) + STAMP / 2
        oy = r * jnp.sin(th) + STAMP / 2
        cell = (jnp.clip(oy.astype(jnp.int32), 0, STAMP - 1) * STAMP
                + jnp.clip(ox.astype(jnp.int32), 0, STAMP - 1))
        oh = jax.nn.one_hot(cell, STAMP * STAMP, dtype=jnp.float32)
        return c + jnp.sum(oh, axis=1).sum()
    timeit("hist inject 2M (batched one-hot reduce)", chain(hist_inject_batched),
           jnp.float32(0), key_rbg)

    # --- one-hot flight at 524K (scan over bins) ---
    xs = jnp.arange(S, dtype=jnp.float32)

    def onehot_flight(c, i, k, n):
        cap = n // D
        kk = jax.random.fold_in(k, i)
        iy = jax.random.randint(kk, (D, cap), 0, S)
        xr = jax.random.uniform(jax.random.fold_in(kk, 1), (D, cap),
                                minval=60.0, maxval=320.0)
        tp = jax.random.uniform(jax.random.fold_in(kk, 2), (D, cap))

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
    timeit("one-hot flight 524K (scan bins, bf16)",
           chain(lambda c, i: onehot_flight(c, i, key_rbg, N_B)), jnp.float32(0))

    # f32 variant (precision-safe)
    def onehot_flight_f32(c, i):
        cap = N_B // D
        kk = jax.random.fold_in(key_rbg, i)
        iy = jax.random.randint(kk, (D, cap), 0, S)
        xr = jax.random.uniform(jax.random.fold_in(kk, 1), (D, cap),
                                minval=60.0, maxval=320.0)
        tp = jax.random.uniform(jax.random.fold_in(kk, 2), (D, cap))

        def per_bin(carry, args):
            iy_b, xr_b, tp_b, cum_b = args
            oh = jax.nn.one_hot(iy_b, S, dtype=jnp.float32)
            rows = jnp.dot(oh, cum_b, preferred_element_type=jnp.float32)
            tent = jnp.maximum(0.0, 1.0 - jnp.abs((xr_b - 0.5)[:, None] - xs))
            c0 = jnp.sum(rows * tent, axis=-1)
            t_esc = jnp.exp(jnp.clip(rows[:, -1] - c0, -60.0, 0.0))
            thr = c0 + jnp.log(jnp.maximum(tp_b * (1 - t_esc) + t_esc, 1e-30))
            x_star = jnp.sum((rows >= thr[:, None]).astype(jnp.int32), axis=-1)
            return carry + c0.sum() + x_star.sum(), 0.0
        out, _ = jax.lax.scan(per_bin, jnp.float32(0), (iy, xr, tp, cum))
        return c + out
    timeit("one-hot flight 524K (scan bins, f32)", chain(onehot_flight_f32),
           jnp.float32(0))

    # hi/lo split bf16 variant
    cum_hi = cum.astype(jnp.bfloat16)
    cum_lo = (cum - cum_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    cum_cat = jnp.concatenate([cum_hi, cum_lo], axis=-1)  # (D, S, 2S)

    def onehot_flight_hilo(c, i):
        cap = N_B // D
        kk = jax.random.fold_in(key_rbg, i)
        iy = jax.random.randint(kk, (D, cap), 0, S)
        xr = jax.random.uniform(jax.random.fold_in(kk, 1), (D, cap),
                                minval=60.0, maxval=320.0)
        tp = jax.random.uniform(jax.random.fold_in(kk, 2), (D, cap))

        def per_bin(carry, args):
            iy_b, xr_b, tp_b, cum_b = args
            oh = jax.nn.one_hot(iy_b, S, dtype=jnp.bfloat16)
            both = jnp.dot(oh, cum_b, preferred_element_type=jnp.float32)
            rows = both[:, :S] + both[:, S:]
            tent = jnp.maximum(0.0, 1.0 - jnp.abs((xr_b - 0.5)[:, None] - xs))
            c0 = jnp.sum(rows * tent, axis=-1)
            t_esc = jnp.exp(jnp.clip(rows[:, -1] - c0, -60.0, 0.0))
            thr = c0 + jnp.log(jnp.maximum(tp_b * (1 - t_esc) + t_esc, 1e-30))
            x_star = jnp.sum((rows >= thr[:, None]).astype(jnp.int32), axis=-1)
            return carry + c0.sum() + x_star.sum(), 0.0
        out, _ = jax.lax.scan(per_bin, jnp.float32(0), (iy, xr, tp, cum_cat))
        return c + out
    timeit("one-hot flight 524K (hi/lo bf16)", chain(onehot_flight_hilo),
           jnp.float32(0))

    # --- nearest material via gather_bilinear_mxu at integer centers ---
    from litbox_tpu.ops.resample import gather_bilinear_mxu
    material = jnp.concatenate([gb.normal, gb.albedo[..., :3]], -1)

    def mat_mxu(c, i):
        kk = jax.random.fold_in(key_rbg, i)
        p = jax.random.uniform(kk, (N_B, 2), minval=0.0, maxval=255.0)
        pts = jnp.floor(p) + 0.5
        m = gather_bilinear_mxu(material, pts)
        return c + m.sum()
    timeit("material nearest MXU 524K", chain(mat_mxu), jnp.float32(0))

    # --- full-row gather flight at 524K but with rbg rng (sanity re-measure) ---
    def flight_gather(c, i):
        kk = jax.random.fold_in(key_rbg, i)
        b = jax.random.randint(kk, (N_B,), 0, D)
        iy = jax.random.randint(jax.random.fold_in(kk, 1), (N_B,), 0, S)
        xr = jax.random.uniform(jax.random.fold_in(kk, 2), (N_B,),
                                minval=60.0, maxval=320.0)
        rows = cum.reshape(D * S, S)[b * S + iy]
        tent = jnp.maximum(0.0, 1.0 - jnp.abs((xr - 0.5)[:, None] - xs))
        c0 = jnp.sum(rows * tent, axis=-1)
        return c + c0.sum()
    timeit("row gather flight 524K (rbg)", chain(flight_gather), jnp.float32(0))
