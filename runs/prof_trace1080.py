"""Decompose the 1080p realtime trace's per-frame cost (round 3).

The fused 1080p frame spends ~12 ms in rbt_trace_frame at 480x272 (S=640,
D=128) nearly INDEPENDENT of photon count (65K vs 327K changed nothing), so
the cost is fixed field-sized work, not scatter volume. This times the
direct-only and direct+bounce variants, fully materialized (sum of all
source planes), to attribute it.
"""
import sys
import time

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np

from runs.bench_1080p import SIM_H, SIM_W, build, measure_rtt


def main():
    from litbox_tpu.sim import rbt

    scene, gb, brdf, fields = build()
    rtt = measure_rtt()
    print(f"rtt {rtt*1000:.1f} ms  S={fields.size} D={fields.n_bins}", flush=True)
    lights, ftex = scene.lights, scene.field_textures

    def timed(name, fn, *args, reps=6):
        f = jax.jit(fn)
        jax.block_until_ready(f(*args)); float(np.asarray(f(*args))[()] * 0 + 1)
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            float(np.asarray(f(*args))[()] * 0 + 1)
            best = min(best, time.perf_counter() - t0 - rtt)
        print(f"{name:36s} {best/reps*1000:8.2f} ms/frame", flush=True)
        return best / reps

    def variant(photons, bounce, max_bounces, label):
        def run(src, key):
            total = jnp.float32(0.0)
            for r in range(6):
                src, _ = rbt.rbt_trace_frame(
                    fields, src, gb, lights, ftex, brdf,
                    jax.random.fold_in(key, r), photons, jnp.int32(-1),
                    max_bounces=max_bounces, bounce_photons=bounce,
                    mc_direct=True, analytic_direct=False, enable_brdf=False,
                    light_kinds=(1,), hist_direct=True)
            # full materialization: every plane contributes
            return sum(c.sum() for c in src)
        timed(label, run, rbt.zero_sources(fields), jax.random.key(0))

    variant(65_536, 16_384, 1, "direct only (65K, hist)")
    variant(262_144, 65_536, 1, "direct only (262K, hist)")
    variant(65_536, 16_384, 2, "direct+bounce (65K+16K)")
    variant(262_144, 65_536, 2, "direct+bounce (262K+65K)")


if __name__ == "__main__":
    main()
