"""Bisect the fused trace+resolve blowup (prof_1080p: 10 + 71 ms stages
compile to a 315 ms fused program).

Hypotheses tested:
  A. cross-stage fusion pathology — XLA fuses the scatter-adds of the trace
     into multiple consumers of the resolve (fix: optimization_barrier
     between the stages).
  B. layout assignment — the fused program picks a different (worse) layout
     for the (D, S, S) source buffers.
  C. compile-scheduling artifact — unrelated to either; the fused program
     is simply serialized worse.

Usage: python runs/prof_fusion.py
"""
import sys
import time

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np

SIM_W, SIM_H = 480, 272
PHOTONS = 262_144
BOUNCE = 65_536

sys.path.insert(0, "/root/repo/runs")
from bench_1080p import build, measure_rtt


def main():
    from litbox_tpu.sim import rbt

    scene, gb, brdf, fields = build()
    rtt = measure_rtt()
    print(f"rtt {rtt*1000:.1f} ms", flush=True)
    key = jax.random.key(0)
    src0 = rbt.zero_sources(fields)
    lights, ftex = scene.lights, scene.field_textures

    def trace(fields, src, key):
        src, _ = rbt.rbt_trace_frame(
            fields, src, gb, lights, ftex, brdf, key,
            PHOTONS, jnp.int32(-1), max_bounces=2, bounce_photons=BOUNCE,
            mc_direct=True, analytic_direct=False, enable_brdf=False,
            light_kinds=(1,), hist_direct=True)
        return src

    def timed(name, fn, *args, n=3):
        float(fn(*args))
        float(fn(*args))
        best = 1e9
        for _ in range(n):
            t0 = time.perf_counter()
            float(fn(*args))
            best = min(best, time.perf_counter() - t0 - rtt)
        print(f"{name}: {best*1000:8.2f} ms", flush=True)
        return best

    @jax.jit
    def f_fused(fields, src, key):
        src = trace(fields, src, key)
        return rbt.resolve_raw(fields, src, SIM_H, SIM_W)[0, 0, 0]

    @jax.jit
    def f_barrier(fields, src, key):
        src = trace(fields, src, key)
        src = jax.lax.optimization_barrier(src)
        return rbt.resolve_raw(fields, src, SIM_H, SIM_W)[0, 0, 0]

    @jax.jit
    def f_resolve_only(fields, src):
        return rbt.resolve_raw(fields, src, SIM_H, SIM_W)[0, 0, 0]

    @jax.jit
    def f_trace_only(fields, src, key):
        return trace(fields, src, key)[0][0, 0, 0]

    timed("trace only        ", f_trace_only, fields, src0, key)
    timed("resolve only      ", f_resolve_only, fields, src0)
    timed("fused             ", f_fused, fields, src0, key)
    timed("fused + barrier   ", f_barrier, fields, src0, key)

    # Two separate async dispatches chained by data dependence: through the
    # tunnel dispatches are non-blocking, so a frame = two enqueues; only
    # the final scalar fetch pays the RTT.
    def f_two_calls(fields, src, key):
        src = f_trace_src(fields, src, key)
        return f_resolve_only(fields, src)

    f_trace_src = jax.jit(trace)
    timed("two dispatches    ", f_two_calls, fields, src0, key)


if __name__ == "__main__":
    main()
