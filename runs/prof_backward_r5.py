"""On-chip timing of the backward/Hybrid path (VERDICT r4 missing #4).

The one engine mode with no TPU number through round 4. Measures:

  1. backward_gather_rbt    — the RBT deterministic-cubature per-pixel
                              gather (one direction bin per frame), at
                              256^2 and the 1080p quarter-res profile.
  2. backward_gather        — the faithful per-pixel march (reference
                              semantics, BackwardMonteCarlo.compute:62-119),
                              same sizes.
  3. full Hybrid frame      — forward RBT trace + resolve + backward
                              gather composed, per-frame ms at both sizes
                              (forward_refresh_interval=4, the realtime
                              default — tracers.HybridTracer docstring).

Methodology matches bench.py: chained frames in one jit where possible,
single scalar fetch, RTT subtracted, median of 3.

Usage: python runs/prof_backward_r5.py  (writes stdout; tee to
       runs/prof_backward_r5.log)
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from litbox_tpu.core import luts
from litbox_tpu.core.types import REALTIME_1080P as PROF
from litbox_tpu.scene import SceneBuilder, rasterize
from litbox_tpu.sim import rbt
from litbox_tpu.sim.backward import (backward_bin_for_frame, backward_gather,
                                     backward_gather_rbt)

FRAMES = 8


def build(w, h):
    rng = np.random.default_rng(0)
    cloud = rng.uniform(0.0, 1.0, (256, 256)).astype(np.float32)
    for _ in range(3):
        cloud = (np.roll(cloud, 1, 0) + np.roll(cloud, -1, 0)
                 + np.roll(cloud, 1, 1) + np.roll(cloud, -1, 1) + cloud) / 5.0
    b = SceneBuilder(texture_size=256)
    b.add_point_light((w * 0.5, h * 0.55), radius=4.0, color=(1.0, 0.85, 0.6),
                      intensity=2.0, bounces=2)
    b.add_sprite((w / 2, h / 2), (w / 2, h / 2), color=(1, 1, 1, 1),
                 log_density=-1.0, texture=np.stack([cloud] * 3 + [cloud], -1))
    scene = b.build(max_lights=2, max_shapes=2)
    gb = rasterize(scene, h, w)
    return scene, gb


def measure_rtt() -> float:
    float(jnp.float32(1.0) + 1)
    return min(
        (lambda t0: (float(jnp.sin(jnp.float32(i))), time.perf_counter() - t0)[1])(
            time.perf_counter())
        for i in range(3))


def timeit(name, fn, *args, per=FRAMES):
    float(fn(*args))
    float(fn(*args))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(fn(*args))
        ts.append(time.perf_counter() - t0 - RTT)
    dt = sorted(ts)[1] / per
    print(f"{name}: {dt*1000:8.2f} ms/frame", flush=True)
    return dt


RTT = measure_rtt()
print(f"rtt {RTT*1000:.1f} ms", flush=True)

for (w, h, photons, bounce, label) in (
        (256, 256, 2_000_000, 524_288, "256^2 bench scene"),
        (PROF.sim_width, PROF.sim_height, PROF.photons, PROF.bounce_photons,
         "1080p quarter-res profile")):
    print(f"--- {label} ({w}x{h}) ---", flush=True)
    scene, gb = build(w, h)
    brdf = jnp.asarray(luts.brdf_lut())
    teardrop = jnp.asarray(luts.teardrop_scattering_lut(3.0))
    fields = rbt.precompute_rotated_fields(gb, n_bins=PROF.n_bins)

    src, _ = rbt.rbt_trace_frame(
        fields, rbt.zero_sources(fields), gb, scene.lights,
        scene.field_textures, brdf, jax.random.key(0), photons,
        jnp.int32(-1), max_bounces=2, bounce_photons=bounce, mc_direct=True,
        analytic_direct=False, enable_brdf=False, light_kinds=(1,),
        hist_direct=True)
    fwd_raw = rbt.resolve_raw(fields, src, h, w)
    fwd_hdr = fwd_raw  # backward consumes pre-outscatter HDR; scale-free here

    # 1. RBT cubature gather: one bin per frame, chained.
    @jax.jit
    def rbt_gather_frames(fields, gb_, hdr):
        def body(acc, i):
            b = i % fields.n_bins
            out = backward_gather_rbt(fields, gb_, hdr + acc * 1e-30, b)
            return acc + out[0, 0, 0], 0.0
        acc, _ = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(FRAMES))
        return acc
    timeit("backward_gather_rbt  ", rbt_gather_frames, fields, gb, fwd_hdr)

    # 2. Faithful per-pixel march.
    @jax.jit
    def march_frames(gb_, hdr, key):
        def body(acc, i):
            out = backward_gather(gb_, hdr + acc * 1e-30, teardrop,
                                  jax.random.fold_in(key, i),
                                  jnp.float32(max(0.01, 0.2 * h)))
            return acc + out[0, 0, 0], 0.0
        acc, _ = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(FRAMES))
        return acc
    timeit("backward_gather march", march_frames, gb, fwd_hdr,
           jax.random.key(1))

    # 3. Full Hybrid frame: forward trace every frame, forward resolve
    # every 4th (the realtime refresh default), backward gather every frame.
    @jax.jit
    def hybrid_frames(fields, src, gb_, lights, ftex, brdf_, key):
        def body(carry, i):
            src, hdr, acc = carry
            src, _ = rbt.rbt_trace_frame(
                fields, src, gb_, lights, ftex, brdf_,
                jax.random.fold_in(key, i), photons, jnp.int32(-1),
                max_bounces=2, bounce_photons=bounce, mc_direct=True,
                analytic_direct=False, enable_brdf=False, light_kinds=(1,),
                hist_direct=True)
            hdr = jax.lax.cond(
                i % 4 == 0,
                lambda: rbt.resolve_raw(fields, src, h, w),
                lambda: hdr)
            out = backward_gather_rbt(fields, gb_, hdr, i % fields.n_bins)
            return (src, hdr, acc + out[0, 0, 0]), 0.0
        (src, hdr, acc), _ = jax.lax.scan(
            body, (src, jnp.zeros((h, w, 3)), jnp.float32(0.0)),
            jnp.arange(FRAMES))
        return acc
    timeit("HYBRID full frame    ", hybrid_frames, fields,
           rbt.zero_sources(fields), gb, scene.lights, scene.field_textures,
           brdf, jax.random.key(2))
