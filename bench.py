"""Benchmark: photon throughput of the forward tracer on one chip.

Prints ONE JSON line:
  {"metric": "photons_per_sec_per_chip", "value": N, "unit": "photons/s",
   "vs_baseline": N / 100e6}

Baseline: the driver target of 100 M photons/sec/chip (BASELINE.md). The
scene is BASELINE config 2/3: a point light in a cloudy substrate at 256^2,
default 65536 rays/frame, 2 bounces.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def build_scene(w: int):
    from litbox_tpu.scene import SceneBuilder, rasterize

    rng = np.random.default_rng(0)
    cloud = rng.uniform(0.0, 1.0, (128, 128)).astype(np.float32)
    # Smooth the noise into blobs (cheap separable box blur).
    for _ in range(3):
        cloud = (np.roll(cloud, 1, 0) + np.roll(cloud, -1, 0)
                 + np.roll(cloud, 1, 1) + np.roll(cloud, -1, 1) + cloud) / 5.0

    b = SceneBuilder(texture_size=128)
    b.add_point_light((w * 0.5, w * 0.55), radius=4.0, color=(1.0, 0.85, 0.6),
                      intensity=2.0, bounces=2)
    b.add_sprite((w / 2, w / 2), (w / 2, w / 2), color=(1, 1, 1, 1),
                 log_density=-1.0, texture=np.stack([cloud] * 3 + [cloud], -1))
    scene = b.build(max_lights=2, max_shapes=2)
    return scene, rasterize(scene, w, w)


def main():
    from litbox_tpu.core import luts
    from litbox_tpu.sim.oracle import trace_frame

    w = 256
    rays = 65536
    scene, gb = build_scene(w)
    brdf = jnp.asarray(luts.brdf_lut())
    interval = float(max(1.0, 0.1 * w))

    def frame(key):
        raw, wc = trace_frame(gb, scene.lights, scene.field_textures, brdf, key,
                              rays, interval, jnp.int32(-1), max_bounces=2)
        return raw, wc

    # Warm up (compile).
    raw, _ = frame(jax.random.key(0))
    jax.block_until_ready(raw)

    frames = 10
    t0 = time.perf_counter()
    for i in range(frames):
        raw, _ = frame(jax.random.key(i + 1))
    jax.block_until_ready(raw)
    dt = time.perf_counter() - t0

    photons_per_sec = rays * frames / dt
    print(json.dumps({
        "metric": "photons_per_sec_per_chip",
        "value": photons_per_sec,
        "unit": "photons/s",
        "vs_baseline": photons_per_sec / 100e6,
    }))


if __name__ == "__main__":
    main()
