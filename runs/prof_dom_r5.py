"""DOM cascade refresh cost after the shear-path forward rotation
(VERDICT r4 next #9; compare runs/prof_dom_r4.log: 561 ms at 256^2).

Measures dom_bounce_sources wall-clock (1 and 2 waves) at 256^2 and the
cascade-amortized frame at the default dom_refresh=8, same scene and
methodology as runs/prof_dom.py round 4.

Usage: python runs/prof_dom_r5.py | tee runs/prof_dom_r5.log
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from litbox_tpu.core import luts
from litbox_tpu.scene import SceneBuilder, rasterize
from litbox_tpu.sim import rbt
from litbox_tpu.sim.dom import dom_bounce_sources

W = 256
rng = np.random.default_rng(0)
cloud = rng.uniform(0.0, 1.0, (128, 128)).astype(np.float32)
for _ in range(3):
    cloud = (np.roll(cloud, 1, 0) + np.roll(cloud, -1, 0)
             + np.roll(cloud, 1, 1) + np.roll(cloud, -1, 1) + cloud) / 5.0
b = SceneBuilder(texture_size=128)
b.add_point_light((W * 0.5, W * 0.55), radius=4.0, color=(1.0, 0.85, 0.6),
                  intensity=2.0, bounces=3)
b.add_sprite((W / 2, W / 2), (W / 2, W / 2), color=(1, 1, 1, 1),
             log_density=-1.0, texture=np.stack([cloud] * 3 + [cloud], -1))
scene = b.build(max_lights=2, max_shapes=2)
gb = rasterize(scene, W, W)
brdf = jnp.asarray(luts.brdf_lut())
fields = rbt.precompute_rotated_fields(gb, n_bins=128)


def rtt():
    float(jnp.float32(1.0) + 1)
    return min(
        (lambda t0: (float(jnp.sin(jnp.float32(i))), time.perf_counter() - t0)[1])(
            time.perf_counter())
        for i in range(3))


R = rtt()
print(f"rtt {R*1000:.1f} ms")

src, _ = rbt.rbt_trace_frame(
    fields, rbt.zero_sources(fields), gb, scene.lights, scene.field_textures,
    brdf, jax.random.key(0), 2_000_000, jnp.int32(-1), max_bounces=1,
    mc_direct=True, analytic_direct=False, enable_brdf=False,
    light_kinds=(1,), hist_direct=True)

for waves in (1, 2):
    @jax.jit
    def refresh(fields, src):
        out = dom_bounce_sources(fields, gb, src, n_waves=waves)
        return out[0][0, 0, 0]

    float(refresh(fields, src))
    float(refresh(fields, src))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(refresh(fields, src))
        ts.append(time.perf_counter() - t0 - R)
    dt = sorted(ts)[1]
    print(f"cascade refresh ({waves} wave{'s' if waves > 1 else ''}): "
          f"{dt*1000:8.1f} ms  (r4 gather path: 561 ms at 1 wave)")
    if waves == 1:
        amort = dt / 8
        print(f"  amortized at dom_refresh=8: {amort*1000:6.1f} ms/frame")
