"""Physics validation of the oracle tracer.

The reference has no unit tests (SURVEY.md section 4); its oracle is
"convergence as truth". Here the tracer is validated against closed-form
transport: in a uniform medium the converged raw deposit map from a central
point light must follow  raw(r) = energy * W * H * T(r) / (4 pi^2 r),
where T(r) = t_texel^r  (derivation: deposits carry E*ii^2*T_cum at linear
density 1/ii, photon fluence through a texel at distance r is N/(2 pi r),
and emission energy is energy*(W*H)/(N*ii*2pi) for point lights).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from litbox_tpu.core import luts
from litbox_tpu.scene import SceneBuilder, rasterize
from litbox_tpu.sim.oracle import to_hdr, trace_frame

W = 64
DENSITY_LOG = -1.3  # light haze


@pytest.fixture(scope="module")
def scene_uniform():
    b = SceneBuilder()
    b.add_point_light((W / 2, W / 2), radius=0.5, color=(1, 1, 1), intensity=1.0, bounces=1)
    b.add_rect((W / 2, W / 2), (W, W), color=(1, 1, 1, 1), log_density=DENSITY_LOG)
    scene = b.build(max_lights=2, max_shapes=2)
    gb = rasterize(scene, W, W)
    return scene, gb


@pytest.fixture(scope="module")
def brdf():
    return jnp.asarray(luts.brdf_lut((32, 9, 4)))


def _trace(scene, gb, brdf, key, n=16384, frames=4, bounces=1):
    accum = jnp.zeros((W, W, 3))
    writes = 0
    for f in range(frames):
        raw, wc = trace_frame(gb, scene.lights, scene.field_textures, brdf,
                              jax.random.fold_in(key, f), n,
                              float(max(1.0, 0.1 * W)), jnp.int32(bounces),
                              max_bounces=bounces)
        accum = accum + raw
        writes += int(wc)
    return np.asarray(accum) / frames, writes


def test_point_light_uniform_medium_profile(scene_uniform, brdf):
    scene, gb = scene_uniform
    raw, writes = _trace(scene, gb, brdf, jax.random.key(0))
    assert writes > 0
    assert np.all(np.isfinite(raw))

    t_texel = (1 - 10**DENSITY_LOG) ** (100 / W)
    ys, xs = np.mgrid[0:W, 0:W]
    r = np.hypot(xs + 0.5 - W / 2, ys + 0.5 - W / 2)
    expected = W * W * t_texel**r / (4 * np.pi**2 * np.maximum(r, 1e-3))

    lum = raw.mean(-1)
    # Compare annulus means in the mid-field (avoid near-singularity + edge).
    for r0, r1 in [(8, 12), (14, 18), (20, 24)]:
        m = (r >= r0) & (r < r1)
        ratio = lum[m].mean() / expected[m].mean()
        assert abs(ratio - 1.0) < 0.08, (r0, r1, ratio)


def test_determinism(scene_uniform, brdf):
    scene, gb = scene_uniform
    a, _ = _trace(scene, gb, brdf, jax.random.key(7), n=2048, frames=1)
    b, _ = _trace(scene, gb, brdf, jax.random.key(7), n=2048, frames=1)
    np.testing.assert_array_equal(a, b)


def test_tracer_pair_independence(scene_uniform, brdf):
    scene, gb = scene_uniform
    a, _ = _trace(scene, gb, brdf, jax.random.key(1), n=4096, frames=1)
    b, _ = _trace(scene, gb, brdf, jax.random.key(2), n=4096, frames=1)
    assert np.abs(a - b).max() > 0  # independent streams
    # Means agree statistically.
    assert abs(a.sum() / b.sum() - 1) < 0.05


def test_bounce_adds_energy(scene_uniform, brdf):
    scene, gb = scene_uniform
    one, _ = _trace(scene, gb, brdf, jax.random.key(3), n=4096, frames=2, bounces=1)
    two, _ = _trace(scene, gb, brdf, jax.random.key(3), n=4096, frames=2, bounces=2)
    # Second bounce deposits strictly more energy overall.
    assert two.sum() > one.sum() * 1.02


def test_to_hdr_applies_albedo_and_outscatter(scene_uniform, brdf):
    scene, gb = scene_uniform
    raw, _ = _trace(scene, gb, brdf, jax.random.key(4), n=2048, frames=1)
    hdr = np.asarray(to_hdr(jnp.asarray(raw), jnp.float32(1.0), gb))
    t = (1 - 10**DENSITY_LOG) ** (100 / W)
    np.testing.assert_allclose(hdr[30, 40], raw[30, 40] * 1.0 * (1 - t), rtol=1e-5)


def test_vacuum_deposits_masked_by_outscatter(brdf):
    # Empty scene: no medium -> outscatter = 0 -> HDR is exactly zero.
    b = SceneBuilder()
    b.add_point_light((W / 2, W / 2), radius=1.0, bounces=1)
    scene = b.build(max_lights=1, max_shapes=1)
    gb = rasterize(scene, W, W)
    raw, _ = trace_frame(gb, scene.lights, scene.field_textures, brdf,
                         jax.random.key(0), 1024, 6.4, jnp.int32(-1),
                         max_bounces=1)
    hdr = np.asarray(to_hdr(raw, jnp.float32(1.0), gb))
    assert np.all(hdr == 0.0)
    # But the raw deposit field is populated (T==1 along all paths).
    assert np.asarray(raw).sum() > 0
