"""Deterministic multi-bounce (sim/dom.py) vs the MC bounce estimator.

The DOM cascade must reproduce the EXPECTATION of the Russian-roulette
bounce chains (sim/rbt._bounce_chain_deposits) on pure-medium scenes:
same energy, same spatial structure, zero variance.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from litbox_tpu.core import luts
from litbox_tpu.scene import SceneBuilder, rasterize
from litbox_tpu.sim import rbt
from litbox_tpu.sim.dom import dom_bounce_sources

W = 48


@pytest.fixture(scope="module")
def medium_scene():
    rng = np.random.default_rng(0)
    cloud = rng.uniform(0.2, 1.0, (64, 64)).astype(np.float32)
    for _ in range(2):
        cloud = (np.roll(cloud, 1, 0) + np.roll(cloud, -1, 0)
                 + np.roll(cloud, 1, 1) + np.roll(cloud, -1, 1) + cloud) / 5.0

    def build(bounces):
        b = SceneBuilder(texture_size=64)
        b.add_point_light((W * 0.5, W * 0.5), radius=2.0, intensity=2.0,
                          bounces=bounces)
        b.add_sprite((W / 2, W / 2), (W / 2, W / 2), color=(1, 1, 1, 1),
                     log_density=-0.7,
                     texture=np.stack([cloud] * 3 + [cloud], -1))
        scene = b.build(max_lights=1, max_shapes=1)
        gb = rasterize(scene, W, W)
        # The DOM scope requires a medium with no normal field.
        assert float(jnp.abs(gb.normal[..., :2]).max()) == 0.0
        return scene, gb

    return build, jnp.asarray(luts.brdf_lut((16, 5, 3)))


def _mc_bounce(scene, gb, brdf, fields, src_direct, max_bounces, frames=10,
               photons=8192):
    acc = None
    for f in range(frames):
        key = jax.random.fold_in(jax.random.key(2), f)
        s2, _ = rbt.rbt_trace_frame(
            fields, rbt.zero_sources(fields), gb, scene.lights,
            scene.field_textures, brdf, key, photons, jnp.int32(-1),
            max_bounces=max_bounces, analytic_direct=True, mc_direct=False,
            enable_brdf=False)
        r = rbt.resolve_raw(fields, tuple(a - d for a, d in
                                          zip(s2, src_direct)), W, W)
        acc = r if acc is None else acc + r
    return np.asarray(acc) / frames


def _direct(scene, gb, brdf, fields):
    src, _ = rbt.rbt_trace_frame(
        fields, rbt.zero_sources(fields), gb, scene.lights,
        scene.field_textures, brdf, jax.random.key(0), 0, jnp.int32(-1),
        max_bounces=1, analytic_direct=True, mc_direct=False)
    return src


def test_dom_matches_mc_bounce_expectation(medium_scene):
    build, brdf = medium_scene
    scene, gb = build(bounces=2)
    fields = rbt.precompute_rotated_fields(gb, n_bins=32)
    src_direct = _direct(scene, gb, brdf, fields)
    mc = _mc_bounce(scene, gb, brdf, fields, src_direct, max_bounces=2)
    dom = np.asarray(rbt.resolve_raw(
        fields, dom_bounce_sources(fields, gb, src_direct, n_waves=1), W, W))

    assert abs(dom.sum() / mc.sum() - 1.0) < 0.05, (dom.sum(), mc.sum())
    cos = float((mc * dom).sum()
                / np.sqrt((mc**2).sum() * (dom**2).sum()))
    assert cos > 0.995, cos


def test_dom_two_waves(medium_scene):
    build, brdf = medium_scene
    scene, gb = build(bounces=3)
    fields = rbt.precompute_rotated_fields(gb, n_bins=32)
    src_direct = _direct(scene, gb, brdf, fields)
    mc = _mc_bounce(scene, gb, brdf, fields, src_direct, max_bounces=3)
    dom = np.asarray(rbt.resolve_raw(
        fields, dom_bounce_sources(fields, gb, src_direct, n_waves=2), W, W))
    assert abs(dom.sum() / mc.sum() - 1.0) < 0.05, (dom.sum(), mc.sum())


def test_dom_is_deterministic_and_linear(medium_scene):
    """Zero variance by construction; linear in the direct sources, so it
    composes with temporal accumulation."""
    build, brdf = medium_scene
    scene, gb = build(bounces=2)
    fields = rbt.precompute_rotated_fields(gb, n_bins=32)
    src = _direct(scene, gb, brdf, fields)
    a = dom_bounce_sources(fields, gb, src, n_waves=1)
    b = dom_bounce_sources(fields, gb, src, n_waves=1)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    doubled = dom_bounce_sources(
        fields, gb, tuple(2.0 * c for c in src), n_waves=1)
    for x, y in zip(doubled, a):
        np.testing.assert_allclose(np.asarray(x), 2.0 * np.asarray(y),
                                   rtol=1e-5, atol=1e-7)


def test_dom_integrator_mode_matches_mc(medium_scene):
    """RBTForwardIntegrator(dom_bounce=True): direct-only tracing + cascade
    converges to the same accumulated output as the MC bounce mode."""
    from litbox_tpu.sim.tracers import RBTForwardIntegrator

    build, _ = medium_scene
    scene, gb = build(bounces=2)

    def run(dom, frames=12, rays=8192):
        t = RBTForwardIntegrator(n_bins=32)
        t.gbuffer = gb
        t.rays_to_emit = rays
        t.max_bounces = 2
        t.analytic_direct = True
        t.dom_bounce = dom
        t.dom_refresh = 4
        for f in range(frames):
            t.integrate(scene, jax.random.fold_in(jax.random.key(3), f))
        return np.asarray(t.output_hdr)

    mc = run(False)
    dom = run(True)
    assert abs(dom.sum() / mc.sum() - 1.0) < 0.05, (dom.sum(), mc.sum())
    # DOM's bounce field is deterministic: two dom runs agree exactly.
    dom2 = run(True)
    np.testing.assert_allclose(dom, dom2, rtol=1e-6, atol=1e-8)


def test_forward_rotate_shear_matches_gather():
    """The r5 TPU fast path of dom._forward_rotate (Pallas 3-shear
    rotate_bins on the center-embedded map) must match the exact
    tent-matmul gather it replaces (interpret mode; smooth map, interior
    tolerance — the shear path's border handling differs by <= 1 texel)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from litbox_tpu.ops.rotate import rotate_bins
    from litbox_tpu.scene import SceneBuilder, rasterize
    from litbox_tpu.sim import rbt
    from litbox_tpu.sim.dom import _forward_rotate

    w = h = 64
    b = SceneBuilder()
    b.add_point_light((w / 2, h / 2), radius=1.0, intensity=1.0)
    scene = b.build(max_lights=1, max_shapes=1)
    gb = rasterize(scene, h, w)
    fields = rbt.precompute_rotated_fields(gb, n_bins=8, rot_size=128)
    s, d = fields.size, fields.n_bins

    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    world = jnp.asarray(np.stack([
        np.exp(-((xx - 20) ** 2 + (yy - 40) ** 2) / 200.0),
        np.exp(-((xx - 44) ** 2 + (yy - 24) ** 2) / 300.0),
        0.5 + 0.4 * np.sin(xx / 9.0) * np.cos(yy / 11.0)], -1))

    ref = np.asarray(_forward_rotate(fields, world, h, w))  # gather (CPU)

    oy, ox = (s - h) // 2, (s - w) // 2
    emb = jnp.zeros((s, s, 3)).at[oy:oy + h, ox:ox + w].set(world)
    angles = ((jnp.arange(d, dtype=jnp.float32) + fields.phase)
              * (2.0 * jnp.pi / d))
    fast = np.asarray(rotate_bins(jnp.broadcast_to(emb[None], (d, s, s, 3)),
                                  angles))

    # Compare where the gather found non-vacuum (interior of the rotated
    # footprint), eroded by one texel to exclude border-interp differences.
    mask = ref.sum(-1) > 1e-6
    er = mask.copy()
    er[1:] &= mask[:-1]; er[:-1] &= mask[1:]
    er[:, 1:] &= mask[:, :-1]; er[:, :-1] &= mask[:, 1:]
    diff = np.abs(fast - ref)[er]
    assert diff.max() < 5e-2, diff.max()
    np.testing.assert_allclose(fast[er].mean(), ref[er].mean(), rtol=1e-2)
