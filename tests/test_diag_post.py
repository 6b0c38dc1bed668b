import numpy as np
import jax.numpy as jnp

from litbox_tpu.diag.analysis import analysis_a, analysis_b
from litbox_tpu.post.cloud_relight import relight_layer, shade_foreground
from litbox_tpu.post.compositor import composite_additive, composite_premultiplied


def test_analysis_a_zero_for_identical_tracers():
    x = jnp.ones((16, 16, 3))
    assert float(analysis_a(x, x).max()) == 0.0


def test_analysis_b_preserves_constants():
    prev = jnp.full((16, 16), 3.0)
    albedo = jnp.ones((16, 16, 4))
    hdr = jnp.ones((16, 16, 3))
    var = jnp.zeros((16, 16))
    out = np.asarray(analysis_b(prev, albedo, hdr, var))
    np.testing.assert_allclose(out, 3.0, rtol=1e-5)


def test_relight_depth_attenuates():
    rng = np.random.default_rng(0)
    hdr = jnp.asarray(rng.uniform(0, 1, (32, 32, 3)).astype(np.float32))
    trans = jnp.full((32, 32), 0.8)
    shallow = np.asarray(relight_layer(hdr, trans, 1.0, sigma=2.0))
    deep = np.asarray(relight_layer(hdr, trans, 4.0, sigma=2.0))
    assert deep.sum() < shallow.sum()
    assert np.all(np.isfinite(deep))


def test_shade_and_composite():
    sprite = jnp.concatenate([jnp.full((8, 8, 3), 0.5), jnp.full((8, 8, 1), 0.5)], -1)
    light = jnp.ones((8, 8, 3)) * 2.0
    trans = jnp.full((8, 8), 0.9)
    layer = shade_foreground(sprite, light, trans)
    assert layer.shape == (8, 8, 4)
    bg = jnp.zeros((8, 8, 3))
    out = composite_premultiplied(bg, layer)
    assert float(out.min()) > 0
    add = composite_additive(bg, light)
    np.testing.assert_allclose(np.asarray(add), 2.0)


def test_picker_all_views_render(tmp_path):
    """Every TextureType — including the round-2 ForwardAccumulation and
    AI input/output views (SimulationTexturePicker.cs:6-20) — renders to a
    finite (H, W, 3) image through a live Simulation + AIAccelerator."""
    import jax
    import jax.numpy as jnp

    from litbox_tpu.diag.picker import TextureType, dump_all, pick
    from litbox_tpu.engine import Mode, Simulation
    from litbox_tpu.engine.pipeline import AIAccelerator
    from litbox_tpu.nn.unet import LitboxDenoiserNet
    from litbox_tpu.scene import SceneBuilder

    w = 32
    b = SceneBuilder()
    b.add_point_light((w / 2, w / 2), radius=1.5, intensity=1.5, bounces=2)
    b.add_rect((w / 2, w / 2), (w, w), log_density=-1.2)
    sim = Simulation(width=w, height=w, mode=Mode.REFERENCE,
                     rays_per_frame=1024, frame_limit=2)
    sim.set_scene(b.build(max_lights=1, max_shapes=1))

    model = LitboxDenoiserNet(unet_size=2, initial_features=4)
    variables = model.init(jax.random.key(0), jnp.zeros((3, w, w, 1)),
                           train=False)
    ai = AIAccelerator(sim, variables, unet_size=2, initial_features=4)
    sim.run(max_frames=2)

    for which in TextureType:
        img = np.asarray(pick(sim, which, ai=ai))
        assert img.ndim == 3 and img.shape[-1] == 3, which
        assert np.all(np.isfinite(img)), which
    # AI views carry signal once the accelerator has stepped.
    assert ai.hdr_output is not None
    assert np.asarray(pick(sim, TextureType.AI_HDR, ai=ai)).sum() > 0
    assert np.asarray(
        pick(sim, TextureType.FORWARD_ACCUMULATION, ai=ai)).sum() > 0

    paths = dump_all(sim, str(tmp_path), ai=ai)
    assert len(paths) == len(TextureType)
    ai.detach()
    assert ai._on_step not in sim.on_step
