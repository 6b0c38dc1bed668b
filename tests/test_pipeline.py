import jax
import jax.numpy as jnp
import numpy as np

from litbox_tpu.core import luts
from litbox_tpu.engine.pipeline import PipelineConfig, make_frame_fn
from litbox_tpu.nn.unet import LitboxDenoiserNet
from litbox_tpu.scene import SceneBuilder, rasterize
from litbox_tpu.sim import rbt

W = 32


def test_fused_frame_runs_and_is_bounded():
    b = SceneBuilder()
    b.add_point_light((W / 2, W / 2), radius=1.5, intensity=1.5, bounces=2)
    b.add_rect((W / 2, W / 2), (W, W), log_density=-1.2)
    scene = b.build(max_lights=1, max_shapes=1)
    gb = rasterize(scene, W, W)
    brdf = jnp.asarray(luts.brdf_lut((16, 5, 3)))
    fields = rbt.precompute_rotated_fields(gb, n_bins=32)

    model = LitboxDenoiserNet(unet_size=2, initial_features=4)
    variables = model.init(jax.random.key(0), jnp.zeros((3, W, W, 1)), train=False)

    cfg = PipelineConfig(n_photons=2048, max_bounces=2, unet_size=2,
                         initial_features=4, exposure=1.0)
    frame = make_frame_fn(cfg, gb, scene.lights, scene.field_textures, brdf,
                          fields, model_variables=variables)

    src = rbt.zero_sources(fields)
    for i in range(2):
        src, display, hdr = frame(src, jnp.float32(i + 1), jax.random.key(i))
    display = np.asarray(display)
    hdr = np.asarray(hdr)
    assert display.shape == (W, W, 3) and hdr.shape == (W, W, 3)
    assert np.all(np.isfinite(display)) and np.all(np.isfinite(hdr))
    assert 0.0 <= display.min() and display.max() <= 1.0 + 1e-5
    assert hdr.sum() > 0


def test_fused_frame_without_denoiser():
    b = SceneBuilder()
    b.add_point_light((W / 2, W / 2), radius=1.0, bounces=1)
    b.add_rect((W / 2, W / 2), (W, W), log_density=-1.0)
    scene = b.build(max_lights=1, max_shapes=1)
    gb = rasterize(scene, W, W)
    brdf = jnp.asarray(luts.brdf_lut((16, 5, 3)))
    fields = rbt.precompute_rotated_fields(gb, n_bins=32)
    cfg = PipelineConfig(n_photons=1024, max_bounces=1, denoise=False, tonemap="uchimura")
    frame = make_frame_fn(cfg, gb, scene.lights, scene.field_textures, brdf, fields)
    src, display, hdr = frame(rbt.zero_sources(fields), jnp.float32(1.0), jax.random.key(0))
    assert np.all(np.isfinite(np.asarray(display)))
