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
