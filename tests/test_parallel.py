import jax
import jax.numpy as jnp
import numpy as np
import pytest

from litbox_tpu.core import luts
from litbox_tpu.parallel import make_mesh, sharded_trace_frame
from litbox_tpu.scene import SceneBuilder, rasterize

W = 32


@pytest.fixture(scope="module")
def setup():
    b = SceneBuilder()
    b.add_point_light((W / 2, W / 2), radius=1.0, bounces=1)
    b.add_rect((W / 2, W / 2), (W, W), log_density=-1.0)
    scene = b.build(max_lights=1, max_shapes=1)
    gb = rasterize(scene, W, W)
    brdf = jnp.asarray(luts.brdf_lut((16, 5, 3)))
    return scene, gb, brdf


def test_mesh_shapes():
    mesh = make_mesh(8, ensemble=2)
    assert mesh.shape == {"ensemble": 2, "data": 4}


def test_sharded_trace_runs_and_reduces(setup):
    scene, gb, brdf = setup
    mesh = make_mesh(8, ensemble=2)
    raw, writes = sharded_trace_frame(
        mesh, gb, scene.lights, scene.field_textures, brdf,
        jax.random.key(0), 512, 3.2, jnp.int32(1), max_bounces=1)
    raw = np.asarray(raw)
    assert raw.shape == (2, W, W, 3)
    assert np.all(np.isfinite(raw)) and raw.sum() > 0
    # Ensemble members are independent estimates.
    assert np.abs(raw[0] - raw[1]).max() > 0
    assert int(writes[0]) > 0 and int(writes[1]) > 0


def test_sharded_matches_single_device_statistically(setup):
    scene, gb, brdf = setup
    from litbox_tpu.sim.oracle import trace_frame

    mesh = make_mesh(4, ensemble=1)
    raw_m, _ = sharded_trace_frame(
        mesh, gb, scene.lights, scene.field_textures, brdf,
        jax.random.key(1), 4096, 3.2, jnp.int32(1), max_bounces=1)
    raw_s, _ = trace_frame(gb, scene.lights, scene.field_textures, brdf,
                           jax.random.key(2), 16384, 3.2, jnp.int32(1),
                           max_bounces=1)
    a, b = np.asarray(raw_m)[0].sum(), np.asarray(raw_s).sum()
    assert abs(a / b - 1) < 0.05, (a, b)
