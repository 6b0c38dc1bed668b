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


@pytest.fixture(scope="module")
def rbt_setup():
    from litbox_tpu.sim import rbt

    b = SceneBuilder()
    b.add_point_light((W / 2, W / 2), radius=1.0, bounces=1)
    b.add_rect((W / 2, W / 2), (W, W), log_density=-1.0)
    scene = b.build(max_lights=1, max_shapes=1)
    gb = rasterize(scene, W, W)
    brdf = jnp.asarray(luts.brdf_lut((16, 5, 3)))
    fields = rbt.precompute_rotated_fields(gb, n_bins=32)
    return scene, gb, brdf, fields


def test_sharded_rbt_trace_and_resolve(rbt_setup):
    from litbox_tpu.parallel import (
        sharded_rbt_resolve, sharded_rbt_trace_frame, zero_sources_sharded)

    scene, gb, brdf, fields = rbt_setup
    mesh = make_mesh(8, ensemble=2)
    src = zero_sources_sharded(mesh, fields)
    for f in range(2):
        src, n = sharded_rbt_trace_frame(
            mesh, fields, src, gb, scene.lights, scene.field_textures, brdf,
            jax.random.fold_in(jax.random.key(0), f), 1024, jnp.int32(1),
            max_bounces=1, mc_direct=True, analytic_direct=False)
    raw = np.asarray(sharded_rbt_resolve(mesh, fields, src, W, W))
    assert raw.shape == (2, W, W, 3)
    assert np.all(np.isfinite(raw)) and raw.sum() > 0
    # Ensemble members are independent estimates; data shards were combined.
    assert np.abs(raw[0] - raw[1]).max() > 0
    assert int(n[0]) == 4 * 1024  # psum over the 4-wide data axis


def test_sharded_rbt_matches_single_device_statistically(rbt_setup):
    """Mean of per-device resolves == resolve of a single device's estimate
    (up to MC noise): validates energy normalization across the mesh."""
    from litbox_tpu.parallel import (
        sharded_rbt_resolve, sharded_rbt_trace_frame, zero_sources_sharded)
    from litbox_tpu.sim import rbt

    scene, gb, brdf, fields = rbt_setup
    mesh = make_mesh(4, ensemble=1)
    src = zero_sources_sharded(mesh, fields)
    src, _ = sharded_rbt_trace_frame(
        mesh, fields, src, gb, scene.lights, scene.field_textures, brdf,
        jax.random.key(3), 4096, jnp.int32(1), max_bounces=1,
        mc_direct=True, analytic_direct=False)
    raw_m = np.asarray(sharded_rbt_resolve(mesh, fields, src, W, W))[0]

    src_s = rbt.zero_sources(fields)
    src_s, _ = rbt.rbt_trace_frame(
        fields, src_s, gb, scene.lights, scene.field_textures, brdf,
        jax.random.key(4), 16384, jnp.int32(1), max_bounces=1,
        mc_direct=True, analytic_direct=False)
    raw_s = np.asarray(rbt.resolve_raw(fields, src_s, W, W))
    a, b = raw_m.sum(), raw_s.sum()
    assert abs(a / b - 1) < 0.05, (a, b)
