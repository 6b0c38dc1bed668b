import jax
import jax.numpy as jnp
import numpy as np

from litbox_tpu.core import luts
from litbox_tpu.scene import SceneBuilder, rasterize
from litbox_tpu.sim.backward import backward_gather
from litbox_tpu.sim.legacy_integrators import implicit_free_flight

W = 32
TEARDROP = jnp.asarray(luts.teardrop_scattering_lut(3.0))


def _gb(log_density=-1.0):
    b = SceneBuilder()
    b.add_point_light((W / 2, W / 2), radius=1.0)
    b.add_rect((W / 2, W / 2), (W, W), color=(0.8, 0.8, 0.8, 1), log_density=log_density)
    return rasterize(b.build(max_lights=1, max_shapes=1), W, W)


def test_backward_zero_radiance_gives_zero():
    gb = _gb()
    out = backward_gather(gb, jnp.zeros((W, W, 3)), TEARDROP, jax.random.key(0), 3.2)
    assert float(jnp.abs(out).max()) == 0.0


def test_backward_vacuum_outscatter_masks_output():
    b = SceneBuilder()
    b.add_point_light((W / 2, W / 2), radius=1.0)
    gb = rasterize(b.build(max_lights=1, max_shapes=1), W, W)  # no medium
    hdr = jnp.ones((W, W, 3))
    out = backward_gather(gb, hdr, TEARDROP, jax.random.key(0), 3.2)
    assert float(jnp.abs(out).max()) == 0.0  # (1 - T) == 0 everywhere


def test_backward_adds_indirect_above_direct():
    gb = _gb()
    hdr = jnp.ones((W, W, 3))
    samples = [np.asarray(backward_gather(gb, hdr, TEARDROP, jax.random.key(i), 3.2))
               for i in range(8)]
    mean = np.mean(samples, axis=0)
    t = np.asarray(gb.transmissibility)
    direct = 1.0 * (1 - t)[..., None]
    # Gathered term is nonnegative -> accumulated output exceeds the direct
    # term, and is finite.
    assert np.all(np.isfinite(mean))
    inner = mean[8:-8, 8:-8]
    assert (inner > direct[8:-8, 8:-8] * 0.999).mean() > 0.95
    assert inner.mean() > direct[8:-8, 8:-8].mean() * 1.05


def test_implicit_free_flight_distribution():
    """Mean free path in a uniform medium matches -1/ln(t) texels."""
    gb = _gb(log_density=-0.7)
    t = float(np.asarray(gb.transmissibility)[W // 2, W // 2])
    n = 4096
    origin = jnp.tile(jnp.array([[2.0, W / 2.0]]), (n, 1))
    direction = jnp.tile(jnp.array([[1.0, 0.0]]), (n, 1))
    hit_pos, hit = implicit_free_flight(gb.transmissibility, origin, direction,
                                        jax.random.key(0), max_steps=64)
    hits = np.asarray(hit)
    dist = np.asarray(hit_pos[:, 0] - 2.0)[hits]
    # Geometric distribution with survival t: mean steps = t/(1-t).
    expected = t / (1 - t)
    assert abs(dist.mean() / expected - 1) < 0.15, (dist.mean(), expected)
