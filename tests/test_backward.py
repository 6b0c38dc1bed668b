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


def test_backward_rbt_matches_oracle_march():
    """A full bin-ladder cycle of the RBT backward gather must agree with
    the converged per-pixel lobed march (same uniform direction average)."""
    from litbox_tpu.sim import rbt
    from litbox_tpu.sim.backward import backward_bin_for_frame, backward_gather_rbt

    gb = _gb(log_density=-1.0)
    rng = np.random.default_rng(0)
    hdr = jnp.asarray(rng.uniform(0.2, 1.0, (W, W, 3)).astype(np.float32))
    fields = rbt.precompute_rotated_fields(gb, n_bins=64)

    d = fields.n_bins
    acc = np.zeros((W, W, 3))
    for f in range(d):
        b = backward_bin_for_frame(f, d)
        acc += np.asarray(backward_gather_rbt(fields, gb, hdr, jnp.int32(b)))
    a = acc / d

    frames = 96
    acc_o = np.zeros((W, W, 3))
    for f in range(frames):
        acc_o += np.asarray(backward_gather(gb, hdr, TEARDROP,
                                            jax.random.key(100 + f), 3.2))
    o = acc_o / frames

    # Compare interiors (edge rays differ by the half-texel march
    # convention and the oracle's finite escape clamp).
    ai, oi = a[6:-6, 6:-6], o[6:-6, 6:-6]
    assert abs(ai.sum() / oi.sum() - 1) < 0.1, (ai.sum(), oi.sum())
    rel = np.abs(ai - oi) / (oi + 1e-3)
    assert np.median(rel) < 0.15, float(np.median(rel))


def test_backward_rbt_block_invariance():
    """The block-rebased stabilization is exact: different block sizes
    (which shift pairs between the within-block and cross-block paths)
    must produce the same field to f32 tolerance."""
    from litbox_tpu.sim import rbt
    from litbox_tpu.sim.backward import backward_gather_rbt

    gb = _gb(log_density=-0.7)
    rng = np.random.default_rng(1)
    hdr = jnp.asarray(rng.uniform(0.0, 2.0, (W, W, 3)).astype(np.float32))
    fields = rbt.precompute_rotated_fields(gb, n_bins=32)
    a = np.asarray(backward_gather_rbt(fields, gb, hdr, jnp.int32(5), block=128))
    b = np.asarray(backward_gather_rbt(fields, gb, hdr, jnp.int32(5), block=32))
    c = np.asarray(backward_gather_rbt(fields, gb, hdr, jnp.int32(5), block=16))
    np.testing.assert_allclose(a, b, rtol=2e-4, atol=1e-5)
    np.testing.assert_allclose(a, c, rtol=2e-4, atol=1e-5)


def test_backward_rbt_zero_radiance_gives_zero():
    from litbox_tpu.sim import rbt
    from litbox_tpu.sim.backward import backward_gather_rbt

    gb = _gb()
    fields = rbt.precompute_rotated_fields(gb, n_bins=64)
    out = backward_gather_rbt(fields, gb, jnp.zeros((W, W, 3)), jnp.int32(3))
    assert float(jnp.abs(out).max()) == 0.0


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


def test_hybrid_forward_refresh_amortization(monkeypatch):
    """HybridTracer resolves the forward lightmap only every K frames; the
    backward gather reuses the cached HDR in between (the per-frame resolve
    is the dominant TPU cost of the hybrid strategy)."""
    import litbox_tpu.sim.tracers as tracers_mod
    from litbox_tpu.scene import SceneBuilder
    from litbox_tpu.scene.gbuffer import rasterize

    b = SceneBuilder()
    b.add_point_light((16, 16), radius=3, intensity=1.0)
    b.add_rect((24, 20), (8, 6), color=(1, 1, 1, 1), log_density=-0.8)
    scene = b.build()
    gb = rasterize(scene, W, W)

    calls = {"n": 0}
    real = tracers_mod.resolve_raw

    def counting(*a, **k):
        calls["n"] += 1
        return real(*a, **k)

    monkeypatch.setattr(tracers_mod, "resolve_raw", counting)
    t = tracers_mod.HybridTracer(forward_refresh_interval=4)
    t.forward.n_bins = 16
    t.forward.rays_to_emit = 2048
    t.gbuffer = gb
    t.new_scene()
    for i in range(8):
        t.begin_trace(scene, jax.random.key(2 * i))
        t.end_trace(None, jax.random.key(2 * i + 1))
    # frames 0 and 4 resolve; 6 frames reuse the cache
    assert calls["n"] == 2, calls["n"]
    assert t.tracer_output.shape == (W, W, 3)


def test_backward_bin_ladder_coprime_any_n():
    """The bin ladder must visit EVERY bin for any n_bins — including ones
    sharing factors with both the base stride and its old +2 fallback
    (329 = 7 * 47: gcd(47,329)=47 and gcd(49,329)=7 would each visit only a
    subset and bias the gather to a direction-fan subset)."""
    from litbox_tpu.sim.backward import backward_bin_for_frame

    for n in (64, 128, 141, 329, 47 * 49):
        visited = {backward_bin_for_frame(f, n) for f in range(n)}
        assert len(visited) == n, (n, len(visited))
