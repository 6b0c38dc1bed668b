"""RBT engine validation: physics closed-form + agreement with the oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from litbox_tpu.core import luts
from litbox_tpu.scene import SceneBuilder, rasterize
from litbox_tpu.sim import rbt
from litbox_tpu.sim.oracle import trace_frame

W = 64
DENSITY_LOG = -1.3


@pytest.fixture(scope="module")
def setup():
    b = SceneBuilder()
    b.add_point_light((W / 2, W / 2), radius=0.5, color=(1, 1, 1), intensity=1.0, bounces=1)
    b.add_rect((W / 2, W / 2), (W, W), color=(1, 1, 1, 1), log_density=DENSITY_LOG)
    scene = b.build(max_lights=2, max_shapes=2)
    gb = rasterize(scene, W, W)
    brdf = jnp.asarray(luts.brdf_lut((32, 9, 4)))
    fields = rbt.precompute_rotated_fields(gb, n_bins=64)
    return scene, gb, brdf, fields


def _rbt_raw(scene, gb, brdf, fields, key, n=16384, frames=4, bounces=1):
    src = rbt.zero_sources(fields)
    for f in range(frames):
        src, _ = rbt.rbt_trace_frame(fields, src, gb, scene.lights,
                                     scene.field_textures, brdf,
                                     jax.random.fold_in(key, f), n,
                                     jnp.int32(bounces), max_bounces=bounces)
    raw = rbt.resolve_raw(fields, src, W, W)
    return np.asarray(raw) / frames


def test_rotated_fields_shapes(setup):
    _, gb, _, fields = setup
    assert fields.trans.shape == fields.cum_log.shape
    assert fields.trans.shape[0] == 64
    # Rows are non-increasing in cumulative log-transmissibility.
    c = np.asarray(fields.cum_log)
    assert np.all(np.diff(c, axis=-1) <= 1e-5)
    # Transmissibility within (0, 1].
    t = np.asarray(fields.trans)
    assert t.min() > 0 and t.max() <= 1.0 + 1e-6


def test_rbt_matches_closed_form(setup):
    """Same annulus-profile law the oracle satisfies (test_oracle_physics)."""
    scene, gb, brdf, fields = setup
    raw = _rbt_raw(scene, gb, brdf, fields, jax.random.key(0))
    t_texel = (1 - 10**DENSITY_LOG) ** (100 / W)
    ys, xs = np.mgrid[0:W, 0:W]
    r = np.hypot(xs + 0.5 - W / 2, ys + 0.5 - W / 2)
    expected = W * W * t_texel**r / (4 * np.pi**2 * np.maximum(r, 1e-3))
    lum = raw.mean(-1)
    for r0, r1 in [(8, 12), (14, 18), (20, 24)]:
        m = (r >= r0) & (r < r1)
        ratio = lum[m].mean() / expected[m].mean()
        assert abs(ratio - 1.0) < 0.08, (r0, r1, ratio)


def test_rbt_agrees_with_oracle(setup):
    """Converged RBT ~= converged oracle up to angular-bin blur: compare
    4x-downsampled fields."""
    scene, gb, brdf, fields = setup
    raw_rbt = _rbt_raw(scene, gb, brdf, fields, jax.random.key(1),
                       n=16384, frames=3, bounces=2)
    acc = np.zeros((W, W, 3))
    for f in range(3):
        r, _ = trace_frame(gb, scene.lights, scene.field_textures, brdf,
                           jax.random.fold_in(jax.random.key(2), f), 16384,
                           float(0.1 * W), jnp.int32(2), max_bounces=2)
        acc += np.asarray(r)
    raw_oracle = acc / 3

    def down(x):
        return x.reshape(W // 4, 4, W // 4, 4, 3).mean((1, 3))

    a, b = down(raw_rbt), down(raw_oracle)
    # Total energy within 8%: RBT uses the continuous half-source-cell
    # attenuation convention while the oracle applies the full source texel
    # (see attenuation_scan docstring) — a ~t_texel^0.5 systematic offset.
    assert abs(a.sum() / b.sum() - 1) < 0.08, (a.sum(), b.sum())
    # Pointwise agreement on the downsampled field where signal is strong.
    mask = b.mean(-1) > np.percentile(b.mean(-1), 60)
    rel = np.abs(a.mean(-1) - b.mean(-1))[mask] / b.mean(-1)[mask]
    assert np.median(rel) < 0.15, float(np.median(rel))


def test_rbt_shadow_cast(setup):
    """An opaque blocker between light and a probe region must cast a shadow."""
    b = SceneBuilder()
    b.add_point_light((W / 4, W / 2), radius=1.0, bounces=1)
    b.add_rect((W / 2, W / 2), (1.5, 6), color=(1, 1, 1, 1), log_density=0.0)
    b.add_rect((W / 2, W / 2), (W, W), color=(1, 1, 1, 1), log_density=-1.6)
    scene = b.build(max_lights=1, max_shapes=3)
    gb = rasterize(scene, W, W)
    brdf = jnp.asarray(luts.brdf_lut((16, 5, 3)))
    fields = rbt.precompute_rotated_fields(gb, n_bins=64)
    raw = _rbt_raw(scene, gb, brdf, fields, jax.random.key(3), n=16384, frames=2)
    lum = raw.mean(-1)
    lit = lum[W // 2 - 2:W // 2 + 2, W // 4 + 4:W // 2 - 4].mean()   # before blocker
    shadow = lum[W // 2 - 1:W // 2 + 1, W // 2 + 6:W - 8].mean()     # behind blocker
    assert shadow < lit * 0.15, (lit, shadow)


def test_rbt_phase_jitter_unbiased(setup):
    """A jittered bin phase must preserve the closed-form radial profile:
    fields at phase p transport the same energy, rotated by p*2pi/D."""
    scene, gb, brdf, _ = setup
    acc = np.zeros((W, W, 3))
    frames = 4
    for f in range(frames):
        phase = jax.random.uniform(jax.random.fold_in(jax.random.key(7), f))
        fields = rbt.precompute_rotated_fields(gb, n_bins=64, phase=phase)
        src = rbt.zero_sources(fields)
        src, _ = rbt.rbt_trace_frame(fields, src, gb, scene.lights,
                                     scene.field_textures, brdf,
                                     jax.random.fold_in(jax.random.key(8), f),
                                     16384, jnp.int32(1), max_bounces=1)
        acc += np.asarray(rbt.resolve_raw(fields, src, W, W, traced_phase=True))
    raw = acc / frames
    t_texel = (1 - 10**DENSITY_LOG) ** (100 / W)
    ys, xs = np.mgrid[0:W, 0:W]
    r = np.hypot(xs + 0.5 - W / 2, ys + 0.5 - W / 2)
    expected = W * W * t_texel**r / (4 * np.pi**2 * np.maximum(r, 1e-3))
    lum = raw.mean(-1)
    for r0, r1 in [(8, 12), (14, 18), (20, 24)]:
        m = (r >= r0) & (r < r1)
        ratio = lum[m].mean() / expected[m].mean()
        assert abs(ratio - 1.0) < 0.08, (r0, r1, ratio)


def test_rbt_hist_fast_path_matches_generic(setup):
    """The all-point-light fast path (stamp-histogram direct injection +
    direction-stratified one-hot flight) must agree statistically with the
    generic scatter path: same converged field, same total energy."""
    scene, gb, brdf, fields = setup

    def run(hist, key):
        src = rbt.zero_sources(fields)
        for f in range(3):
            src, n = rbt.rbt_trace_frame(
                fields, src, gb, scene.lights, scene.field_textures, brdf,
                jax.random.fold_in(key, f), 16384, jnp.int32(2),
                max_bounces=2, mc_direct=True, analytic_direct=False,
                light_kinds=(1,) if hist else None, hist_direct=hist)
        assert int(n) == 16384
        return np.asarray(rbt.resolve_raw(fields, src, W, W)) / 3

    a = run(True, jax.random.key(40))
    b = run(False, jax.random.key(41))
    assert abs(a.sum() / b.sum() - 1) < 0.03, (a.sum(), b.sum())
    mask = b.mean(-1) > np.percentile(b.mean(-1), 70)
    rel = np.abs(a.mean(-1) - b.mean(-1))[mask] / b.mean(-1)[mask]
    assert np.median(rel) < 0.12, float(np.median(rel))


def test_rbt_stratified_multi_light():
    """Fast path with two point lights of different colors/intensities:
    per-light energy normalization must hold (light split is proportional
    to luminance; each light's photons carry total_l/rays_l)."""
    b = SceneBuilder()
    b.add_point_light((W / 4, W / 2), radius=0.5, color=(1, 0, 0),
                      intensity=1.0, bounces=1)
    b.add_point_light((3 * W / 4, W / 2), radius=0.5, color=(0, 0, 1),
                      intensity=2.0, bounces=1)
    b.add_rect((W / 2, W / 2), (W, W), color=(1, 1, 1, 1), log_density=-1.3)
    scene = b.build(max_lights=2, max_shapes=2)
    gb = rasterize(scene, W, W)
    brdf = jnp.asarray(luts.brdf_lut((16, 5, 3)))
    fields = rbt.precompute_rotated_fields(gb, n_bins=64)

    def run(hist, key):
        src = rbt.zero_sources(fields)
        src, _ = rbt.rbt_trace_frame(
            fields, src, gb, scene.lights, scene.field_textures, brdf,
            key, 32768, jnp.int32(1), max_bounces=1,
            mc_direct=True, analytic_direct=False,
            light_kinds=(1,) if hist else None, hist_direct=hist)
        return np.asarray(rbt.resolve_raw(fields, src, W, W))

    a = run(True, jax.random.key(50))
    g = run(False, jax.random.key(51))
    # Per-channel totals: red light (I=1) vs blue light (I=4x energy).
    for c in (0, 2):
        assert abs(a[..., c].sum() / g[..., c].sum() - 1) < 0.05, c
    assert a[..., 1].sum() < 1e-3 * a[..., 2].sum()  # no green anywhere


def test_rbt_bounce_culling_unbiased(setup):
    """Russian-roulette culling after wave 0 (cull-before-material-gather)
    must preserve total deposited energy in expectation."""
    scene, gb, brdf, fields = setup

    def total(bounce_photons, key):
        src = rbt.zero_sources(fields)
        src, _ = rbt.rbt_trace_frame(
            fields, src, gb, scene.lights, scene.field_textures, brdf,
            key, 16384, jnp.int32(2), max_bounces=2,
            mc_direct=True, analytic_direct=False,
            bounce_photons=bounce_photons)
        return float(np.asarray(rbt.resolve_raw(fields, src, W, W)).sum())

    full = np.mean([total(0, jax.random.key(20 + i)) for i in range(2)])
    culled = np.mean([total(4096, jax.random.key(30 + i)) for i in range(2)])
    assert abs(culled / full - 1) < 0.05, (full, culled)


def test_exact_collimated_matches_mc_laser():
    """The exact-direction laser wave-0 field (one-bin rotated scan at the
    laser's true angle) must match the converged MC direct deposits when
    the laser direction coincides with a bin angle (so the MC path's
    angular quantization is exact too)."""
    import numpy as np

    from litbox_tpu.core import luts
    from litbox_tpu.scene import SceneBuilder, rasterize
    from litbox_tpu.sim import rbt

    w = 64
    b = SceneBuilder()
    # rotation pi/2 -> direction (sin, -cos) = (+1, 0): exactly bin 0
    b.add_laser_light((8, w / 2), (6, 1), rotation=np.pi / 2,
                      color=(1.0, 0.8, 0.5), intensity=1.2, bounces=1)
    b.add_rect((w / 2, w / 2), (w, w), color=(1, 1, 1, 1), log_density=-1.3)
    scene = b.build()
    gb = rasterize(scene, w, w)
    brdf = jnp.asarray(luts.brdf_lut((16, 5, 3)))
    fields = rbt.precompute_rotated_fields(gb, n_bins=64)

    exact = np.asarray(rbt.collimated_direct_raw(gb, scene.lights, w, w))
    assert exact is not None and np.isfinite(exact).all()

    frames = 60
    rays = 8192
    src = rbt.zero_sources(fields)
    for f in range(frames):
        src, _ = rbt.rbt_trace_frame(
            fields, src, gb, scene.lights, scene.field_textures, brdf,
            jax.random.key(f), rays, jnp.int32(-1), max_bounces=1,
            analytic_direct=False, mc_direct=True, exact_collimated=False)
    mc = np.asarray(rbt.resolve_raw(fields, src, w, w)) / frames

    # Total deposited energy agrees.
    assert abs(exact.sum() / mc.sum() - 1.0) < 0.05, (exact.sum(), mc.sum())
    # Pointwise agreement in the energetic region (top decile of the beam).
    thresh = np.percentile(mc.sum(-1), 97)
    sel = mc.sum(-1) > thresh
    rel = np.abs(exact[sel] - mc[sel]) / (mc[sel] + 1e-4)
    assert np.median(rel) < 0.15, float(np.median(rel))


def test_exact_collimated_energy_on_empty_field():
    """In vacuum no energy out-scatters: the raw field carries the beam's
    in-flight energy (like the MC deposits), but the HDR output (which
    applies the 1-t outscatter factor, to_hdr) must be ~zero."""
    import numpy as np

    from litbox_tpu.scene import SceneBuilder, rasterize
    from litbox_tpu.sim import rbt
    from litbox_tpu.sim.oracle import to_hdr

    w = 48
    b = SceneBuilder()
    b.add_laser_light((8, w / 2), (4, 1), rotation=np.pi / 2, intensity=1.0,
                      bounces=1)
    scene = b.build()
    gb = rasterize(scene, w, w)
    exact = rbt.collimated_direct_raw(gb, scene.lights, w, w)
    assert float(jnp.abs(exact).sum()) > 0.0  # beam energy is in flight
    hdr = np.asarray(to_hdr(exact, jnp.float32(1.0), gb))
    assert float(np.abs(hdr).max()) < 1e-4


def test_exact_collimated_directional_matches_mc():
    """Directional lights are collimated too (ForwardMonteCarlo.compute:282-
    294): the exact wave-0 field (one-bin rotated scan on an enlarged field
    containing the out-of-frame entry segment) must agree with converged MC
    direct deposits when the direction coincides with a bin angle."""
    w = 48
    b = SceneBuilder()
    # rotation pi/2 -> direction (+1, 0): exactly bin 0 of the fan.
    b.add_directional_light(rotation=np.pi / 2, color=(1.0, 0.7, 0.4),
                            intensity=1.1, bounces=1)
    b.add_rect((w / 2, w / 2), (w, w), color=(1, 1, 1, 1), log_density=-1.3)
    scene = b.build()
    gb = rasterize(scene, w, w)
    brdf = jnp.asarray(luts.brdf_lut((16, 5, 3)))
    fields = rbt.precompute_rotated_fields(gb, n_bins=64)

    exact = np.asarray(rbt.collimated_direct_raw(gb, scene.lights, w, w))
    assert np.isfinite(exact).all() and exact.sum() > 0

    frames, rays = 40, 16384
    src = rbt.zero_sources(fields)
    for f in range(frames):
        src, _ = rbt.rbt_trace_frame(
            fields, src, gb, scene.lights, scene.field_textures, brdf,
            jax.random.key(f), rays, jnp.int32(-1), max_bounces=1,
            analytic_direct=False, mc_direct=True, exact_collimated=False)
    mc = np.asarray(rbt.resolve_raw(fields, src, w, w)) / frames

    # Total deposited energy inside the frame agrees.
    assert abs(exact.sum() / mc.sum() - 1.0) < 0.07, (exact.sum(), mc.sum())
    # Pointwise agreement away from the entry column (MC origins carry
    # one-texel discretization at the boundary).
    sel = np.zeros((w, w), bool)
    sel[4:-4, 4:-4] = True
    rel = np.abs(exact[sel] - mc[sel]) / (mc[sel] + 1e-4)
    assert np.median(rel) < 0.15, float(np.median(rel))


def test_directional_exact_closed_form():
    """A +x directional light through a uniform slab: per-column deposits
    decay as t_texel^x, and mid-frame rows are uniform in y (no D-bin fan —
    the artifact the exact-direction path exists to kill)."""
    w = 48
    density_log = -1.3
    b = SceneBuilder()
    b.add_directional_light(rotation=np.pi / 2, intensity=1.0, bounces=1)
    b.add_rect((w / 2, w / 2), (w, w), color=(1, 1, 1, 1), log_density=density_log)
    scene = b.build()
    gb = rasterize(scene, w, w)
    exact = np.asarray(rbt.collimated_direct_raw(gb, scene.lights, w, w))
    lum = exact.mean(-1)

    t_texel = (1 - 10**density_log) ** (100 / w)
    cols = lum[w // 4: -w // 4, :].mean(0)
    ratio = cols[12:36][1:] / cols[12:36][:-1]
    assert np.allclose(ratio, t_texel, atol=0.02), (ratio.mean(), t_texel)
    # No fan: every interior row carries the same profile.
    rows = lum[8:-8, 12:36]
    spread = rows.std(0) / rows.mean(0)
    assert float(spread.max()) < 0.03, float(spread.max())


def test_collimated_mask_respects_override():
    """collimated/analytic masks fold in Simulation.photon_bounces: with an
    override of 0 nothing may deposit (ADVICE round 1, tracers.py:176)."""
    w = 32
    b = SceneBuilder()
    b.add_laser_light((8, w / 2), (4, 1), rotation=np.pi / 2, intensity=1.0,
                      bounces=2)
    b.add_point_light((w / 2, w / 2), radius=1.0, intensity=1.0, bounces=2)
    scene = b.build()
    assert np.asarray(rbt.collimated_light_mask(scene.lights)).any()
    assert not np.asarray(rbt.collimated_light_mask(scene.lights, 0)).any()
    assert np.asarray(rbt.collimated_light_mask(scene.lights, 3)).any()
    assert np.asarray(rbt.analytic_light_mask(scene.lights)).any()
    assert not np.asarray(rbt.analytic_light_mask(scene.lights, 0)).any()
    gb = rasterize(scene, w, w)
    assert rbt.collimated_direct_raw(gb, scene.lights, w, w, 0) is None


def test_rbt_integrator_exact_collimated_wiring():
    """Integration-level check of the exact-collimated path through
    RBTForwardIntegrator (ADVICE round 1 item 5): accumulated output_hdr
    with exact_collimated=True matches the exact_collimated=False converged
    result, and override_bounce_count=0 suppresses ALL output."""
    from litbox_tpu.sim.tracers import RBTForwardIntegrator

    w = 48

    def make_scene():
        b = SceneBuilder()
        b.add_laser_light((8, w / 2), (6, 1), rotation=np.pi / 2,
                          color=(1.0, 0.8, 0.5), intensity=1.2, bounces=1)
        b.add_rect((w / 2, w / 2), (w, w), color=(1, 1, 1, 1), log_density=-1.3)
        return b.build()

    scene = make_scene()
    gb = rasterize(scene, w, w)

    def run(exact, frames, rays, override=None):
        t = RBTForwardIntegrator(n_bins=64)
        t.gbuffer = gb
        t.rays_to_emit = rays
        t.max_bounces = 1
        t.analytic_direct = False
        t.exact_collimated = exact
        t.override_bounce_count = override
        for f in range(frames):
            t.integrate(scene, jax.random.key(f))
        return np.asarray(t.output_hdr)

    hdr_exact = run(True, frames=2, rays=256)
    hdr_mc = run(False, frames=40, rays=16384)
    assert hdr_exact.sum() > 0
    sel = hdr_mc.sum(-1) > np.percentile(hdr_mc.sum(-1), 97)
    rel = np.abs(hdr_exact[sel] - hdr_mc[sel]) / (hdr_mc[sel] + 1e-5)
    assert np.median(rel) < 0.2, float(np.median(rel))

    # Simulation-level bounce override of 0 suppresses the exact field too.
    assert float(np.abs(run(True, frames=2, rays=256, override=0)).max()) == 0.0


def test_jitter_ladder_memory_budget_clamps():
    """The phase-ladder length respects jitter_memory_budget; a tiny budget
    degrades to a shorter ladder (never below 1), a huge one keeps K."""
    from litbox_tpu.sim.tracers import RBTForwardIntegrator

    w = 64
    b = SceneBuilder()
    b.add_point_light((w / 2, w / 2), radius=1.0, intensity=1.0, bounces=1)
    scene = b.build()
    gb = rasterize(scene, w, w)

    t = RBTForwardIntegrator(n_bins=32)
    t.gbuffer = gb
    t.jitter_bins = True
    assert t._effective_jitter_phases(gb) == t.jitter_phases
    t.jitter_memory_budget = 2 * (5.0 + 1 / 16) * 32 * 128 * 128 * 4.0
    assert t._effective_jitter_phases(gb) == 2
    t.jitter_memory_budget = 1.0
    assert t._effective_jitter_phases(gb) == 1
    # And the ladder actually runs at the clamped length.
    t.jitter_memory_budget = 2 * (5.0 + 1 / 16) * 32 * 128 * 128 * 4.0
    t.rays_to_emit = 512
    t.max_bounces = 1
    for f in range(4):
        t.integrate(scene, jax.random.key(f))
    assert set(t._phase_src) == {0, 1}


def test_resolve_group_partition(setup):
    """Sum of group resolves == full resolve (the reduction is merely
    partitioned over bins; per-bin math identical)."""
    scene, gb, brdf, fields = setup
    src = rbt.zero_sources(fields)
    src, _ = rbt.rbt_trace_frame(fields, src, gb, scene.lights,
                                 scene.field_textures, brdf,
                                 jax.random.key(3), 8192, jnp.int32(1),
                                 max_bounces=1)
    full = np.asarray(rbt.resolve_raw(fields, src, W, W))
    for k in (2, 4):
        parts = sum(np.asarray(rbt.resolve_raw(fields, src, W, W,
                                               group=t, n_groups=k))
                    for t in range(k))
        np.testing.assert_allclose(parts, full, rtol=2e-5, atol=1e-6)


def test_grouped_display_matches_full(setup):
    """RBTForwardIntegrator with resolve_groups=K: once the group cache is
    warm, the composed display equals the full-resolve output (deposits are
    deterministic under analytic direct lighting, so every cached group
    rate is exact)."""
    from litbox_tpu.sim.tracers import RBTForwardIntegrator

    scene, gb, brdf, fields = setup
    K = 4

    def run(groups):
        integ = RBTForwardIntegrator(n_bins=64)
        integ.resolve_groups = groups
        integ.gbuffer = gb
        integ.rays_to_emit = 2048
        integ.max_bounces = 1
        integ.override_bounce_count = 1
        integ._brdf = brdf
        key = jax.random.key(5)
        outs = []
        for f in range(2 * K):
            integ.integrate(scene, jax.random.fold_in(key, f))
            outs.append(np.asarray(integ.display_hdr))
        return outs

    grouped = run(K)
    full = run(1)
    # Warm cache (>= K frames in): same image up to the MC-bounce noise
    # difference of group rates cached at earlier iteration counts (the
    # analytic direct component is deterministic and cancels exactly).
    np.testing.assert_allclose(grouped[-1], full[-1], rtol=2e-2, atol=1e-6)
    # Warm-up frames are brightness-corrected: total luminance within 40%
    # of the full resolve from the very first frame.
    l0 = grouped[0].sum() / max(full[0].sum(), 1e-9)
    assert 0.6 < l0 < 1.7, l0


def test_output_hdr_exact_under_groups(setup):
    """output_hdr (convergence/dataset consumer) is the exact full resolve
    regardless of resolve_groups; only display_hdr uses the grouped
    composition."""
    from litbox_tpu.sim.tracers import RBTForwardIntegrator

    scene, gb, brdf, fields = setup

    def make(groups):
        integ = RBTForwardIntegrator(n_bins=64)
        integ.resolve_groups = groups
        integ.gbuffer = gb
        integ.rays_to_emit = 2048
        integ.max_bounces = 1
        integ.override_bounce_count = 1
        integ._brdf = brdf
        return integ

    a, b = make(4), make(1)
    for f in range(2):
        a.integrate(scene, jax.random.fold_in(jax.random.key(9), f))
        b.integrate(scene, jax.random.fold_in(jax.random.key(9), f))
    np.testing.assert_allclose(np.asarray(a.output_hdr),
                               np.asarray(b.output_hdr), rtol=1e-6)


def test_resolve_groups_setter():
    """Setter validates divisibility against n_bins and resets the cached
    group partials when the partition changes (ADVICE round 2)."""
    import pytest

    from litbox_tpu.sim.tracers import RBTForwardIntegrator

    integ = RBTForwardIntegrator(n_bins=64)
    with pytest.raises(ValueError):
        integ.resolve_groups = 3  # 64 % 3 != 0
    with pytest.raises(ValueError):
        integ.resolve_groups = 0
    integ.resolve_groups = 4
    integ._group_rate[(0, None, 0)] = "stale"
    integ._group_sum[0] = "stale"
    integ._group_next[0] = 7
    integ.resolve_groups = 8  # partition changed -> caches reset
    # Grouped state is per-tracer dicts since the r5 tracer axis.
    assert integ._group_rate == {} and integ._group_sum == {}
    assert integ._group_next == {} and integ._group_display == {}


# ---------- native tracer axis (round 5: rbt_trace_frame n_tracers) ----------


def test_resolve_tracer_offset_exact(setup):
    """resolve_raw(tracer=t) on a tracer-major (T*D, S, S) source buffer
    equals resolving that tracer's block alone — exactly (the TPU path is
    pure BlockSpec index arithmetic; the generic path slices)."""
    _, _, _, fields = setup
    rng = np.random.default_rng(3)
    d, s = fields.n_bins, fields.size
    src_a = tuple(jnp.asarray(rng.uniform(0, 1, (d, s, s)).astype(np.float32))
                  for _ in range(3))
    src_b = tuple(jnp.asarray(rng.uniform(0, 1, (d, s, s)).astype(np.float32))
                  for _ in range(3))
    src2 = tuple(jnp.concatenate([a, b]) for a, b in zip(src_a, src_b))
    for t, ref_src in ((0, src_a), (1, src_b)):
        ref = rbt.resolve_raw(fields, ref_src, W, W)
        got = rbt.resolve_raw(fields, src2, W, W, tracer=t)
        np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))
    # Grouped per-tracer resolve still partitions exactly.
    ref = rbt.resolve_raw(fields, src_b, W, W)
    parts = sum(rbt.resolve_raw(fields, src2, W, W, tracer=1, group=g,
                                n_groups=4) for g in range(4))
    np.testing.assert_allclose(np.asarray(parts), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_pair_trace_blocks_are_independent_unbiased(setup):
    """rbt_trace_frame(n_tracers=2) with a 2n total budget produces two
    tracer blocks each distributed like a separate n-photon tracer: both
    blocks' resolved images agree with a single-tracer render within MC
    tolerance, and the blocks differ from each other (independent RNG)."""
    scene, gb, brdf, fields = setup
    n = 8192
    frames = 4
    src2 = rbt.zero_sources(fields, n_tracers=2)
    for f in range(frames):
        src2, n_emitted = rbt.rbt_trace_frame(
            fields, src2, gb, scene.lights, scene.field_textures, brdf,
            jax.random.fold_in(jax.random.key(11), f), 2 * n, jnp.int32(2),
            max_bounces=2, mc_direct=True, analytic_direct=False,
            light_kinds=(1,), hist_direct=True, n_tracers=2)
    assert int(n_emitted) == 2 * n  # capacity-aligned at D=64
    raw_a = np.asarray(rbt.resolve_raw(fields, src2, W, W, tracer=0)) / frames
    raw_b = np.asarray(rbt.resolve_raw(fields, src2, W, W, tracer=1)) / frames

    single = _rbt_raw(scene, gb, brdf, fields, jax.random.key(12),
                      n=n, frames=frames, bounces=2)
    # Energy bookkeeping: per-tracer totals match the single tracer's.
    for raw_t in (raw_a, raw_b):
        np.testing.assert_allclose(raw_t.sum(), single.sum(), rtol=0.05)
    # Independence: the two blocks are distinct MC draws.
    assert np.abs(raw_a - raw_b).max() > 0
    # Distribution: bright-region means agree within MC noise.
    mask = single > np.percentile(single, 90)
    np.testing.assert_allclose(raw_a[mask].mean(), single[mask].mean(),
                               rtol=0.1)
    np.testing.assert_allclose(raw_b[mask].mean(), single[mask].mean(),
                               rtol=0.1)


def test_pair_trace_analytic_and_generic_paths(setup):
    """n_tracers=2 with analytic direct + generic MC scatter deposits: each
    tracer block carries the identical analytic field plus its own MC
    bounce noise; per-block totals match a single-tracer reference."""
    scene, gb, brdf, fields = setup
    n = 4096
    src2 = rbt.zero_sources(fields, n_tracers=2)
    src2, _ = rbt.rbt_trace_frame(
        fields, src2, gb, scene.lights, scene.field_textures, brdf,
        jax.random.key(5), 2 * n, jnp.int32(2), max_bounces=2,
        mc_direct=True, analytic_direct=True, n_tracers=2)
    src1 = rbt.zero_sources(fields)
    src1, _ = rbt.rbt_trace_frame(
        fields, src1, gb, scene.lights, scene.field_textures, brdf,
        jax.random.key(6), n, jnp.int32(2), max_bounces=2,
        mc_direct=True, analytic_direct=True)
    e_a = sum(float(ch[:fields.n_bins].sum()) for ch in src2)
    e_b = sum(float(ch[fields.n_bins:].sum()) for ch in src2)
    e_1 = sum(float(ch.sum()) for ch in src1)
    np.testing.assert_allclose(e_a, e_1, rtol=0.08)
    np.testing.assert_allclose(e_b, e_1, rtol=0.08)
