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


def test_sharded_rbt_device_count_scaling(rbt_setup):
    """The same per-device photon budget on 1/2/4/8-device meshes yields
    statistically identical lightmaps (energy normalization is per-estimate,
    so widening the mesh only averages more independent estimates)."""
    from litbox_tpu.parallel import (
        sharded_rbt_resolve, sharded_rbt_trace_frame, zero_sources_sharded)

    scene, gb, brdf, fields = rbt_setup
    sums = {}
    for n in (1, 2, 4, 8):
        mesh = make_mesh(n, ensemble=1)
        src = zero_sources_sharded(mesh, fields)
        src, emitted = sharded_rbt_trace_frame(
            mesh, fields, src, gb, scene.lights, scene.field_textures, brdf,
            jax.random.fold_in(jax.random.key(9), n), 8192, jnp.int32(1),
            max_bounces=1, mc_direct=True, analytic_direct=False)
        raw = np.asarray(sharded_rbt_resolve(mesh, fields, src, W, W))[0]
        assert np.all(np.isfinite(raw))
        assert int(emitted[0]) == n * 8192
        sums[n] = float(raw.sum())
    base = sums[1]
    for n, s in sums.items():
        assert abs(s / base - 1) < 0.05, sums


def test_sharded_rbt_resolve_linearity(rbt_setup):
    """pmean-of-per-device-resolves == resolve-of-mean-sources — the
    linearity invariant the sharded design rests on (rbt_sharded.py:14-19),
    checked against a host-side reference. Tolerance is set by the bf16
    tent-matmul inside rotate_back (ops/resample.py): averaging before vs
    after the resolve routes different magnitudes through bf16 rounding,
    so agreement is to ~2^-8 relative, not bitwise."""
    from litbox_tpu.parallel import (
        sharded_rbt_resolve, sharded_rbt_trace_frame, zero_sources_sharded)
    from litbox_tpu.sim import rbt

    scene, gb, brdf, fields = rbt_setup
    mesh = make_mesh(8, ensemble=2)
    src = zero_sources_sharded(mesh, fields)
    src, _ = sharded_rbt_trace_frame(
        mesh, fields, src, gb, scene.lights, scene.field_textures, brdf,
        jax.random.key(11), 2048, jnp.int32(1),
        max_bounces=1, mc_direct=True, analytic_direct=False)
    raw_sharded = np.asarray(sharded_rbt_resolve(mesh, fields, src, W, W))

    src_host = np.asarray(src)          # (E, Dd, 3, D, S, S)
    for e in range(2):
        mean_src = tuple(jnp.asarray(src_host[e].mean(0)[c]) for c in range(3))
        raw_ref = np.asarray(rbt.resolve_raw(fields, mean_src, W, W))
        np.testing.assert_allclose(raw_sharded[e], raw_ref, rtol=1e-2,
                                   atol=1e-5)


def test_sharded_rbt_collective_traffic_is_lightmap_only(rbt_setup):
    """The compiled resolve moves ONLY (H, W, 3) lightmaps across devices —
    never the (3, D, S, S) source buffers. A wall-clock scaling curve on the
    virtual CPU mesh cannot see accidental resharding (one host executes all
    devices serially); the HLO collective shapes can."""
    import re

    from litbox_tpu.parallel import (
        sharded_rbt_resolve, sharded_rbt_trace_frame, zero_sources_sharded)

    scene, gb, brdf, fields = rbt_setup
    mesh = make_mesh(8, ensemble=2)
    src = zero_sources_sharded(mesh, fields)

    lightmap_elems = 2 * W * W * 3  # full ensemble of lightmaps
    for fn, args in (
        (sharded_rbt_resolve, (mesh, fields, src, W, W)),
        (sharded_rbt_trace_frame,
         (mesh, fields, src, gb, scene.lights, scene.field_textures, brdf,
          jax.random.key(0), 1024, jnp.int32(1))),
    ):
        text = fn.lower(*args).compile().as_text()
        for line in text.splitlines():
            m = re.search(r"\b(all-reduce|all-gather|all-to-all"
                          r"|collective-permute)\b", line)
            if not m or line.strip().startswith("//"):
                continue
            for shape in re.findall(r"[a-z0-9]+\[([0-9,]*)\]", line):
                elems = int(np.prod([int(d) for d in shape.split(",") if d]
                                    or [1]))
                assert elems <= lightmap_elems, (m.group(1), line[:160])


def test_sharded_rbt_resolve_bins_matches_full(rbt_setup):
    """Bin-axis sharded resolve == per-device full resolve + pmean (VERDICT
    round 2 next #5): psum_scatter the sources over bins, resolve D/n bins
    per device, psum the (H, W, 3) partials — identical output by linearity,
    1/n the resolve work per device."""
    from litbox_tpu.parallel import (
        sharded_rbt_resolve, sharded_rbt_resolve_bins, sharded_rbt_trace_frame,
        zero_sources_sharded)

    scene, gb, brdf, fields = rbt_setup
    mesh = make_mesh(8, ensemble=2)
    src = zero_sources_sharded(mesh, fields)
    src, _ = sharded_rbt_trace_frame(
        mesh, fields, src, gb, scene.lights, scene.field_textures, brdf,
        jax.random.key(5), 1024, jnp.int32(1), max_bounces=1,
        mc_direct=True, analytic_direct=False)
    full = np.asarray(sharded_rbt_resolve(mesh, fields, src, W, W))
    bins = np.asarray(sharded_rbt_resolve_bins(mesh, fields, src, W, W))
    assert bins.shape == full.shape == (2, W, W, 3)
    assert full.sum() > 0
    # Exact ground truth: single-device resolve of the device-mean sources.
    # (The pmean-of-resolves path itself deviates from this by ~6e-4 of
    # accumulation-order rounding; the bin-sharded path resolves the mean
    # sources directly and lands within ~3e-7.)
    from litbox_tpu.sim import rbt as rbt_mod
    host = np.asarray(src)
    for e in range(2):
        mean_src = tuple(jnp.asarray(host[e, :, c].mean(0)) for c in range(3))
        gt = np.asarray(rbt_mod.resolve_raw(fields, mean_src, W, W))
        scale = max(float(gt.max()), 1e-9)
        assert np.abs(bins[e] - gt).max() / scale < 5e-6
        assert np.abs(full[e] - gt).max() / scale < 5e-3


def test_sharded_train_bn_stats_are_global():
    """Data-parallel BatchNorm statistics are GLOBAL-batch statistics under
    GSPMD jit (VERDICT round 2 weak #8): a step on a 4-wide data mesh
    produces the same running batch_stats (and loss) as the identical step
    on a 1-device mesh — XLA all-reduces the batch moments itself; there is
    no per-shard drift to pmean by hand."""
    from litbox_tpu.parallel.train_sharded import (
        build_sharded_train_step, make_train_mesh)

    rng = np.random.default_rng(0)
    inputs = jnp.asarray(rng.normal(size=(4, 16, 16, 1)).astype(np.float32))
    targets = jnp.asarray(rng.normal(size=(4, 16, 16, 1)).astype(np.float32) ** 2)

    results = {}
    for n in (1, 4):
        mesh = make_train_mesh(n, model_parallel=1)
        step, params, stats, opt = build_sharded_train_step(
            mesh, unet_size=2, initial_features=4, crop=16, batch=4)
        _, new_stats, _, loss = step(params, stats, opt, inputs, targets)
        results[n] = (jax.tree.map(np.asarray, new_stats), float(loss))

    stats1, loss1 = results[1]
    stats4, loss4 = results[4]
    assert abs(loss1 - loss4) < 1e-4 * max(1.0, abs(loss1))
    flat1 = jax.tree_util.tree_leaves(stats1)
    flat4 = jax.tree_util.tree_leaves(stats4)
    assert flat1 and len(flat1) == len(flat4)
    for a, b in zip(flat1, flat4):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-6)


@pytest.mark.slow
def test_sharded_rbt_realistic_shape():
    """Realistic-shape smoke under the virtual 8-device mesh: 256^2 scene,
    128 bins, 65536 photons/device — the production configuration of the
    dryrun at full field sizes (SURVEY.md section 7 step 8)."""
    from litbox_tpu.parallel import (
        sharded_rbt_resolve, sharded_rbt_trace_frame, zero_sources_sharded)
    from litbox_tpu.sim import rbt

    w = 256
    b = SceneBuilder()
    b.add_point_light((w / 2, w / 2), radius=2.0, intensity=1.5, bounces=2)
    b.add_rect((w / 2, w / 2), (w, w), log_density=-1.2)
    scene = b.build(max_lights=1, max_shapes=1)
    gb = rasterize(scene, w, w)
    brdf = jnp.asarray(luts.brdf_lut((16, 5, 3)))
    fields = rbt.precompute_rotated_fields(gb, n_bins=128)

    mesh = make_mesh(8, ensemble=2)
    src = zero_sources_sharded(mesh, fields)
    src, n = sharded_rbt_trace_frame(
        mesh, fields, src, gb, scene.lights, scene.field_textures, brdf,
        jax.random.key(1), 65536, jnp.int32(-1), max_bounces=2,
        mc_direct=True, analytic_direct=False)
    raw = np.asarray(sharded_rbt_resolve(mesh, fields, src, w, w))
    assert raw.shape == (2, w, w, 3)
    assert np.all(np.isfinite(raw)) and raw.sum() > 0
    assert int(n[0]) == 4 * 65536


@pytest.fixture(scope="module")
def bins_setup():
    """Multi-bounce point-light scene for the bin-sharded tracer (bounce
    chains must run >= 2 waves so the ICI ring flight is exercised)."""
    from litbox_tpu.sim import rbt

    b = SceneBuilder()
    b.add_point_light((W / 2, W / 2), radius=1.0, intensity=1.5, bounces=3)
    b.add_point_light((W * 0.3, W * 0.6), radius=1.5, intensity=1.0,
                      bounces=3)
    b.add_rect((W / 2, W / 2), (W, W), log_density=-1.0)
    scene = b.build(max_lights=2, max_shapes=1)
    gb = rasterize(scene, W, W)
    brdf = jnp.asarray(luts.brdf_lut((16, 5, 3)))
    fields = rbt.precompute_rotated_fields(gb, n_bins=32)
    return scene, gb, brdf, fields


def test_bins_sharded_memory_is_d_over_n(bins_setup):
    """VERDICT r3 next #6: per-device field AND source memory must scale as
    D/n — asserted on the actual addressable shards."""
    from litbox_tpu.parallel import (
        make_bins_mesh, shard_fields_bins, zero_sources_bins)

    scene, gb, brdf, fields = bins_setup
    mesh = make_bins_mesh(8, ensemble=2)  # shard axis = 4
    bf = shard_fields_bins(mesh, fields)
    d, s = fields.n_bins, fields.size
    for arr, per_bin in ((bf.trans, s * s), (bf.cum_log, s * s)):
        shard = arr.addressable_shards[0].data
        assert shard.shape[1] == d // 4, shard.shape
        assert shard.size == (d // 4) * per_bin

    src = zero_sources_bins(mesh, bf)
    shard = src.addressable_shards[0].data
    assert shard.shape == (1, 1, 3, d // 4, s, s)
    # 2 ensemble rows x 4 bin shards: total source floats across the mesh
    # equal 2 full buffers, NOT 8 (the data-sharded module's footprint).
    total = sum(sh.data.size for sh in src.addressable_shards)
    assert total == 2 * 3 * d * s * s


def test_bins_sharded_matches_unsharded_exactly(bins_setup):
    """Same key -> the bin-sharded frame IS the unsharded rbt_trace_frame
    (hist direct + stratified bounce) re-partitioned: resolves must agree
    to f32 scatter-order tolerance, wave >= 1 flights riding the ring."""
    from litbox_tpu.parallel import (
        bins_resolve, bins_trace_frame, make_bins_mesh, shard_fields_bins,
        zero_sources_bins)
    from litbox_tpu.sim import rbt

    scene, gb, brdf, fields = bins_setup
    key = jax.random.key(5)

    src_ref = rbt.zero_sources(fields)
    src_ref, n_ref = rbt.rbt_trace_frame(
        fields, src_ref, gb, scene.lights, scene.field_textures, brdf,
        jax.random.fold_in(key, 0), 2048, jnp.int32(-1), max_bounces=4,
        bounce_photons=512, mc_direct=True, analytic_direct=False,
        enable_brdf=True, hist_direct=True)
    raw_ref = np.asarray(rbt.resolve_raw(fields, src_ref, W, W))

    mesh = make_bins_mesh(8, ensemble=2)
    bf = shard_fields_bins(mesh, fields)
    src = zero_sources_bins(mesh, bf)
    src, n, ovf = bins_trace_frame(mesh, bf, src, gb, scene.lights, brdf,
                                   key, 2048, jnp.int32(-1), max_bounces=4,
                                   bounce_photons=512, enable_brdf=True)
    assert int(np.asarray(ovf).max()) == 0  # a2a buckets never overflowed
    raw = np.asarray(bins_resolve(mesh, bf, src, W, W))

    assert raw.shape == (2, W, W, 3)
    assert int(n[0]) == int(n_ref)
    np.testing.assert_allclose(raw[0], raw_ref, rtol=2e-4, atol=1e-6)
    # Second ensemble row: independent key -> different estimate.
    assert np.abs(raw[1] - raw_ref).max() > 1e-6


def test_bins_sharded_frames_accumulate(bins_setup):
    """Sources accumulate across frames (the temporal-accumulation contract
    of sim/rbt.py) in the bin-sharded layout too."""
    from litbox_tpu.parallel import (
        bins_resolve, bins_trace_frame, make_bins_mesh, shard_fields_bins,
        zero_sources_bins)

    scene, gb, brdf, fields = bins_setup
    mesh = make_bins_mesh(8, ensemble=1)  # shard axis = 8
    bf = shard_fields_bins(mesh, fields)
    src = zero_sources_bins(mesh, bf)
    sums = []
    for f in range(2):
        src, _, _ = bins_trace_frame(
            mesh, bf, src, gb, scene.lights, brdf,
            jax.random.fold_in(jax.random.key(9), f), 1024, jnp.int32(-1),
            max_bounces=3, enable_brdf=False)
        sums.append(float(np.asarray(
            bins_resolve(mesh, bf, src, W, W)).sum()))
    assert sums[1] > sums[0] * 1.5


def test_bins_a2a_matches_ring(bins_setup):
    """The round-5 all-to-all bounce exchange computes the SAME physics as
    the round-4 ring (identical RNG sequence, records fly the same rows
    with the same draws — only the device doing the math and the f32
    deposit order differ), with zero bucket overflow."""
    from litbox_tpu.parallel import (
        bins_resolve, bins_trace_frame, make_bins_mesh, shard_fields_bins,
        zero_sources_bins)

    scene, gb, brdf, fields = bins_setup
    key = jax.random.key(13)
    mesh = make_bins_mesh(8, ensemble=1)
    bf = shard_fields_bins(mesh, fields)

    outs = {}
    for use_ring in (True, False):
        src = zero_sources_bins(mesh, bf)
        # enable_brdf=True with aligned shapes = MIRROR-correlated scatter
        # directions, the worst case for bucket concentration: slack=n
        # (W = m) makes the exchange exact (see _a2a_capacity docstring).
        src, _, ovf = bins_trace_frame(
            mesh, bf, src, gb, scene.lights, brdf, key, 2048,
            jnp.int32(-1), max_bounces=4, bounce_photons=512,
            enable_brdf=True, use_ring=use_ring, a2a_slack=8.0)
        assert int(np.asarray(ovf).max()) == 0
        outs[use_ring] = np.asarray(bins_resolve(mesh, bf, src, W, W))
    np.testing.assert_allclose(outs[False], outs[True], rtol=2e-4, atol=1e-6)


def test_bins_a2a_flight_work_scales_inverse_n(bins_setup):
    """SURVEY §5 scaling contract, round-5 half: per-device bounce flight
    work is proportional to 1/n. Structural assertion: the per-device
    exchanged/flown lane count is n * W = n * _a2a_capacity(m, n) with
    m = (D/n) * cap — halving when n doubles — while the traced result
    stays equal to the unsharded tracer at every n."""
    from litbox_tpu.parallel import (
        bins_resolve, bins_trace_frame, make_bins_mesh, shard_fields_bins,
        zero_sources_bins)
    from litbox_tpu.parallel.rbt_bins import _a2a_capacity
    from litbox_tpu.sim import rbt

    scene, gb, brdf, fields = bins_setup
    key = jax.random.key(21)
    d_bins = fields.n_bins
    k_chains = 512
    cap = -(-k_chains // d_bins)

    src_ref = rbt.zero_sources(fields)
    # bins_trace_frame folds the key per ensemble row; mirror row 0.
    src_ref, _ = rbt.rbt_trace_frame(
        fields, src_ref, gb, scene.lights, scene.field_textures, brdf,
        jax.random.fold_in(key, 0),
        2048, jnp.int32(-1), max_bounces=4, bounce_photons=k_chains,
        mc_direct=True, analytic_direct=False, enable_brdf=False,
        hist_direct=True)
    raw_ref = np.asarray(rbt.resolve_raw(fields, src_ref, W, W))

    lanes = {}
    for n in (2, 4, 8):
        mesh = make_bins_mesh(n, ensemble=1)
        bf = shard_fields_bins(mesh, fields)
        src = zero_sources_bins(mesh, bf)
        src, _, ovf = bins_trace_frame(
            mesh, bf, src, gb, scene.lights, brdf, key, 2048,
            jnp.int32(-1), max_bounces=4, bounce_photons=k_chains,
            enable_brdf=False, use_ring=False)
        assert int(np.asarray(ovf).max()) == 0
        raw = np.asarray(bins_resolve(mesh, bf, src, W, W))
        np.testing.assert_allclose(raw[0], raw_ref, rtol=2e-4, atol=1e-6)
        m = (d_bins // n) * cap
        # Per-device flight work = m home-local lanes + n * W exchange
        # lanes (W capped at m for worst-case exactness, so the exchange
        # term is ring-equivalent until n exceeds the slack factor).
        lanes[n] = m + n * _a2a_capacity(m, n)
    # Per-device flown lanes decrease monotonically with n and halve once
    # n clears the slack factor; the round-4 ring cost was m_total * n
    # lanes per device = CONSTANT in n.
    assert lanes[8] < lanes[4] < lanes[2]
    assert lanes[8] <= lanes[4] * 0.55
