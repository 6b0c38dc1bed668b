"""Denoiser training loop + dataset + tiled inference tests."""

import jax.numpy as jnp
import numpy as np
import pytest

from litbox_tpu.io import write_exr_rgb, write_png
from litbox_tpu.nn.dataset import DenoiserDataset, build_curriculum
from litbox_tpu.nn.infer import infer_large
from litbox_tpu.nn.train import TrainConfig, Trainer


@pytest.fixture(scope="module")
def tiny_dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("ds")
    rng = np.random.default_rng(0)
    n = 3
    for i in range(n):
        ref = rng.uniform(0, 2, (48, 48, 3)).astype(np.float32)
        noise_a = ref + rng.normal(0, 0.3, ref.shape).astype(np.float32)
        noise_b = ref + rng.normal(0, 0.3, ref.shape).astype(np.float32)
        write_exr_rgb(str(root / f"output_{i:03d}.exr"), ref)
        write_exr_rgb(str(root / f"input_a_{i:03d}.exr"), np.abs(noise_a))
        write_exr_rgb(str(root / f"input_b_{i:03d}.exr"), np.abs(noise_b))
        write_png(str(root / f"albedo_{i:03d}.png"), rng.uniform(0, 1, (48, 48, 3)))
        write_exr_rgb(str(root / f"trans_{i:03d}.exr"), rng.uniform(0.5, 1, (48, 48, 3)))
    return root


def test_dataset_loading_and_augmentation(tiny_dataset):
    import glob

    ds = DenoiserDataset(
        sorted(glob.glob(str(tiny_dataset / "input_a_*.exr"))),
        sorted(glob.glob(str(tiny_dataset / "input_b_*.exr"))),
        sorted(glob.glob(str(tiny_dataset / "albedo_*.png"))),
        sorted(glob.glob(str(tiny_dataset / "trans_*.exr"))),
        sorted(glob.glob(str(tiny_dataset / "output_*.exr"))),
        crop_size=32)
    assert len(ds) == 3
    a, b, albedo, trans, ref = ds.__getitem__(0, np.random.default_rng(1))
    assert a.shape == (32, 32, 3) and ref.shape == (32, 32, 3)

    batches = list(ds.batches(2, np.random.default_rng(2)))
    assert len(batches) == 1
    assert batches[0]["input_a"].shape == (2, 32, 32, 3)


def test_jittered_subsample_and_upsample_mode(tiny_dataset):
    import glob

    ds = DenoiserDataset(
        sorted(glob.glob(str(tiny_dataset / "input_a_*.exr"))),
        sorted(glob.glob(str(tiny_dataset / "input_b_*.exr"))),
        sorted(glob.glob(str(tiny_dataset / "albedo_*.png"))),
        sorted(glob.glob(str(tiny_dataset / "trans_*.exr"))),
        sorted(glob.glob(str(tiny_dataset / "output_*.exr"))),
        crop_size=32, upsample=2)
    a, b, albedo, trans, ref = ds.__getitem__(1, np.random.default_rng(3))
    assert a.shape == (16, 16, 3)
    assert ref.shape == (32, 32, 3)  # reference stays full-res


def test_curriculum_builder(tiny_dataset):
    stages = build_curriculum(
        str(tiny_dataset / "output_*.exr"), str(tiny_dataset / "albedo_*.png"),
        str(tiny_dataset / "trans_*.exr"),
        str(tiny_dataset / "input_a_*.exr"), str(tiny_dataset / "input_b_*.exr"),
        easy=(str(tiny_dataset / "input_a_*.exr"), str(tiny_dataset / "input_b_*.exr")),
        crop_size=32)
    assert [s[0] for s in stages] == ["Easy", "Final"]


def test_training_reduces_loss(tiny_dataset):
    import glob

    cfg = TrainConfig(unet_size=2, initial_features=4, crop_size=32,
                      learn_rate=3e-4, epochs=50, batch_size=2)
    trainer = Trainer(cfg)
    ds = DenoiserDataset(
        sorted(glob.glob(str(tiny_dataset / "input_a_*.exr"))),
        sorted(glob.glob(str(tiny_dataset / "input_b_*.exr"))),
        sorted(glob.glob(str(tiny_dataset / "albedo_*.png"))),
        sorted(glob.glob(str(tiny_dataset / "trans_*.exr"))),
        sorted(glob.glob(str(tiny_dataset / "output_*.exr"))),
        crop_size=32)
    rng = np.random.default_rng(0)
    losses = []
    for _ in range(30):
        for batch in ds.batches(2, rng):
            inp, tgt = trainer.select_random_channel(batch, rng)
            losses.append(trainer.train_batch(inp, tgt))
    assert losses[-1] < losses[0] * 0.8, (losses[0], losses[-1])


def test_checkpoint_roundtrip(tmp_path):
    cfg = TrainConfig(unet_size=2, initial_features=4, crop_size=16)
    t1 = Trainer(cfg)
    rng = np.random.default_rng(0)
    x = rng.uniform(0, 1, (2, 16, 16, 1)).astype(np.float32)
    y = rng.uniform(0, 1, (2, 16, 16, 1)).astype(np.float32)
    t1.train_batch(x, y)
    t1.save(str(tmp_path / "ckpt" / "model.msgpack"))

    t2 = Trainer(cfg)
    t2.load(str(tmp_path / "ckpt" / "model.msgpack"))
    f1, f2 = t1.eval_fn(), t2.eval_fn()
    np.testing.assert_array_equal(np.asarray(f1(x)), np.asarray(f2(x)))


def test_infer_large_covers_image():
    cfg = TrainConfig(unet_size=2, initial_features=4, crop_size=32)
    trainer = Trainer(cfg)
    run = trainer.eval_fn()
    img = np.random.default_rng(1).uniform(0, 1, (70, 90, 3)).astype(np.float32)
    out = infer_large(run, img, tile=32, overlap=8)
    assert out.shape == img.shape
    assert np.all(np.isfinite(out))
    # Every interior pixel covered (nonzero counts -> averaged output).
    assert np.abs(out[10:-10, 10:-10]).sum() > 0


def test_infer_large_covers_rim():
    """Boundary tiles keep their edge rows/cols: with an identity model the
    output equals the input EVERYWHERE, including the image rim (round-2 bug:
    inner-cropping boundary tiles left a 256^2 single-tile input with a
    16 px zero ring = 23% of its pixels, depressing every held-out metric)."""
    identity = lambda x: x
    for shape in ((32, 32, 3), (70, 90, 3), (64, 32, 3)):
        img = np.random.default_rng(3).uniform(0.1, 1, shape).astype(np.float32)
        out = infer_large(identity, img, tile=32, overlap=8)
        np.testing.assert_allclose(out, img, rtol=1e-6)


def test_fit_blend_and_blended_inference():
    """Residual-blend shrinkage (nn/infer.py fit_blend): k -> 0 when the
    'denoiser' only injects noise (blended output == input, never hurts),
    k -> 1 when the denoiser returns the reference exactly; infer_large
    applies out = x + k (net(x) - x)."""
    from litbox_tpu.nn.infer import fit_blend

    rng = np.random.default_rng(5)
    ref = rng.uniform(0.2, 1.0, (64, 64, 3)).astype(np.float32)
    noisy = ref + rng.normal(0, 0.05, ref.shape).astype(np.float32)

    # Harmful net: adds a constant bias uncorrelated with (ref - noisy);
    # the least-squares k is ~ mean(ref - noisy)/bias ~ 0.
    k_bad = fit_blend(lambda x: x + 0.3, [(noisy, ref)], rgb=True,
                      tile=32, overlap=8)
    assert k_bad < 0.2

    # Identity net: zero residual -> k degenerates, clipped into [0, 1].
    k_id = fit_blend(lambda x: x, [(noisy, ref)], rgb=True, tile=32, overlap=8)
    assert 0.0 <= k_id <= 1.0

    # infer_large blend semantics: k=0 returns the input exactly.
    out0 = infer_large(lambda x: x + 1.0, noisy, tile=32, overlap=8,
                       rgb=True, blend=0.0)
    np.testing.assert_allclose(out0, noisy, rtol=1e-6)
    # and k=0.5 is the midpoint.
    out5 = infer_large(lambda x: x + 1.0, noisy, tile=32, overlap=8,
                       rgb=True, blend=0.5)
    np.testing.assert_allclose(out5, noisy + 0.5, rtol=1e-5)


def test_denoise_hdr_blend():
    """Pipeline denoise_hdr blend: k=0 is a no-op display path."""
    import jax
    from litbox_tpu.engine.pipeline import denoise_hdr
    from litbox_tpu.nn.unet import LitboxDenoiserNet, TransformConfig

    model = LitboxDenoiserNet(unet_size=2, initial_features=4)
    hdr = np.random.default_rng(7).uniform(0, 1, (40, 48, 3)).astype(np.float32)
    variables = model.init(jax.random.key(0), np.zeros((3, 32, 32, 1), np.float32),
                           train=False)
    out0 = denoise_hdr(model, variables, hdr, TransformConfig(), blend=0.0)
    np.testing.assert_allclose(np.asarray(out0), hdr, rtol=1e-5, atol=1e-6)
    out1 = denoise_hdr(model, variables, hdr, TransformConfig(), blend=1.0)
    outh = denoise_hdr(model, variables, hdr, TransformConfig(), blend=0.5)
    np.testing.assert_allclose(np.asarray(outh),
                               0.5 * (hdr + np.asarray(out1)),
                               rtol=1e-4, atol=1e-5)


def test_infer_large_subtile_input():
    """Inputs smaller than one tile are reflect-padded and denoised instead
    of silently returning zeros (ADVICE round 1, nn/infer.py:48)."""
    cfg = TrainConfig(unet_size=2, initial_features=4, crop_size=32)
    run = Trainer(cfg).eval_fn()
    img = np.random.default_rng(2).uniform(0.2, 1, (20, 26, 3)).astype(np.float32)
    out = infer_large(run, img, tile=32, overlap=8)
    assert out.shape == img.shape
    assert np.all(np.isfinite(out))
    assert np.abs(out).sum() > 0  # not the old all-zero failure mode

    import pytest

    with pytest.raises(ValueError):
        infer_large(run, img[:1], tile=32, overlap=8)


def test_rgb_variant_identity_at_init_and_trains():
    """The RGB realtime display net (out_channels=3, one pass per frame):
    identity at init under global_residual, trainable, and tiled inference
    covers the image (nn/unet.LitboxDenoiserNet.out_channels)."""
    from litbox_tpu.engine.pipeline import denoise_hdr
    from litbox_tpu.nn.unet import TransformConfig

    cfg = TrainConfig(unet_size=2, initial_features=4, crop_size=32,
                      batch_size=2, rgb=True, padding_mode="zeros",
                      global_residual=True,
                      transform=TransformConfig(normalize_input=True))
    trainer = Trainer(cfg)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.uniform(0, 1, (2, 32, 32, 3)).astype(np.float32))
    y = jnp.asarray(rng.uniform(0, 1, (2, 32, 32, 3)).astype(np.float32))
    loss0 = trainer.train_batch(x, y)
    assert np.isfinite(loss0)

    # identity at init (fresh trainer): residual head is zero-initialized
    fresh = Trainer(cfg)
    hdr = jnp.asarray(rng.uniform(0.1, 1, (40, 48, 3)).astype(np.float32))
    den = denoise_hdr(fresh.model,
                      {"params": fresh.params,
                       "batch_stats": fresh.batch_stats},
                      hdr, cfg.transform)
    assert den.shape == hdr.shape
    np.testing.assert_allclose(np.asarray(den), np.asarray(hdr), atol=1e-3)

    img = rng.uniform(0, 1, (70, 90, 3)).astype(np.float32)
    out = infer_large(fresh.eval_fn(), img, tile=32, overlap=8, rgb=True)
    assert out.shape == img.shape
    assert np.all(np.isfinite(out))
    np.testing.assert_allclose(out[8:-8, 8:-8], img[8:-8, 8:-8], atol=1e-3)


def test_device_data_sample_batch(tmp_path):
    """On-device batch sampler: shapes, crop bounds, channel pairing, and
    the noise2noise target switch (nn/device_data.py)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from litbox_tpu.nn.device_data import sample_batch

    rng = np.random.default_rng(0)
    n, h = 5, 64
    a = jnp.asarray(rng.uniform(0, 1, (n, h, h, 3)).astype(np.float32))
    b = a + 100.0          # tracer B recognizably offset
    ref = a + 10_000.0     # reference recognizably offset

    inp, tgt = sample_batch(a, b, ref, jax.random.key(1), 8, 32, True,
                            n2n_p=0.0)
    assert inp.shape == (8, 32, 32, 3) and tgt.shape == (8, 32, 32, 3)
    # With n2n_p=0 every target is the reference (offset ~1e4 from input).
    assert float(jnp.abs(tgt - inp).min()) > 5_000.0

    # n2n_p=1: every target is the OTHER tracer (offset exactly 100).
    inp, tgt = sample_batch(a, b, ref, jax.random.key(2), 8, 32, True,
                            n2n_p=1.0)
    d = jnp.abs(tgt - inp)
    np.testing.assert_allclose(np.asarray(d), 100.0, atol=1e-4)

    # Mono mode: one channel, and input/target pick the SAME channel
    # (reference parity, train_litbox_denoiser.py:102-113).
    inp, tgt = sample_batch(a, b, ref, jax.random.key(3), 8, 32, False,
                            n2n_p=0.0)
    assert inp.shape == (8, 32, 32, 1)
    # Input is tracer A or B (swap), so tgt - inp is 10000 or 9900 —
    # same channel either way.
    d = np.asarray(tgt - inp)
    assert np.all((np.abs(d - 10_000.0) < 1.0) | (np.abs(d - 9_900.0) < 1.0))


def test_device_data_rotations_cover_crops():
    """Rotations and crops draw from the full image (statistical smoke)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from litbox_tpu.nn.device_data import sample_batch

    n, h = 2, 48
    base = np.zeros((n, h, h, 3), np.float32)
    base[:, : h // 2] = 1.0  # top half bright
    a = jnp.asarray(base)
    inp, _ = sample_batch(a, a, a, jax.random.key(0), 16, 24, True)
    means = np.asarray(inp.mean(axis=(1, 2, 3)))
    # Random crops + rot90 must produce a spread of brightness mixes.
    assert means.min() < 0.35 and means.max() > 0.65
