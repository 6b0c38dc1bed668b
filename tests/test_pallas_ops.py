"""Pallas kernel numerics (run in interpreter mode off-TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from litbox_tpu.ops.resample import gather_bilinear_mxu
from litbox_tpu.ops.rotate import (rotate_bins, rotate_bins_uniform,
                                   rotate_planar_sum, rotate_planar_sum_fused)


def _rotate_ref(im, theta, s):
    ys, xs = jnp.mgrid[0:s, 0:s]
    u = xs + 0.5 - s / 2
    v = ys + 0.5 - s / 2
    c, sn = jnp.cos(theta), jnp.sin(theta)
    pts = jnp.stack([c * u - sn * v + s / 2, sn * u + c * v + s / 2], -1).reshape(-1, 2)
    return gather_bilinear_mxu(im, pts, chunk=4096).reshape(s, s, 3)


@pytest.mark.parametrize("theta", [0.0, 0.37, -1.2, 2.5, np.pi])
def test_rotate_bins_matches_dense_reference(theta):
    s = 64
    rng = np.random.default_rng(0)
    img = np.zeros((s, s, 3), np.float32)
    img[12:20, 34:50] = rng.uniform(0.5, 1.5, (8, 16, 3))
    imgs = jnp.asarray(img)[None]
    out = np.asarray(rotate_bins(imgs, jnp.asarray([theta])))[0]
    ref = np.asarray(_rotate_ref(imgs[0], theta, s))
    # 3-shear vs bilinear: small interpolation differences, same mass.
    assert abs(out.sum() / max(ref.sum(), 1e-6) - 1) < 0.02
    assert np.abs(out - ref).mean() < 0.01


def test_rotate_bins_uniform_matches_traced():
    # d=6 avoids angles landing exactly on the +-45deg quadrant boundary,
    # where float32 (traced) and float64 (static) rounding legitimately pick
    # different — equally valid — shear decompositions.
    s = 64
    d = 6
    rng = np.random.default_rng(1)
    imgs = jnp.asarray(rng.uniform(0, 1, (d, s, s, 3)).astype(np.float32))
    angles = [-i * 2 * np.pi / d for i in range(d)]
    a = np.asarray(rotate_bins_uniform(imgs, tuple(angles)))
    b = np.asarray(rotate_bins(imgs, jnp.asarray(angles)))
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_rotate_bins_reduce_rows_matches_full():
    """The fused final shear (in-kernel sum over bins + row crop) must equal
    rotating every bin fully, summing, and cropping — for both the static
    and the traced-angle paths."""
    s = 64
    d = 5
    rng = np.random.default_rng(3)
    imgs = jnp.asarray(rng.uniform(0, 1, (d, s, s, 3)).astype(np.float32))
    angles = [-i * 2 * np.pi / d + 0.1 for i in range(d)]
    lo, hi = 16, 48

    full = np.asarray(rotate_bins_uniform(imgs, tuple(angles))).sum(0)[lo:hi]
    fused = np.asarray(rotate_bins_uniform(imgs, tuple(angles),
                                           reduce_rows=(lo, hi)))
    np.testing.assert_allclose(fused, full, rtol=1e-5, atol=1e-5)

    full_t = np.asarray(rotate_bins(imgs, jnp.asarray(angles))).sum(0)[lo:hi]
    fused_t = np.asarray(rotate_bins(imgs, jnp.asarray(angles),
                                     reduce_rows=(lo, hi)))
    np.testing.assert_allclose(fused_t, full_t, rtol=1e-5, atol=1e-5)


def test_rotate_planar_sum_matches_interleaved_static():
    """delta=0: the planar channel-major pipeline must match the
    channel-interleaved static path bit-for-bit (same shear lattices)."""
    s, d = 64, 6
    rng = np.random.default_rng(4)
    imgs = jnp.asarray(rng.uniform(0, 1, (d, s, s, 3)).astype(np.float32))
    base = tuple(-i * 2 * np.pi / d for i in range(d))
    lo, hi = 8, 56
    full = np.asarray(rotate_bins_uniform(imgs, base)).sum(0)[lo:hi]
    chans = tuple(imgs[..., c] for c in range(3))
    planar = np.moveaxis(np.asarray(
        rotate_planar_sum(chans, base, 0.0, 2 * np.pi / d, lo, hi)), 0, -1)
    np.testing.assert_allclose(planar, full, rtol=1e-5, atol=1e-5)


def test_rotate_planar_sum_fused_matches_dense():
    """Whole-image fused kernel (epilogue rot90 on run partials) vs the
    dense per-bin gather rotation. The fused path's shear order relative
    to the quadrant rot90 differs from rotate_planar_sum (rotations about
    the common center commute geometrically, not texel-exactly), so the
    dense gather is the oracle; mass must be preserved exactly."""
    s, d = 128, 8
    rng = np.random.default_rng(6)
    img = np.zeros((d, s, s, 3), np.float32)
    img[:, 24:104, 28:100] = rng.uniform(0.5, 1.5, (d, 80, 72, 3))
    for _ in range(4):
        img = (np.roll(img, 1, 1) + np.roll(img, -1, 1)
               + np.roll(img, 1, 2) + np.roll(img, -1, 2) + img) / 5
    imgs = jnp.asarray(img)
    base = tuple(-i * 2 * np.pi / d for i in range(d))
    chans = tuple(imgs[..., c] for c in range(3))
    for delta in (0.0, -0.3 * 2 * np.pi / d):
        ref = np.zeros((s, s, 3), np.float32)
        for i, a in enumerate(base):
            ref += np.asarray(_rotate_ref(imgs[i], a + delta, s))
        fused = np.moveaxis(np.asarray(
            rotate_planar_sum_fused(chans, base, delta)), 0, -1)
        assert abs(fused.sum() / ref.sum() - 1) < 0.02
        assert np.abs(fused - ref).mean() < 0.02, delta


def test_rotate_planar_sum_fused_matches_pipeline():
    """Fused vs the separate-pass planar pipeline on the same inputs: both
    discretize the same rotation; interpolation-order differences stay
    small on smooth fields and total mass agrees tightly."""
    s, d = 128, 8
    rng = np.random.default_rng(7)
    img = rng.uniform(0, 1, (d, s, s, 3)).astype(np.float32)
    for _ in range(4):
        img = (np.roll(img, 1, 1) + np.roll(img, -1, 1)
               + np.roll(img, 1, 2) + np.roll(img, -1, 2) + img) / 5
    imgs = jnp.asarray(img)
    base = tuple(-i * 2 * np.pi / d for i in range(d))
    chans = tuple(imgs[..., c] for c in range(3))
    lo, hi = 16, 112
    pipe = np.asarray(rotate_planar_sum(chans, base, 0.0, 2 * np.pi / d,
                                        lo, hi))
    fused = np.asarray(rotate_planar_sum_fused(chans, base, 0.0))[:, lo:hi]
    assert abs(fused.sum() / pipe.sum() - 1) < 1e-3
    assert np.abs(fused - pipe).mean() < 0.02


def test_rotate_planar_sum_traced_delta_matches_dense():
    """Traced delta (the jitter phase): static-quadrant decomposition with
    widened residual bounds must match the dense per-bin gather rotation.
    (Comparison vs the interleaved traced path is only lattice-equal when
    quadrant choices coincide, so the dense gather is the oracle here.)"""
    s, d = 64, 6
    rng = np.random.default_rng(5)
    img = np.zeros((d, s, s, 3), np.float32)
    img[:, 12:52, 14:50] = rng.uniform(0.5, 1.5, (d, 40, 36, 3))
    for _ in range(4):  # smooth: bilinear-lattice differences stay tiny
        img = (np.roll(img, 1, 1) + np.roll(img, -1, 1)
               + np.roll(img, 1, 2) + np.roll(img, -1, 2) + img) / 5
    imgs = jnp.asarray(img)
    base = tuple(-i * 2 * np.pi / d for i in range(d))
    delta = -0.3 * 2 * np.pi / d
    lo, hi = 8, 56
    ref = np.zeros((s, s, 3), np.float32)
    for i, a in enumerate(base):
        ref += np.asarray(_rotate_ref(imgs[i], a + delta, s))
    ref = ref[lo:hi]
    chans = tuple(imgs[..., c] for c in range(3))
    planar = np.moveaxis(np.asarray(
        rotate_planar_sum(chans, base, delta, 2 * np.pi / d, lo, hi)), 0, -1)
    assert abs(planar.sum() / ref.sum() - 1) < 0.02
    assert np.abs(planar - ref).mean() < 0.02
