import numpy as np
import pytest

from litbox_tpu.io import read_exr, read_exr_rgb, write_exr, write_exr_rgb
from litbox_tpu.io.images import read_png_linear, write_png


@pytest.mark.parametrize("compression", ["none", "zips", "zip"])
@pytest.mark.parametrize("half", [False, True])
def test_exr_roundtrip(tmp_path, compression, half):
    rng = np.random.default_rng(0)
    rgb = rng.uniform(0, 100, size=(37, 53, 3)).astype(np.float32)
    path = str(tmp_path / "t.exr")
    write_exr_rgb(path, rgb, compression=compression, half=half)
    back = read_exr_rgb(path)
    tol = 0.1 if half else 0.0
    np.testing.assert_allclose(back, rgb, rtol=tol, atol=tol)


def test_exr_single_channel_and_order(tmp_path):
    rng = np.random.default_rng(1)
    a = rng.normal(size=(16, 128)).astype(np.float32)
    b = rng.normal(size=(16, 128)).astype(np.float32)
    path = str(tmp_path / "t.exr")
    write_exr(path, {"Z": a, "A": b})
    back = read_exr(path)
    np.testing.assert_array_equal(back["Z"], a)
    np.testing.assert_array_equal(back["A"], b)


def test_exr_large_zip_blocks(tmp_path):
    # >16 scanlines forces multiple ZIP blocks including a partial tail.
    rng = np.random.default_rng(2)
    rgb = rng.uniform(0, 1, size=(70, 41, 3)).astype(np.float32)
    path = str(tmp_path / "big.exr")
    write_exr_rgb(path, rgb, compression="zip")
    np.testing.assert_array_equal(read_exr_rgb(path), rgb)


def test_png_roundtrip(tmp_path):
    rng = np.random.default_rng(3)
    rgb = rng.uniform(0, 1, size=(20, 24, 3)).astype(np.float32)
    path = str(tmp_path / "t.png")
    write_png(path, rgb)
    back = read_png_linear(path)
    np.testing.assert_allclose(back, rgb, atol=0.02)


def test_reads_reference_checkpoint_png():
    # Real (non-LFS) golden inputs from the reference repo.
    img = read_png_linear("/root/reference/checkpoint_tests/png_old/Input_0.png")
    assert img.ndim == 3 and img.shape[2] == 3
    assert img.min() >= 0.0 and img.max() <= 1.0
