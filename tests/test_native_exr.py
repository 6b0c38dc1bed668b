import numpy as np
import pytest

from litbox_tpu.io import read_exr_rgb, write_exr_rgb
from litbox_tpu.native import get_lib, read_exr_rgb_batch_native, read_exr_rgb_native


@pytest.fixture(scope="module")
def native_lib():
    lib = get_lib()
    if lib is None:
        pytest.skip("native toolchain unavailable")
    return lib


@pytest.mark.parametrize("compression", ["none", "zips", "zip"])
@pytest.mark.parametrize("half", [False, True])
def test_native_matches_python(tmp_path, native_lib, compression, half):
    rng = np.random.default_rng(0)
    rgb = rng.uniform(0, 50, (37, 53, 3)).astype(np.float32)
    path = str(tmp_path / "t.exr")
    write_exr_rgb(path, rgb, compression=compression, half=half)
    ref = read_exr_rgb(path)
    out = read_exr_rgb_native(path)
    assert out is not None
    np.testing.assert_array_equal(out, ref)


def test_native_batch(tmp_path, native_lib):
    rng = np.random.default_rng(1)
    paths = []
    imgs = []
    for i in range(6):
        img = rng.uniform(0, 4, (24, 32, 3)).astype(np.float32)
        p = str(tmp_path / f"b{i}.exr")
        write_exr_rgb(p, img)
        paths.append(p)
        imgs.append(img)
    out = read_exr_rgb_batch_native(paths, 24, 32)
    assert out is not None
    np.testing.assert_array_equal(out, np.stack(imgs))


def test_native_rejects_garbage(tmp_path, native_lib):
    p = str(tmp_path / "bad.exr")
    with open(p, "wb") as f:
        f.write(b"version https://git-lfs...")
    assert read_exr_rgb_native(p) is None
