"""Native image decoder: byte-exact vs PIL for JPEG and PNG."""

import shutil

import numpy as np
import pytest
from PIL import Image

from omgsr_tpu.data.imgdec_native import decode_rgb, load_library


@pytest.fixture(scope="module")
def lib():
    if shutil.which("g++") is None:
        pytest.skip("no g++")
    lib = load_library()
    if lib is None:
        pytest.skip("libjpeg/libpng unavailable")
    return lib


def test_png_decode_exact(lib, tmp_path):
    rng = np.random.default_rng(0)
    arr = rng.integers(0, 255, (37, 53, 3), dtype=np.uint8)
    p = tmp_path / "x.png"
    Image.fromarray(arr).save(p)
    out = decode_rgb(str(p))
    np.testing.assert_array_equal(out, arr)


def test_png_palette_and_gray(lib, tmp_path):
    rng = np.random.default_rng(1)
    gray = rng.integers(0, 255, (20, 30), dtype=np.uint8)
    p = tmp_path / "g.png"
    Image.fromarray(gray, mode="L").save(p)
    out = decode_rgb(str(p))
    ref = np.asarray(Image.open(p).convert("RGB"))
    np.testing.assert_array_equal(out, ref)


def test_jpeg_decode_close_to_pil(lib, tmp_path):
    rng = np.random.default_rng(2)
    base = rng.integers(0, 255, (16, 16, 3))
    arr = np.kron(base, np.ones((4, 4, 1))).astype(np.uint8)
    p = tmp_path / "x.jpg"
    Image.fromarray(arr).save(p, quality=95)
    out = decode_rgb(str(p))
    ref = np.asarray(Image.open(p).convert("RGB"))
    assert out.shape == ref.shape
    # both decode the same libjpeg stream; IDCT variants may differ by ~1-2
    assert np.abs(out.astype(int) - ref.astype(int)).mean() < 2.0


def test_missing_file_returns_none(lib):
    assert decode_rgb("/nonexistent/file.png") is None


def test_dataset_uses_native_path(lib, tmp_path):
    from omgsr_tpu.data.dataset import PairedDataset

    rng = np.random.default_rng(3)
    arr = rng.integers(0, 255, (80, 80, 3), dtype=np.uint8)
    Image.fromarray(arr).save(tmp_path / "a.png")
    ds = PairedDataset([str(tmp_path)], resolution=64)
    item = ds[0]
    assert item.shape == (64, 64, 3)
    assert 0.0 <= item.min() and item.max() <= 1.0
