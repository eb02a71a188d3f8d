"""Codec parity: lossless exact roundtrip, lossy PSNR >= 40 dB —
the same criteria BASELINE.json sets for decoded-pixel parity."""

import numpy as np
import pytest

from gdal_spark.fixtures.georef import JPEG_QUALITY, np_image_pixels
from gdal_spark.raster.codecs import decode_image, encode_image, sniff_format

DIMS = [(20, 20), (64, 64), (100, 257), (256, 256)]


def psnr(a, b):
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return 99.0 if mse == 0 else 10 * np.log10(255.0**2 / mse)


@pytest.mark.parametrize("fmt", ["png", "tiff"])
@pytest.mark.parametrize("dims", DIMS)
def test_lossless_exact(fmt, dims):
    h, w = dims
    arr = np_image_pixels(11, w, h)
    data = encode_image(arr, fmt)
    assert sniff_format(data) == fmt
    out = decode_image(data, fmt)
    assert out.shape == arr.shape
    assert np.array_equal(out, arr)


@pytest.mark.parametrize("dims", DIMS)
def test_jpeg_psnr(dims):
    h, w = dims
    arr = np_image_pixels(7, w, h)
    data = encode_image(arr, "jpeg", quality=JPEG_QUALITY)
    assert sniff_format(data) == "jpeg"
    out = decode_image(data, "jpeg")
    assert out.shape == arr.shape
    assert psnr(arr, out) >= 40.0


def test_jpeg_noise_roundtrip():
    rng = np.random.default_rng(42)
    arr = rng.integers(0, 256, (48, 56, 3)).astype(np.uint8)
    out = decode_image(encode_image(arr, "jpeg", quality=JPEG_QUALITY))
    assert out.shape == arr.shape


def test_gray_png_tiff():
    arr = (np.arange(400, dtype=np.uint8).reshape(20, 20)) % 251
    for fmt in ("png", "tiff"):
        out = decode_image(encode_image(arr, fmt), fmt)
        assert np.array_equal(out, arr)
