"""Paletted raster codecs: PNG color type 3 (PLTE/tRNS) and TIFF
PhotometricInterpretation=3 (ColorMap)."""

import numpy as np
import pytest

from gdal_spark.raster.png import (
    decode_png,
    decode_png_paletted,
    encode_png_paletted,
)
from gdal_spark.raster.tiff import (
    decode_tiff,
    decode_tiff_paletted,
    encode_tiff,
    read_georef,
)


def test_png_paletted_roundtrip_and_expand():
    rng = np.random.default_rng(11)
    idx = rng.integers(0, 200, size=(40, 30)).astype(np.uint8)
    pal = rng.integers(0, 256, size=(200, 3)).astype(np.uint8)
    b = encode_png_paletted(idx, pal, transparent=7)
    i2, p2, tr = decode_png_paletted(b)
    assert np.array_equal(i2, idx)
    assert np.array_equal(p2, pal)
    assert tr == 7
    assert np.array_equal(decode_png(b), pal[idx])  # -expand rgb


def test_png_paletted_no_trns():
    idx = np.zeros((3, 3), np.uint8)
    pal = np.zeros((4, 3), np.uint8)
    assert decode_png_paletted(encode_png_paletted(idx, pal))[2] is None
    with pytest.raises(ValueError, match="palette"):
        encode_png_paletted(idx, np.zeros((300, 3), np.uint8))


def test_tiff_colormap_roundtrip_and_expand():
    rng = np.random.default_rng(12)
    idx = rng.integers(0, 256, size=(33, 47)).astype(np.uint8)
    pal = rng.integers(0, 256, size=(256, 3)).astype(np.uint8)
    b = encode_tiff(idx, palette=pal)
    i2, p2 = decode_tiff_paletted(b)
    assert np.array_equal(i2, idx)
    assert np.array_equal(p2, pal)  # v*257 // 257 exact
    assert np.array_equal(decode_tiff(b), pal[idx])


def test_tiff_colormap_with_georef():
    idx = np.arange(16, dtype=np.uint8).reshape(4, 4)
    pal = np.arange(16, dtype=np.uint8)[:, None].repeat(3, 1)
    gt = (100.0, 0.5, 0.0, 200.0, 0.0, -0.5)
    b = encode_tiff(idx, geo=(gt, 3857), palette=pal)
    got_gt, epsg = read_georef(b)
    assert epsg == 3857 and got_gt == gt
    assert np.array_equal(decode_tiff_paletted(b)[0], idx)
    with pytest.raises(ValueError, match="single band"):
        encode_tiff(np.zeros((2, 2, 3), np.uint8), palette=pal)
