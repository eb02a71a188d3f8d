"""BMP (raster/bmp.py) and ENVI flat binary (raster/envi.py)."""

import numpy as np
import pytest

from gdal_spark.raster.bmp import decode_bmp, encode_bmp
from gdal_spark.raster.envi import decode_envi, encode_envi


def test_bmp_24bit_padding_roundtrip():
    rng = np.random.default_rng(21)
    for w in (1, 2, 3, 5, 64):          # every stride-padding case
        arr = rng.integers(0, 256, size=(7, w, 3)).astype(np.uint8)
        assert np.array_equal(decode_bmp(encode_bmp(arr)), arr), w


def test_bmp_paletted_roundtrip():
    rng = np.random.default_rng(22)
    idx = rng.integers(0, 200, size=(9, 13)).astype(np.uint8)
    pal = rng.integers(0, 256, size=(200, 3)).astype(np.uint8)
    i2, p2 = decode_bmp(encode_bmp(idx, palette=pal))
    assert np.array_equal(i2, idx)
    assert np.array_equal(p2[:200], pal)


def test_bmp_refuses_rle():
    b = bytearray(encode_bmp(np.zeros((2, 2, 3), np.uint8)))
    b[30] = 1  # compression = BI_RLE8
    with pytest.raises(ValueError, match="uncompressed"):
        decode_bmp(bytes(b))


@pytest.mark.parametrize("il", ["bsq", "bil", "bip"])
@pytest.mark.parametrize("dt", [np.uint8, np.int16, np.float32, np.uint16])
def test_envi_interleaves_dtypes(il, dt):
    rng = np.random.default_rng(23)
    a = rng.integers(0, 200, size=(6, 7, 3)).astype(dt)
    raw, hdr = encode_envi(a, interleave=il)
    back, geo = decode_envi(raw, hdr)
    assert np.array_equal(back, a)
    assert geo is None


def test_envi_map_info_georef():
    a = np.zeros((4, 5), np.uint8)
    gt = (10.0, 0.5, 0.0, 99.0, 0.0, -0.5)
    raw, hdr = encode_envi(a, geo=(gt, 3857))
    back, geo = decode_envi(raw, hdr)
    assert geo == (gt, 3857)
    assert "map info" in hdr and "EPSG:3857" in hdr


def test_envi_foreign_header_whitespace():
    """Key = value headers with scattered case/whitespace parse."""
    a = np.arange(12, dtype=np.uint8).reshape(3, 4)
    raw, _ = encode_envi(a)
    hdr = (
        "ENVI\nsamples   =  4\nLines = 3\nbands=1\n"
        "header offset = 0\ndata type = 1\ninterleave = BSQ\n"
        "byte order = 0\n"
    )
    back, _ = decode_envi(raw, hdr)
    assert np.array_equal(back[:, :, 0], a)
