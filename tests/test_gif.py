"""GIF codec (raster/gif.py) — LZW width/reset edges, interlace,
transparency, palette paths, dispatch (frmts/gif/gifdataset.cpp)."""

import numpy as np
import pytest

from gdal_spark.raster.gif import (
    decode_gif,
    decode_gif_rgb,
    encode_gif,
    encode_gif_rgb,
    lzw_decode,
    lzw_encode,
)


def test_lzw_roundtrip_widths():
    rng = np.random.default_rng(1)
    for mcs in (2, 4, 8):
        n = 1 << mcs
        for ln in (1, 2, 255, 5000):
            data = rng.integers(0, n, size=ln).astype(np.uint8)
            out = lzw_decode(lzw_encode(data, mcs), mcs, ln)
            assert np.array_equal(out, data), (mcs, ln)


def test_lzw_kwkwk_case():
    # 'aabbb…' patterns hit the code==next_code branch
    data = np.array([0, 0, 0, 0, 0, 1, 1, 1, 1, 1, 0, 0, 0], np.uint8)
    assert np.array_equal(lzw_decode(lzw_encode(data, 2), 2, len(data)), data)


def test_lzw_table_overflow_reset():
    # random 256-symbol stream long enough to fill 4096 entries
    rng = np.random.default_rng(2)
    data = rng.integers(0, 256, size=60000).astype(np.uint8)
    assert np.array_equal(lzw_decode(lzw_encode(data, 8), 8, len(data)), data)


def test_gif_interlace_roundtrip():
    rng = np.random.default_rng(3)
    for h in (1, 2, 7, 8, 33):
        idx = rng.integers(0, 16, size=(h, 9)).astype(np.uint8)
        pal = rng.integers(0, 256, size=(16, 3)).astype(np.uint8)
        b = encode_gif(idx, pal, interlace=True)
        i2, p2, _ = decode_gif(b)
        assert np.array_equal(i2, idx), h
        assert np.array_equal(p2[:16], pal)


def test_gif_transparent_index_gif89a():
    b = encode_gif(
        np.zeros((3, 3), np.uint8), np.zeros((5, 3), np.uint8),
        transparent=3,
    )
    assert b[:6] == b"GIF89a"
    assert decode_gif(b)[2] == 3
    # GIF87a without GCE -> no transparency
    b = encode_gif(np.zeros((3, 3), np.uint8), np.zeros((5, 3), np.uint8))
    assert b[:6] == b"GIF87a"
    assert decode_gif(b)[2] is None


def test_gif_rgb_exact_palette_and_limit():
    rng = np.random.default_rng(4)
    pal = rng.integers(0, 256, size=(200, 3)).astype(np.uint8)
    idx = rng.integers(0, 200, size=(40, 50))
    arr = pal[idx]
    assert np.array_equal(decode_gif_rgb(encode_gif_rgb(arr)), arr)
    # >256 distinct colors must refuse, loudly
    grad = np.zeros((32, 32, 3), np.uint8)
    grad[:, :, 0] = np.arange(32)[:, None]
    grad[:, :, 1] = np.arange(32)[None, :]
    with pytest.raises(ValueError, match="256"):
        encode_gif_rgb(grad)


def test_codec_dispatch():
    from gdal_spark.raster.codecs import decode_image, encode_image, sniff_format

    pal = np.arange(256, dtype=np.uint8)[:, None].repeat(3, 1)
    arr = pal[np.arange(64)[:, None] + np.arange(64)[None, :]]
    b = encode_image(arr, "gif")
    assert sniff_format(b) == "gif"
    assert np.array_equal(decode_image(b), arr)
