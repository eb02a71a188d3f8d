"""HF2/HFZ codec (raster/hf2.py) vs frmts/hf2/hf2dataset.cpp."""

import gzip
import struct

import numpy as np
import pytest

from gdal_spark.raster.hf2 import decode_hf2, encode_hf2


def test_roundtrip_multi_tile_and_gzip():
    rng = np.random.default_rng(12)
    a = rng.integers(-4000, 9000, size=(150, 203)).astype(np.int64)
    gt = (500000.0, 30.0, 0.0, 4100000.0, 0.0, -30.0)
    for gz in (False, True):
        out, meta = decode_hf2(
            encode_hf2(a, geo=(gt, 32633), gz=gz, tile_size=64)
        )
        assert (out == a).all()
        assert np.allclose(meta["geotransform"], gt)


def test_word_size_escalation():
    b = np.zeros((10, 10), dtype=np.int64)
    b[0, 5] = 100000       # delta needs 4 bytes
    b[3, 2] = -500         # delta needs 2 bytes
    buf = encode_hf2(b)
    assert (decode_hf2(buf)[0] == b).all()
    # smooth data stays at 1-byte deltas -> much smaller
    smooth = np.arange(100).reshape(10, 10)
    assert len(encode_hf2(smooth)) < len(buf)


def test_header_layout():
    buf = encode_hf2(np.zeros((8, 8), dtype=np.int64))
    assert buf[:4] == b"HF2\0"
    w, h = struct.unpack_from("<ii", buf, 6)
    assert (w, h) == (8, 8)
    assert b"georef-extents" in buf


def test_hfz_is_gzip():
    buf = encode_hf2(np.zeros((8, 8), dtype=np.int64), gz=True)
    assert buf[:2] == b"\x1f\x8b"
    assert gzip.decompress(buf)[:4] == b"HF2\0"


def test_bad_magic():
    with pytest.raises(ValueError, match="magic"):
        decode_hf2(b"NOPE" + b"\x00" * 40)
