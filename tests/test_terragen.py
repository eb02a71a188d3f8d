"""Terragen TER codec (raster/terragen.py)."""

import numpy as np
import pytest

from gdal_spark.raster.terragen import decode_terragen, encode_terragen


def test_square_and_rect_roundtrip():
    rng = np.random.default_rng(2)
    sq = rng.integers(-2000, 2000, (33, 33)).astype(np.int16)
    out, _ = decode_terragen(encode_terragen(sq))
    assert (out == sq).all()
    rect = rng.integers(-2000, 2000, (20, 45)).astype(np.int16)
    buf = encode_terragen(rect)
    assert b"XPTS" in buf and b"YPTS" in buf
    out2, _ = decode_terragen(buf)
    assert (out2 == rect).all()
    # square files omit XPTS/YPTS (SIZE alone carries the dims)
    assert b"XPTS" not in encode_terragen(sq)


def test_scale_offset_metadata():
    a = np.zeros((4, 4), dtype=np.int16)
    _, meta = decode_terragen(
        encode_terragen(a, height_scale=2, base_height=10, scal=60.0)
    )
    assert meta["ground_scale"] == 60.0
    assert meta["scale"] == 60.0 * 2 / 65536.0
    assert meta["offset"] == 600.0
    # default SCAL (30) writes no SCAL chunk
    assert b"SCAL" not in encode_terragen(a)


def test_rows_bottom_up_on_wire():
    a = np.array([[1, 2], [3, 4]], dtype=np.int16)
    buf = encode_terragen(a)
    i = buf.index(b"ALTW") + 8
    # first stored row is the SOUTH row (3, 4)
    assert np.frombuffer(buf[i:i + 4], "<i2").tolist() == [3, 4]


def test_bad_signature():
    with pytest.raises(ValueError, match="signature"):
        decode_terragen(b"NOT A TERRAGEN!!" + b"\x00" * 30)
