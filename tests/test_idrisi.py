"""Idrisi RST/RDC codec (raster/idrisi.py) vs
frmts/idrisi/IdrisiDataset.cpp."""

import numpy as np
import pytest

from gdal_spark.raster.idrisi import decode_rst, encode_rst


def test_all_types_roundtrip():
    rng = np.random.default_rng(3)
    for arr in (
        rng.integers(0, 256, (20, 30)).astype(np.uint8),
        rng.integers(-5000, 5000, (11, 7)).astype(np.int16),
        rng.normal(size=(6, 9)).astype(np.float32),
        rng.integers(0, 256, (8, 5, 3)).astype(np.uint8),
    ):
        out, _ = decode_rst(*encode_rst(arr))
        assert out.shape == arr.shape and (out == arr).all()


def test_rgb24_is_bgr_interleaved():
    rgb = np.zeros((1, 1, 3), np.uint8)
    rgb[0, 0] = [10, 20, 30]
    raw, rdc = encode_rst(rgb)
    assert raw == bytes([30, 20, 10])      # B,G,R on disk (:1448)
    assert "rgb24" in rdc


def test_rdc_keys_are_12_chars():
    _, rdc = encode_rst(np.zeros((2, 2), np.uint8))
    for line in rdc.splitlines():
        key = line.split(":", 1)[0]
        assert len(key) == 12, repr(key)
    assert "data type   : byte" in rdc
    assert "file type   : binary" in rdc


def test_geotransform_edges():
    gt = (100.0, 2.5, 0.0, 500.0, 0.0, -2.5)
    raw, rdc = encode_rst(np.zeros((10, 20), np.uint8), geo=(gt, 32610))
    assert "min. X      : 100.0" in rdc
    assert "max. X      : 150.0" in rdc     # 100 + 20*2.5 (outer edge)
    _, meta = decode_rst(raw, rdc)
    assert meta["geotransform"] == gt


def test_integer_is_little_endian():
    raw, _ = encode_rst(np.array([[258]], dtype=np.int16))
    assert raw == b"\x02\x01"


def test_unknown_type_rejected():
    _, rdc = encode_rst(np.zeros((1, 1), np.uint8))
    with pytest.raises(ValueError, match="unknown data type"):
        decode_rst(b"\x00", rdc.replace("byte", "quad"))
