"""Erdas LAN codec (raster/lan.py)."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from gdal_spark.raster.lan import decode_lan, encode_lan


def test_u8_multiband_both_endians():
    a = np.arange(5 * 6 * 3, dtype=np.uint8).reshape(5, 6, 3)
    for be in (False, True):
        data = encode_lan(a, big_endian=be)
        assert data[:6] == b"HEAD74"
        assert (data[8] == 0) == be      # endianness detection byte
        out, _ = decode_lan(data)
        assert (out == a).all()


def test_i16_roundtrip():
    a = (np.arange(20).reshape(4, 5).astype(np.int16) - 7)
    for be in (False, True):
        out, _ = decode_lan(encode_lan(a, big_endian=be))
        assert (out[:, :, 0] == a).all()


def test_4bit_nibble_order():
    a = np.array([[1, 2, 3, 4], [15, 0, 7, 8]], dtype=np.uint8)
    data = encode_lan(a, four_bit=True)
    # even pixel in HIGH nibble (LAN4BitRasterBand unpack)
    assert data[128] == (1 << 4) | 2
    assert data[129] == (3 << 4) | 4
    out, _ = decode_lan(data)
    assert (out[:, :, 0] == a).all()


def test_4bit_rejects_bad_input():
    with pytest.raises(ValueError, match="0..15"):
        encode_lan(np.full((2, 4), 99, np.uint8), four_bit=True)
    with pytest.raises(ValueError, match="even"):
        encode_lan(np.zeros((2, 3), np.uint8), four_bit=True)


def test_georef_center_convention():
    a = np.zeros((4, 6), dtype=np.uint8)
    gt = (1000.0, 4.0, 0.0, 2000.0, 0.0, -4.0)
    _, meta = decode_lan(encode_lan(a, geo=(gt,)))
    assert meta["geotransform"] == gt


def test_header_float_size_variant():
    # HEADER magic stores W/H as float32 (landataset.cpp:48-56)
    a = np.arange(12, dtype=np.uint8).reshape(3, 4)
    data = bytearray(encode_lan(a))
    data[0:6] = b"HEADER"
    import struct

    struct.pack_into("<ff", data, 16, 4.0, 3.0)
    out, _ = decode_lan(bytes(data))
    assert (out[:, :, 0] == a).all()


@settings(max_examples=25, deadline=None)
@given(
    w=st.integers(1, 20), h=st.integers(1, 15),
    nb=st.integers(1, 4), be=st.booleans(),
    dt=st.sampled_from(["u1", "i2"]), seed=st.integers(0, 2**31 - 1),
)
def test_roundtrip_property(w, h, nb, be, dt, seed):
    rng = np.random.RandomState(seed)
    info = np.iinfo(dt)
    a = rng.randint(info.min, int(info.max) + 1,
                    size=(h, w, nb)).astype(dt)
    out, _ = decode_lan(encode_lan(a, big_endian=be))
    assert (out == a).all()
