"""GRIB2 simple-packing codec properties (raster/grib.py).

Semantics mirrored from the reference writer
(/root/reference/frmts/grib/gribcreatecopy.cpp): sign-magnitude
signed fields, big-endian sections, bottom-to-top +j scanning,
val = (R + X*2^E) / 10^D simple unpacking.
"""

import numpy as np
import pytest

from gdal_spark.raster.grib import (
    _pack_bits,
    _read_s,
    _s,
    _unpack_bits,
    decode_grib2,
    encode_grib2,
)


def test_sign_magnitude_fields():
    # gribcreatecopy.cpp:83 WriteInt16: high bit = sign, magnitude below
    assert _s(5, 2) == b"\x00\x05"
    assert _s(-5, 2) == b"\x80\x05"
    assert _read_s(_s(-12345, 4), 0, 4) == -12345
    assert _read_s(b"\x00\x00\x30\x39", 0, 4) == 12345


def test_bit_packing_roundtrip():
    rng = np.random.default_rng(3)
    for nbits in (1, 3, 8, 11, 16, 24):
        vals = rng.integers(0, 1 << nbits, size=257).astype(np.uint64)
        out = _unpack_bits(_pack_bits(vals, nbits), 257, nbits)
        assert (out == vals.astype(np.int64)).all()


def test_multiband_uint8_roundtrip():
    rng = np.random.default_rng(11)
    a = rng.integers(0, 256, size=(33, 47, 3)).astype(np.uint8)
    out, meta = decode_grib2(encode_grib2(a))
    assert meta["nbands"] == 3
    assert (out == a).all()


def test_negative_and_constant_bands():
    rng = np.random.default_rng(5)
    neg = rng.integers(-9000, -100, size=(19, 21))
    const = np.full((19, 21), 777)
    out, _ = decode_grib2(encode_grib2(np.stack([neg, const], axis=2)))
    assert (out[:, :, 0] == neg).all()
    assert (out[:, :, 1] == const).all()


def test_constant_band_has_zero_databits():
    # nbits=0 -> empty section 7 payload (the reference's bUseZeroBits)
    buf = encode_grib2(np.full((8, 8), 3))
    assert len(decode_grib2(buf)[0].ravel()) == 64
    # total message must be smaller than one carrying 64 packed values
    assert len(buf) < len(encode_grib2(np.arange(64).reshape(8, 8)))


def test_decimal_scale_tenths():
    rng = np.random.default_rng(2)
    vals = rng.integers(-800, 800, size=(14, 9)) / 10.0
    out, _ = decode_grib2(encode_grib2(vals, dscale=1))
    assert out.dtype == np.float64
    assert np.allclose(out[:, :, 0], vals, atol=1e-12)


def test_inexact_at_decimal_scale_raises():
    with pytest.raises(ValueError, match="not exact"):
        encode_grib2(np.array([[0.123]]), dscale=1)


def test_georef_roundtrip_and_scanning():
    gt = (-10.0, 0.5, 0.0, 60.0, 0.0, -0.5)
    a = np.arange(20 * 12).reshape(20, 12)
    buf = encode_grib2(a, geo=(gt, 4326))
    out, meta = decode_grib2(buf)
    assert (out[:, :, 0] == a).all()          # row order restored
    assert np.allclose(meta["geotransform"], gt, atol=1e-9)


def test_rotated_geotransform_rejected():
    with pytest.raises(ValueError, match="rotated"):
        encode_grib2(np.zeros((4, 4)), geo=((0, 1, 0.1, 0, 0, -1), 4326))


def test_bad_magic_and_truncation():
    with pytest.raises(ValueError, match="magic"):
        decode_grib2(b"NOPE" + b"\x00" * 20)
    good = encode_grib2(np.arange(16).reshape(4, 4))
    with pytest.raises(ValueError):
        decode_grib2(good[:-4])  # missing 7777


def test_sniff_dispatch():
    from gdal_spark.raster.codecs import sniff_format

    assert sniff_format(encode_grib2(np.zeros((2, 2)))[:12]) == "grib"
