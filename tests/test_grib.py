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


# --- complex packing (5.2/7.2), spatial differencing (5.3/7.3),
# --- PNG packing (5.41/7.41) — g2clib compack/comunpack/dec_png


@pytest.mark.parametrize("packing", ["complex", "complex_diff", "png"])
def test_packing_roundtrips_random(packing):
    rng = np.random.default_rng(7)
    a = rng.integers(-5000, 5000, size=(29, 31, 2))
    out, meta = decode_grib2(encode_grib2(a, packing=packing))
    assert (out == a).all()
    assert meta["data_template"] in (2, 3, 41)


@pytest.mark.parametrize("order", [1, 2])
def test_spatial_diff_orders(order):
    rng = np.random.default_rng(13)
    a = rng.integers(0, 4000, size=(17, 23))
    buf = encode_grib2(a, packing="complex_diff", diff_order=order)
    out, meta = decode_grib2(buf)
    assert (out[:, :, 0] == a).all()
    assert meta["data_template"] == 3


def test_spatial_diff_compresses_smooth_ramp():
    # a linear ramp has constant second differences -> near-zero group
    # widths under order-2 differencing; complex alone still pays the
    # full span. The whole point of template 5.3.
    y, x = np.mgrid[0:64, 0:64]
    ramp = (7 * x + 11 * y).astype(np.int64)
    plain = encode_grib2(ramp, packing="complex")
    diffed = encode_grib2(ramp, packing="complex_diff", diff_order=2)
    assert len(diffed) < len(plain) // 2


def test_complex_constant_and_tiny_fields():
    const = np.full((6, 5), -42)
    out, _ = decode_grib2(encode_grib2(const, packing="complex"))
    assert (out[:, :, 0] == const).all()
    # fewer points than one group length
    small = np.array([[3, 1, 4], [1, 5, 9]])
    out, _ = decode_grib2(encode_grib2(small, packing="complex"))
    assert (out[:, :, 0] == small).all()


def test_png_packing_depth_ladder():
    # spans forcing depths 8, 16, 24, 32
    for span in (200, 60_000, 1 << 20, 1 << 28):
        a = np.linspace(0, span, 12 * 13).astype(np.int64).reshape(12, 13)
        out, meta = decode_grib2(encode_grib2(a, packing="png"))
        assert (out[:, :, 0] == a).all()
        assert meta["data_template"] == 41


def test_packing_decimal_scale():
    vals = np.arange(-60, 60).reshape(10, 12) / 10.0
    for packing in ("complex", "complex_diff", "png"):
        out, _ = decode_grib2(encode_grib2(vals, dscale=1, packing=packing))
        assert np.allclose(out[:, :, 0], vals, atol=1e-12)


def test_jpeg2000_packing_roundtrip():
    """Template 5.40 rides the from-scratch T.800 codec (round 5);
    depth 8 and 16 spans, offsets, and decimal scale all bit-exact."""
    rng = np.random.default_rng(11)
    for span in (200, 60_000):
        a = np.linspace(0, span, 20 * 17).astype(np.int64).reshape(20, 17)
        out, meta = decode_grib2(encode_grib2(a, packing="jpeg2000"))
        assert (out[:, :, 0] == a).all()
        assert meta["data_template"] == 40
    neg = rng.integers(-300, 9500, (23, 31)).astype(np.int64)
    out, _ = decode_grib2(encode_grib2(neg, packing="jpeg2000"))
    assert (out[:, :, 0] == neg).all()
    vals = np.arange(-60, 60).reshape(10, 12) / 10.0
    out, _ = decode_grib2(encode_grib2(vals, dscale=1, packing="jpeg2000"))
    assert np.allclose(out[:, :, 0], vals, atol=1e-12)


def test_jpeg2000_packing_span_limit():
    with pytest.raises(ValueError, match="16 bits"):
        encode_grib2(np.array([[0, 1 << 17]]), packing="jpeg2000")


def test_bad_packing_args():
    with pytest.raises(ValueError, match="unknown packing"):
        encode_grib2(np.zeros((4, 4)), packing="jasper")
    with pytest.raises(ValueError, match="order"):
        encode_grib2(np.zeros((4, 4)), packing="complex_diff", diff_order=3)
    with pytest.raises(ValueError, match="too small"):
        encode_grib2(np.array([[1, 2]]).T[:1], packing="complex_diff")


def test_png16_codec_roundtrip():
    from gdal_spark.raster.png import decode_png, encode_png

    rng = np.random.default_rng(21)
    a = rng.integers(0, 1 << 16, size=(19, 27)).astype(np.uint16)
    out = decode_png(encode_png(a))
    assert out.dtype == np.uint16
    assert (out.reshape(19, 27) == a).all()


def test_png16_filtered_scanlines_decode():
    # foreign encoders may emit non-zero filters; exercise _unfilter
    # with bpp=2 by hand-building a sub-filtered 16-bit image.
    import struct
    import zlib

    from gdal_spark.raster.png import decode_png

    h, w = 3, 4
    a = (np.arange(h * w, dtype=np.uint16) * 4099).reshape(h, w)
    body = a.astype(">u2").view(np.uint8).reshape(h, 2 * w)
    rows = []
    for r in range(h):
        raw = body[r].astype(np.int64)
        line = raw.copy()
        line[2:] = (raw[2:] - raw[:-2]) % 256  # filter 1 (Sub), bpp=2
        rows.append(bytes([1]) + bytes(line.astype(np.uint8)))
    sig = b"\x89PNG\r\n\x1a\n"

    def chunk(tag, data):
        return (struct.pack(">I", len(data)) + tag + data
                + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", w, h, 16, 0, 0, 0, 0)
    buf = (sig + chunk(b"IHDR", ihdr)
           + chunk(b"IDAT", zlib.compress(b"".join(rows)))
           + chunk(b"IEND", b""))
    out = decode_png(buf)
    assert (out.reshape(h, w) == a).all()
