"""DTED codec properties (raster/dted.py) vs the reference's
frmts/dted/dted_api.c + dted_create.c layout."""

import numpy as np
import pytest

from gdal_spark.raster.dted import decode_dted, encode_dted

_DATA_OFF = 80 + 648 + 2700


def test_level0_roundtrip_and_georef():
    rng = np.random.default_rng(4)
    a = rng.integers(-5000, 9000, size=(121, 121)).astype(np.int32)
    out, meta = decode_dted(encode_dted(a, lat0=51, lon0=-3))
    assert (out == a).all()
    assert meta["lat0"] == 51.0 and meta["lon0"] == -3.0
    gt = meta["geotransform"]
    assert gt[1] == pytest.approx(1.0 / 120.0)   # 30 arcsec
    assert gt[5] == pytest.approx(-1.0 / 120.0)


def test_arbitrary_size_roundtrip():
    rng = np.random.default_rng(9)
    b = rng.integers(-100, 300, size=(40, 57))
    out, _ = decode_dted(encode_dted(b, lat0=-10, lon0=120))
    assert (out == b).all()


def test_header_fields():
    buf = encode_dted(np.zeros((5, 7), dtype=np.int32), lat0=-33, lon0=151)
    assert buf[:4] == b"UHL1"
    assert buf[4:12] == b"1510000E"
    assert buf[12:20] == b"0330000S"
    assert buf[47:51] == b"0007" and buf[51:55] == b"0005"
    assert buf[80:83] == b"DSI"
    assert buf[80 + 648:80 + 651] == b"ACC"
    # column record: 0xAA sentinel, block/lon counts = column index
    rec = buf[_DATA_OFF:]
    assert rec[0] == 0xAA
    assert int.from_bytes(rec[2:4], "big") == 0
    rec1 = buf[_DATA_OFF + (12 + 5 * 2):]
    assert int.from_bytes(rec1[2:4], "big") == 1


def test_sign_magnitude_storage():
    # -5 at the NW corner: stored south->north, so the LAST elevation
    # of column 0 is the north row; bit 15 = sign (dted_api.c:770)
    a = np.array([[-5, 1], [2, 3]], dtype=np.int32)
    buf = encode_dted(a)
    col0 = buf[_DATA_OFF + 8:_DATA_OFF + 12]
    assert col0[2:4] == b"\x80\x05"   # north value of column 0
    assert col0[0:2] == b"\x00\x02"   # south value


def test_checksum_detects_corruption():
    buf = bytearray(encode_dted(np.arange(100).reshape(10, 10)))
    buf[_DATA_OFF + 9] ^= 0x01
    with pytest.raises(ValueError, match="checksum"):
        decode_dted(bytes(buf))
    # but can be skipped like the reference's bVerifyChecksum=FALSE
    decode_dted(bytes(buf), verify_checksum=False)


def test_improper_twos_complement_fallback():
    # dted_api.c:652: -200 written as raw two's complement 0xFF38
    # reads as sign-magnitude -32568 < -16000 -> reinterpreted
    buf = bytearray(encode_dted(np.array([[5]])))
    buf[_DATA_OFF + 8] = 0xFF
    buf[_DATA_OFF + 9] = 0x38
    s = sum(buf[_DATA_OFF:_DATA_OFF + 10])
    buf[_DATA_OFF + 10:_DATA_OFF + 14] = s.to_bytes(4, "big")
    out, _ = decode_dted(bytes(buf))
    assert out[0, 0] == -200


def test_magnitude_overflow_rejected():
    with pytest.raises(ValueError, match="15-bit"):
        encode_dted(np.array([[40000]]))


def test_not_dted_rejected():
    with pytest.raises(ValueError, match="UHL"):
        decode_dted(b"GARBAGE" + b"\x00" * 100)
