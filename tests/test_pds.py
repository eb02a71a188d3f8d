"""PDS3 codec properties (raster/pds.py) vs the reference's
frmts/pds/pdsdataset.cpp label + sample-type semantics."""

import numpy as np
import pytest

from gdal_spark.raster.pds import decode_pds, encode_pds


def test_multiband_u8_roundtrip():
    rng = np.random.default_rng(5)
    a = rng.integers(0, 256, size=(30, 41, 3)).astype(np.uint8)
    out, meta = decode_pds(encode_pds(a))
    assert (out == a).all()
    assert meta["sample_type"] == "MSB_UNSIGNED_INTEGER"


def test_signed_int16_msb():
    b = np.array([[-5000, 0], [77, 32767]], dtype=np.int16)
    buf = encode_pds(b)
    assert b"MSB_INTEGER" in buf and b"SAMPLE_BITS = 16" in buf
    out, _ = decode_pds(buf)
    assert (out[:, :, 0] == b).all()
    # data really is big-endian on the wire
    assert out.dtype.kind == "i"


def test_float32_ieee():
    c = np.array([[1.5, -2.25]], dtype=np.float32)
    out, _ = decode_pds(encode_pds(c))
    assert (out[:, :, 0] == c).all()


def test_scaling_factor_offset():
    b = np.array([[10, 20]], dtype=np.int16)
    out, meta = decode_pds(encode_pds(b, scale=0.5, offset=100.0))
    assert out[0, 0, 0] == 105.0 and out[0, 1, 0] == 110.0
    assert meta["scale"] == 0.5 and meta["offset"] == 100.0


def test_label_is_record_aligned():
    buf = encode_pds(np.zeros((4, 4), dtype=np.uint8))
    # ^IMAGE points at the first data record (1-based)
    label = buf.split(b"END")[0]
    import re

    lr = int(re.search(rb"LABEL_RECORDS = (\d+)", buf).group(1))
    ptr = int(re.search(rb"\^IMAGE = (\d+)", buf).group(1))
    assert ptr == lr + 1
    assert len(buf) == lr * 512 + 16  # label records + 16 pixels
    assert len(label) < lr * 512


def test_lsb_sample_type_decodes():
    # hand-build a little-endian label variant
    buf = encode_pds(np.array([[258]], dtype=np.int16))
    patched = buf.replace(b"MSB_INTEGER", b"LSB_INTEGER")
    # re-encode the payload little-endian: 258 = 0x0102
    patched = patched[:-2] + (258).to_bytes(2, "little", signed=True)
    out, _ = decode_pds(patched)
    assert out[0, 0, 0] == 258


def test_non_pds_rejected():
    with pytest.raises(ValueError, match="PDS_VERSION_ID"):
        decode_pds(b"NOT A LABEL" + b" " * 600)
