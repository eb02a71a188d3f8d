"""NITF 2.1 codec (raster/nitf.py)."""

import numpy as np
import pytest

from gdal_spark.raster.nitf import decode_nitf, encode_nitf, is_nitf


def _rgb(h, w, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(h, w, 3)).astype(np.uint8)


@pytest.mark.parametrize("imode", ["B", "P"])
def test_rgb_roundtrip(imode):
    px = _rgb(33, 47)
    data = encode_nitf(px, imode=imode)
    assert is_nitf(data)
    out, meta = decode_nitf(data)
    assert meta["imode"] == imode and meta["nbpp"] == 8
    np.testing.assert_array_equal(out, px)


def test_mono_16bit_roundtrip():
    px = (np.arange(40 * 25, dtype=np.uint16).reshape(40, 25) * 257) % 65536
    out, meta = decode_nitf(encode_nitf(px.astype(np.uint16)))
    assert meta["nbpp"] == 16
    np.testing.assert_array_equal(out[:, :, 0], px)


def test_igeolo_corners_roundtrip():
    corners = (
        (40 * 3600 + 30 * 60 + 15, -(100 * 3600 + 45)),
        (40 * 3600 + 30 * 60 + 15, -(100 * 3600)),
        (40 * 3600, -(100 * 3600)),
        (40 * 3600, -(100 * 3600 + 45)),
    )
    out, meta = decode_nitf(
        encode_nitf(_rgb(8, 8), corners_arcsec=corners)
    )
    assert meta["corners_arcsec"] == corners


def test_no_icords_when_omitted():
    _, meta = decode_nitf(encode_nitf(_rgb(4, 4)))
    assert meta["corners_arcsec"] is None


def test_southern_western_hemispheres():
    corners = tuple(
        (-(10 * 3600 + 1), -(170 * 3600 + 59 * 60 + 59)) for _ in range(4)
    )
    _, meta = decode_nitf(encode_nitf(_rgb(4, 4), corners_arcsec=corners))
    assert meta["corners_arcsec"] == corners


def test_header_offsets_are_selfconsistent():
    # FL and HL fields must equal actual lengths; decode re-checks
    data = encode_nitf(_rgb(10, 10))
    fl_off = data.index(b"GDALSPARK")  # OSTAID anchors nothing; parse FL/HL
    # FL is 12 digits at a fixed offset: find via the decode walk instead
    out, _ = decode_nitf(data)
    assert out.shape == (10, 10, 3)
    # corrupting HL must fail loudly
    bad = bytearray(data)
    hl_pos = 4 + 5 + 2 + 4 + 10 + 14 + 80 + 1 + 166 + 5 + 5 + 1 + 3 + 24 + 18 + 12
    bad[hl_pos : hl_pos + 6] = b"000300"
    with pytest.raises(ValueError):
        decode_nitf(bytes(bad))


def test_compressed_ic_rejected_loudly():
    data = bytearray(encode_nitf(_rgb(6, 6)))
    pos = data.index(b"NC", 400)  # IC field inside the subheader
    data[pos : pos + 2] = b"C3"
    with pytest.raises(ValueError, match="IC"):
        decode_nitf(bytes(data))


def test_imode_b_and_p_decode_identically():
    px = _rgb(21, 17, seed=5)
    a, _ = decode_nitf(encode_nitf(px, imode="B"))
    b, _ = decode_nitf(encode_nitf(px, imode="P"))
    np.testing.assert_array_equal(a, b)


def test_width_assertion_guards_fields():
    with pytest.raises(ValueError, match="width"):
        encode_nitf(_rgb(4, 4), ftitle="x" * 99)
