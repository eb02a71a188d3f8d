"""Ogg container + FLAC-in-Ogg mapping (raster/ogg.py)."""

import struct

import numpy as np
import pytest

from gdal_spark.raster.flac import encode_flac
from gdal_spark.raster.ogg import (
    _crc32,
    _packets,
    decode_ogg,
    encode_ogg_flac,
    is_ogg,
)


def _sig(n, ch=1, seed=3):
    rng = np.random.default_rng(seed)
    return rng.integers(-3000, 3000, size=(n, ch)).astype(np.int16)


def test_roundtrip_mono():
    s = _sig(5000)
    data = encode_ogg_flac(s, 16000)
    assert is_ogg(data)
    out, rate = decode_ogg(data)
    assert rate == 16000
    np.testing.assert_array_equal(out, s)


def test_roundtrip_stereo_multipage():
    # big enough that frames force packet spans and several pages
    s = _sig(40000, ch=2, seed=9)
    out, rate = decode_ogg(encode_ogg_flac(s, 44100))
    assert rate == 44100
    np.testing.assert_array_equal(out, s)


def test_page_structure_and_flags():
    s = _sig(9000)
    data = encode_ogg_flac(s)
    # first page: BOS flag
    assert data[:4] == b"OggS" and data[5] & 0x02
    # walk pages, find exactly one EOS on the last one
    pos, flags, granules = 0, [], []
    while pos < len(data):
        nseg = data[pos + 26]
        body = sum(data[pos + 27 : pos + 27 + nseg])
        flags.append(data[pos + 5])
        granules.append(struct.unpack("<q", data[pos + 6 : pos + 14])[0])
        pos += 27 + nseg + body
    assert sum(1 for f in flags if f & 0x04) == 1 and flags[-1] & 0x04
    assert granules[-1] == 9000  # samples completed at EOS


def test_crc_is_ogg_polynomial():
    # known property: CRC of empty input is 0; one zero byte stays 0
    assert _crc32(b"") == 0
    assert _crc32(b"\x00") == 0
    # non-reflected table-driven check against a bitwise reference
    def ref(data):
        crc = 0
        for b in data:
            crc ^= b << 24
            for _ in range(8):
                crc = ((crc << 1) ^ 0x04C11DB7) if crc & 0x80000000 else crc << 1
                crc &= 0xFFFFFFFF
        return crc
    for probe in (b"OggS", b"\x01\x02\x03\x04\x05", bytes(range(200))):
        assert _crc32(probe) == ref(probe)


def test_corrupt_page_raises():
    data = bytearray(encode_ogg_flac(_sig(3000)))
    data[40] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        decode_ogg(bytes(data))


def test_non_flac_payload_raises_loudly():
    # a minimal fake Vorbis BOS page
    body = b"\x01vorbis" + bytes(23)
    hdr = struct.pack("<4sBBqIII", b"OggS", 0, 0x02, 0, 1, 0, 0)
    page = bytearray(hdr + bytes([1, len(body)]) + body)
    page[22:26] = struct.pack("<I", _crc32(bytes(page)))
    with pytest.raises(ValueError, match="codec stack"):
        decode_ogg(bytes(page))


def test_packet_reassembly_handles_255_multiple():
    # hand-build a stream whose single packet length is exactly 255
    pkt = bytes(range(255)) * 1
    from gdal_spark.raster.ogg import _paginate

    data = _paginate([(pkt, 0)], serial=7)
    assert _packets(data) == [pkt]


def test_native_flac_equivalence():
    # the Ogg path must decode to the same samples as the native path
    s = _sig(7000, ch=2, seed=4)
    from gdal_spark.raster.flac import decode_flac

    a, _ = decode_flac(encode_flac(s, 8000))
    b, _ = decode_ogg(encode_ogg_flac(s, 8000))
    np.testing.assert_array_equal(a, b)
