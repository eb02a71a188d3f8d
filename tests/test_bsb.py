"""BSB/KAP codec (raster/bsb.py) vs frmts/bsb/bsb_read.c RLE rules."""

import numpy as np
import pytest

from gdal_spark.raster.bsb import _encode_run, decode_bsb, encode_bsb


def test_roundtrip_full_palette():
    rng = np.random.default_rng(9)
    pal = [(i, 255 - i, (i * 85) % 256) for i in range(1, 128)]
    idx = rng.integers(1, 128, size=(40, 60)).astype(np.uint8)
    out, p2, meta = decode_bsb(encode_bsb(idx, pal))
    assert (out == idx).all() and p2 == pal
    assert meta["color_size"] == 7 and meta["version"] == 300


def test_rle_multibyte_counts_compress():
    big = np.full((3, 5000), 5, dtype=np.uint8)
    big[1, :] = 1
    pal = [(1, 2, 3)] * 5
    buf = encode_bsb(big, pal)
    assert (decode_bsb(buf)[0] == big).all()
    assert len(buf) < 400              # 15k pixels in true runs


def test_run_packet_layout():
    # color size 3 -> 4 count bits; run of 5 (count 4) fits one byte
    assert _encode_run(value=5, length=5, cs=3) == bytes([(5 << 4) | 4])
    # count 200 needs a continuation byte: 200 = 1*128 + 72
    b = _encode_run(value=1, length=201, cs=3)
    assert b[0] == 0x80 | (1 << 4) | 1 and b[1] == 72


def test_header_and_line_numbers():
    buf = encode_bsb(np.ones((2, 3), np.uint8), [(9, 9, 9)])
    assert buf.startswith(b"!Copyright")
    assert b"BSB/NA=UNKNOWN,NU=999502,RA=3,2" in buf
    assert b"RGB/1,9,9,9" in buf
    assert b"\x1a\x00" in buf
    # color size 1 for a single entry
    assert decode_bsb(buf)[2]["color_size"] == 1


def test_small_color_sizes():
    for n_pal in (1, 3, 7, 15, 127):
        pal = [(i, i, i) for i in range(1, n_pal + 1)]
        idx = (np.arange(24).reshape(4, 6) % n_pal + 1).astype(np.uint8)
        out, p2, _ = decode_bsb(encode_bsb(idx, pal))
        assert (out == idx).all() and p2 == pal


def test_bad_inputs():
    with pytest.raises(ValueError, match="indices"):
        encode_bsb(np.zeros((1, 1), np.uint8), [(1, 1, 1)])
    with pytest.raises(ValueError, match="0x1A"):
        decode_bsb(b"no terminator here")
