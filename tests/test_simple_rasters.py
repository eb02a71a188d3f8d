"""TGA / FITS / Surfer / ZMap codec properties."""

import numpy as np
import pytest

from gdal_spark.raster.fits import decode_fits, encode_fits
from gdal_spark.raster.simplegrids import (
    decode_gsag,
    decode_gsbg,
    decode_zmap,
    encode_gsag,
    encode_gsbg,
    encode_zmap,
)
from gdal_spark.raster.tga import decode_tga, encode_tga

GT = (500.0, 2.0, 0.0, 800.0, 0.0, -2.0)


def test_tga_variants_roundtrip():
    rng = np.random.default_rng(6)
    rgb = rng.integers(0, 256, (20, 31, 3)).astype(np.uint8)
    for rle in (False, True):
        for tl in (True, False):
            out = decode_tga(encode_tga(rgb, rle=rle, top_left=tl))
            assert (out == rgb).all(), (rle, tl)
    gray = rng.integers(0, 4, (40, 50)).astype(np.uint8)
    assert (decode_tga(encode_tga(gray, rle=True)) == gray).all()


def test_tga_rle_compresses_and_bgr_on_wire():
    flat = np.zeros((64, 64), np.uint8)
    assert len(encode_tga(flat, rle=True)) < len(encode_tga(flat))
    px = np.zeros((1, 1, 3), np.uint8)
    px[0, 0] = [10, 20, 30]
    assert encode_tga(px)[18:21] == bytes([30, 20, 10])


def test_fits_header_blocks_and_types():
    i16 = np.arange(-6, 6, dtype=np.int16).reshape(3, 4)
    buf = encode_fits(i16)
    assert len(buf) % 2880 == 0
    assert buf[:6] == b"SIMPLE"
    out, meta = decode_fits(buf)
    assert (out == i16).all() and meta["bitpix"] == 16
    # big-endian on the wire: first data byte pair is the SOUTH row
    assert buf[2880:2882] == (2).to_bytes(2, "big", signed=True)


def test_fits_bzero_bscale():
    phys = np.array([[100.5, 101.0]])
    out, meta = decode_fits(encode_fits(phys, bzero=100.0, bscale=0.5))
    assert np.allclose(out, phys)
    # integer storage demands exactness at the given scale
    with pytest.raises(ValueError, match="not exact"):
        encode_fits(np.array([[10]], dtype=np.int16), bzero=1.0,
                    bscale=2.0)


def test_gsbg_gsag_node_center_bounds():
    z = np.arange(12, dtype=np.float64).reshape(3, 4)
    for enc, dec in ((encode_gsbg, decode_gsbg),
                     (encode_gsag, decode_gsag)):
        out, meta = dec(enc(z, geo=(GT, 0)))
        assert np.allclose(out, z)
        assert np.allclose(meta["geotransform"], GT)
    buf = encode_gsbg(z)
    assert buf[:4] == b"DSBB"
    # rows bottom-up: first float is the SW node
    import struct

    assert struct.unpack_from("<f", buf, 56)[0] == 8.0


def test_zmap_column_major_topdown():
    z = np.array([[1.0, 2.0], [3.0, 4.0], [5.0, 6.0]])
    txt = encode_zmap(z)
    out, meta = decode_zmap(txt)
    assert np.allclose(out, z)
    # first column top-down = 1, 3, 5 before any of column 2
    data = txt.split("@\n")[1].split()
    assert [float(v) for v in data[:3]] == [1.0, 3.0, 5.0]
    assert meta["nodata"] == pytest.approx(1e30)


def test_bad_signatures():
    with pytest.raises(ValueError):
        decode_gsbg(b"XXXX" + b"\x00" * 60)
    with pytest.raises(ValueError):
        decode_gsag("NOPE 1 1")
    with pytest.raises(ValueError):
        decode_zmap("no header here")
    with pytest.raises(ValueError):
        decode_fits(b" " * 2880 + b"\x00" * 2880)
