"""USGS DEM codec properties (raster/usgsdem.py) vs the reference's
frmts/usgsdem/usgsdemdataset.cpp fixed-offset A record + column
profiles."""

import numpy as np
import pytest

from gdal_spark.raster.usgsdem import (
    USGSDEM_NODATA,
    decode_usgsdem,
    encode_usgsdem,
)


def test_roundtrip_and_geotransform():
    rng = np.random.default_rng(8)
    a = rng.integers(-300, 4000, size=(40, 55)).astype(np.int32)
    out, meta = decode_usgsdem(
        encode_usgsdem(a, lon0_deg=-120.0, lat0_deg=35.0,
                       dx_sec=30, dy_sec=30)
    )
    assert (out == a).all()
    gt = meta["geotransform"]
    assert gt[0] == pytest.approx(-120.0 - 30 / 7200)
    assert gt[1] == pytest.approx(30 / 3600)
    assert gt[3] == pytest.approx(35.0 + 39 * 30 / 3600 + 30 / 7200)
    assert meta["geographic"]


def test_a_record_layout():
    buf = encode_usgsdem(np.zeros((3, 4), np.int32), lon0_deg=10,
                         lat0_deg=50)
    assert int(buf[156:162]) == 0           # geographic
    assert int(buf[858:864]) == 4           # profiles = columns
    assert buf[864:876].split() == [b"1", b"1"]
    assert b"D+" in buf[546:738]            # Fortran exponents
    # profiles land on 1024-byte boundaries
    assert len(buf) % 1024 == 0


def test_negative_token_fusing():
    # "  2513-32767": fixed 6-char fields fuse at a sign; the reader
    # must split on '-' like the reference's int scanner
    a = np.array([[2513, -32000], [-1, 7]], dtype=np.int32)
    out, _ = decode_usgsdem(encode_usgsdem(a))
    assert (out == a).all()


def test_nodata_passthrough():
    a = np.full((5, 5), 100, dtype=np.int32)
    a[2, 2] = USGSDEM_NODATA
    out, _ = decode_usgsdem(encode_usgsdem(a))
    assert out[2, 2] == USGSDEM_NODATA
    assert out[0, 0] == 100


def test_int16_bound_rejected():
    with pytest.raises(ValueError, match="int16"):
        encode_usgsdem(np.array([[40000]]))


def test_not_dem_rejected():
    with pytest.raises(ValueError, match="USGS DEM"):
        decode_usgsdem(b" " * 2048)
