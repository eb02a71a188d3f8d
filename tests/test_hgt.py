"""SRTM HGT codec (raster/hgt.py)."""

import numpy as np
import pytest

from gdal_spark.raster.hgt import (
    NODATA, decode_hgt, encode_hgt, hgt_name, parse_hgt_name,
)


def test_name_parse_all_quadrants():
    assert parse_hgt_name("N51E000.hgt") == (51, 0)
    assert parse_hgt_name("S14W077.hgt") == (-14, -77)
    assert parse_hgt_name("/some/dir/N00E100.hgt") == (0, 100)
    assert hgt_name(-14, -77) == "S14W077.hgt"
    with pytest.raises(ValueError):
        parse_hgt_name("NE51000.hgt")


def test_roundtrip_and_georef():
    n = 1201
    y, x = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    arr = ((x * 3 + y * 7) % 5000 - 500).astype(np.int16)
    arr[0, 0] = NODATA
    data = encode_hgt(arr)
    assert len(data) == n * n * 2
    # big-endian on the wire: first sample's high byte first
    assert data[0:2] == int(arr[0, 0] & 0xFFFF).to_bytes(2, "big")
    back, geo = decode_hgt(data, "S01W002.hgt")
    np.testing.assert_array_equal(back, arr)
    # point-registered geotransform (srtmhgtdataset.cpp:484-489)
    assert geo["dx"] == 1.0 / 1200
    assert geo["x0"] == -2 - 0.5 / 1200
    assert geo["y0"] == -1 + 1 + 0.5 / 1200
    assert geo["nodata"] == NODATA


def test_bad_sizes_rejected():
    with pytest.raises(ValueError):
        encode_hgt(np.zeros((100, 100), np.int16))
    with pytest.raises(ValueError):
        decode_hgt(b"\x00" * 1000, "N00E000.hgt")
