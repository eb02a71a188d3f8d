"""AAIGrid / XYZ text-raster codecs (raster/asciigrid.py).

Reference: frmts/aaigrid/aaigriddataset.cpp (header variants,
token-stream values), frmts/xyz/xyzdataset.cpp (cell-center triples,
separator set, orientation inference).
"""

import numpy as np
import pytest

from gdal_spark.raster.asciigrid import (
    decode_aaigrid,
    decode_xyz,
    encode_aaigrid,
    encode_xyz,
    sniff_ascii_format,
)


def _dem(h=4, w=5):
    y, x = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    return (3 * x + 5 * y).astype(np.float64)


def test_aaigrid_roundtrip_corner():
    src = _dem()
    buf = encode_aaigrid(src, xll=10, yll=20, cellsize=2, nodata=-9999)
    assert sniff_ascii_format(buf) == "aaigrid"
    back, geo = decode_aaigrid(buf)
    np.testing.assert_array_equal(back, src)
    # x0 = xllcorner; y0 = yll + nrows*cellsize (north-up top edge)
    assert (geo["x0"], geo["y0"], geo["dx"], geo["dy"]) == (10, 28, 2, 2)
    assert geo["nodata"] == -9999


def test_aaigrid_center_variant_and_wrapped_values():
    src = _dem(2, 3)
    buf = encode_aaigrid(src, xll=100, yll=200, cellsize=4, center=True)
    assert b"xllcenter" in buf
    # token-stream parse: rewrap the value block onto one long line
    head, _, vals = buf.decode().partition("cellsize     4\n")
    rewrapped = (head + "cellsize     4\n" + vals.replace("\n", " ")).encode()
    back, geo = decode_aaigrid(rewrapped)
    np.testing.assert_array_equal(back, src)
    # x0 = xllcenter - cellsize/2 (aaigriddataset.cpp:548)
    assert geo["x0"] == 98.0
    assert geo["y0"] == 200.0 - 2.0 + 8.0


def test_aaigrid_dx_dy_keys():
    buf = (
        b"ncols 2\nnrows 2\ndx 1.5\ndy 0.5\n"
        b"xllcorner 0\nyllcorner 0\n1 2\n3 4\n"
    )
    back, geo = decode_aaigrid(buf)
    assert (geo["dx"], geo["dy"]) == (1.5, 0.5)
    np.testing.assert_array_equal(back, [[1, 2], [3, 4]])


def test_xyz_roundtrip_and_separators():
    src = _dem(3, 4)
    for sep, header in ((" ", True), (",", False), (";", True)):
        buf = encode_xyz(src, x0=0, y0=30, dx=2, dy=10, sep=sep, header=header)
        assert sniff_ascii_format(buf) == "xyz"
        back, geo = decode_xyz(buf)
        np.testing.assert_array_equal(back, src)
        assert (geo["x0"], geo["y0"], geo["dx"], geo["dy"]) == (0, 30, 2, 10)


def test_xyz_any_row_order():
    src = _dem(3, 3)
    buf = encode_xyz(src, x0=0, y0=3, dx=1, dy=1, header=False)
    lines = buf.decode().strip().splitlines()
    shuffled = "\n".join(lines[::-1]).encode()  # south-up order
    back, _ = decode_xyz(shuffled)
    np.testing.assert_array_equal(back, src)


def test_xyz_irregular_spacing_rejected():
    bad = b"0 0 1\n1 0 2\n3 0 3\n"
    with pytest.raises(ValueError, match="irregular x"):
        decode_xyz(bad)
