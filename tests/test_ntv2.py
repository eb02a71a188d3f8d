"""NTv2 .gsb writer/reader and grid-shift kernel.

Reference: /root/reference/frmts/raw/ntv2dataset.cpp (record layout,
positive-west longitudes, SE-corner node order) and the PROJ
hgridshift application semantics.
"""

import struct

import numpy as np
import pytest

from gdal_spark.fixtures import shiftgrid
from gdal_spark.geo.gridshift import _shift_once, apply_ntv2
from gdal_spark.raster.ntv2 import SubGrid, read_ntv2, write_ntv2


@pytest.fixture(scope="module")
def gsb_path(tmp_path_factory):
    p = str(tmp_path_factory.mktemp("ntv2") / "synth.gsb")
    write_ntv2(p, shiftgrid.make_grids())
    return p


def test_roundtrip_header_and_grids(gsb_path):
    header, grids = read_ntv2(gsb_path)
    assert header["GS_TYPE"] == "SECONDS"
    assert header["SYSTEM_F"] == "NTF"
    assert [g.name for g in grids] == ["SYNTHPAR", "SYNTHCHD"]
    assert grids[1].parent == "SYNTHPAR"
    src = shiftgrid.make_grids()
    for a, b in zip(src, grids):
        assert (a.nx, a.ny) == (b.nx, b.ny)
        np.testing.assert_array_equal(a.lat_shift, b.lat_shift)
        np.testing.assert_array_equal(a.lon_shift, b.lon_shift)


def test_raw_layout(gsb_path):
    """Byte-level: 16-byte records, west-positive stored longitudes,
    first node = south-east corner (ntv2dataset.cpp:30-67)."""
    data = open(gsb_path, "rb").read()
    assert data[0:8] == b"NUM_OREC"
    assert struct.unpack_from("<i", data, 8)[0] == 11
    # parent E_LONG record: east edge 0 east-positive -> stored -0.0
    off = 11 * 16  # first subgrid header
    assert data[off : off + 8] == b"SUB_NAME"
    e_long = struct.unpack_from("<d", data, off + 6 * 16 + 8)[0]
    w_long = struct.unpack_from("<d", data, off + 7 * 16 + 8)[0]
    assert e_long == 0.0 and w_long == 14400.0  # positive west
    # first node (SE corner) = value at a=0, b=nx-1
    g = shiftgrid.make_grids()[0]
    node0 = struct.unpack_from("<4f", data, off + 11 * 16)
    assert node0[0] == g.lat_shift[0, g.nx - 1]
    assert node0[1] == g.lon_shift[0, g.nx - 1]


def test_bilinear_hand_value(gsb_path):
    """Probe the parent grid mid-cell: hand-computed bilinear."""
    _, grids = read_ntv2(gsb_path)
    g = grids[0]
    # point at node (a=2, b=3) + (0.5, 0.25) cells
    lat = (g.s_lat + (2 + 0.5) * g.lat_inc) / 3600.0
    lon = (g.w_long + (3 + 0.25) * g.long_inc) / 3600.0
    lat_arr = np.array([lat])
    lon_arr = np.array([lon])
    dlat, dlon, hit = _shift_once([g], lat_arr, lon_arr)
    v = lambda a, b: ((7 * a + 13 * b + 5) % 40) / 16.0
    exp = ((v(2, 3) * 0.75 + v(2, 4) * 0.25) * 0.5
           + (v(3, 3) * 0.75 + v(3, 4) * 0.25) * 0.5)
    assert hit[0]
    assert dlat[0] * 3600.0 == pytest.approx(exp, abs=1e-9)


def test_child_overrides_parent(gsb_path):
    _, grids = read_ntv2(gsb_path)
    # a point inside the child window: lat 41.5, lon -2.5
    lat, lon = np.array([41.5]), np.array([-2.5])
    d_all = _shift_once(grids, lat, lon)
    d_par = _shift_once(grids[:1], lat, lon)
    d_chd = _shift_once(grids[1:], lat, lon)
    assert d_all[0][0] == d_chd[0][0] != d_par[0][0]
    # outside the child, parent applies
    lat2, lon2 = np.array([43.0]), np.array([-1.0])
    d_all2 = _shift_once(grids, lat2, lon2)
    d_par2 = _shift_once(grids[:1], lat2, lon2)
    assert d_all2[0][0] == d_par2[0][0]


def test_outside_passthrough_and_inverse_roundtrip(spark, gsb_path):
    _, grids = read_ntv2(gsb_path)
    pts = spark.createDataFrame(
        [(0, 41.25, -2.25), (1, 43.9, -0.1), (2, 10.0, 50.0)],
        "i long, lat double, lon double",
    )
    fwd = apply_ntv2(pts, grids).toPandas().set_index("i")
    assert bool(fwd.loc[2, "shifted"]) is False
    assert fwd.loc[2, "lat_out"] == 10.0 and fwd.loc[2, "lon_out"] == 50.0
    assert bool(fwd.loc[0, "shifted"]) and bool(fwd.loc[1, "shifted"])
    # forward shifts move points (arc-seconds scale)
    assert abs(fwd.loc[0, "lat_out"] - 41.25) > 1e-6
    # inverse(forward(p)) ~= p to fixed-point tolerance
    shifted = spark.createDataFrame(
        [(0, float(fwd.loc[0, "lat_out"]), float(fwd.loc[0, "lon_out"])),
         (1, float(fwd.loc[1, "lat_out"]), float(fwd.loc[1, "lon_out"]))],
        "i long, lat double, lon double",
    )
    inv = apply_ntv2(shifted, grids, inverse=True).toPandas().set_index("i")
    assert inv.loc[0, "lat_out"] == pytest.approx(41.25, abs=1e-9)
    assert inv.loc[0, "lon_out"] == pytest.approx(-2.25, abs=1e-9)
    assert inv.loc[1, "lat_out"] == pytest.approx(43.9, abs=1e-9)
    assert inv.loc[1, "lon_out"] == pytest.approx(-0.1, abs=1e-9)
