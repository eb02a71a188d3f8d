"""NetCDF classic source/sink (gdal_spark/sources/netcdf.py).

Format re-derived from the public CDF-1/CDF-2 spec; reference
semantics /root/reference/frmts/netcdf/netcdfdataset.cpp and
/root/reference/autotest/gdrivers/netcdf_multidim.py."""

import struct

import numpy as np
import pytest

from gdal_spark.operators.multidim import MDArray
from gdal_spark.sources.netcdf import (
    NC_DOUBLE,
    NC_INT,
    parse_header,
    read_netcdf,
    write_netcdf,
)


def _cube_md(spark, t=4, y=3, x=5):
    rows = [
        (tt, yy, xx, (7 * tt + 13 * yy + 29 * xx + 3) % 251)
        for tt in range(t) for yy in range(y) for xx in range(x)
    ]
    df = spark.createDataFrame(rows, "t long, y long, x long, value int")
    return MDArray(df=df, dims=(("t", t), ("y", y), ("x", x)),
                   value_col="value")


def test_header_bytes_cdf1(spark, tmp_path):
    md = _cube_md(spark)
    p = str(tmp_path / "c1.nc")
    write_netcdf(md, p, version=1, atts={"title": "x"})
    blob = open(p, "rb").read()
    assert blob[:4] == b"CDF\x01"
    hdr = parse_header(blob)
    assert hdr["numrecs"] == 0
    assert hdr["dims"] == [("t", 4), ("y", 3), ("x", 5)]
    assert hdr["gatts"] == {"title": "x"}
    v = hdr["vars"][0]
    assert v["name"] == "data" and v["dimids"] == [0, 1, 2]
    assert v["nc_type"] == NC_INT and v["vsize"] == 4 * 3 * 5 * 4
    # data block is big-endian row-major right at begin
    arr = np.frombuffer(blob[v["begin"]:v["begin"] + v["vsize"]],
                        dtype=">i4").reshape(4, 3, 5)
    assert arr[2, 1, 3] == (14 + 13 + 87 + 3) % 251


def test_header_bytes_cdf2_record(spark, tmp_path):
    md = _cube_md(spark)
    p = str(tmp_path / "c2.nc")
    write_netcdf(md, p, version=2, record_dim=True)
    blob = open(p, "rb").read()
    assert blob[:4] == b"CDF\x02"
    hdr = parse_header(blob)
    assert hdr["numrecs"] == 4
    assert hdr["dims"][0] == ("t", 0)  # THE record dimension
    v = hdr["vars"][0]
    assert v["vsize"] == 3 * 5 * 4  # one record's slab
    # record r=3 slab
    arr = np.frombuffer(
        blob[v["begin"] + 3 * v["vsize"]:v["begin"] + 4 * v["vsize"]],
        dtype=">i4",
    ).reshape(3, 5)
    assert arr[0, 0] == (21 + 3) % 251


@pytest.mark.parametrize("version,record", [(1, False), (2, True)])
def test_roundtrip(spark, tmp_path, version, record):
    md = _cube_md(spark)
    p = str(tmp_path / f"rt{version}{record}.nc")
    write_netcdf(md, p, version=version, record_dim=record)
    back = read_netcdf(spark, p, slab_rows=2)
    assert back.dims == (("t", 4), ("y", 3), ("x", 5))
    got = {
        (r["t"], r["y"], r["x"]): r["value"]
        for r in back.df.collect()
    }
    assert len(got) == 60
    for (tt, yy, xx), v in got.items():
        assert v == (7 * tt + 13 * yy + 29 * xx + 3) % 251


def test_sparse_input_fills(spark, tmp_path):
    # missing cells become fill_value in the stream (gap writing)
    df = spark.createDataFrame(
        [(0, 0, 1, 7), (1, 1, 2, 9)], "t long, y long, x long, value int"
    )
    md = MDArray(df=df, dims=(("t", 2), ("y", 2), ("x", 3)),
                 value_col="value")
    p = str(tmp_path / "sparse.nc")
    write_netcdf(md, p, version=1, fill_value=255)
    blob = open(p, "rb").read()
    v = parse_header(blob)["vars"][0]
    arr = np.frombuffer(blob[v["begin"]:v["begin"] + 48],
                        dtype=">i4").reshape(2, 2, 3)
    assert arr[0, 0, 1] == 7 and arr[1, 1, 2] == 9
    assert arr[0, 0, 0] == 255 and arr[1, 0, 0] == 255


def test_double_type(spark, tmp_path):
    df = spark.createDataFrame(
        [(0, 0, 1.5), (0, 1, -2.25)], "y long, x long, value double"
    )
    md = MDArray(df=df, dims=(("y", 1), ("x", 2)), value_col="value")
    p = str(tmp_path / "d.nc")
    write_netcdf(md, p, nc_type=NC_DOUBLE, version=1)
    back = read_netcdf(spark, p)
    vals = sorted(r["value"] for r in back.df.collect())
    assert vals == [-2.25, 1.5]
    # _FillValue round-trips as the nodata attribute
    assert back.nodata == 0.0


def test_rejects_non_netcdf():
    with pytest.raises(ValueError):
        parse_header(b"HDF\x01" + b"\x00" * 64)


def test_name_padding_alignment(spark, tmp_path):
    # a 5-byte name forces 3 pad bytes; header must stay aligned
    df = spark.createDataFrame([(0, 1)], "pixel long, value int")
    md = MDArray(df=df, dims=(("pixel", 1),), value_col="value")
    p = str(tmp_path / "pad.nc")
    write_netcdf(md, p, var_name="bands", version=1)
    hdr = parse_header(open(p, "rb").read())
    assert hdr["dims"] == [("pixel", 1)]
    assert hdr["vars"][0]["name"] == "bands"
