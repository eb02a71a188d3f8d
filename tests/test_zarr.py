"""Zarr v2 source/sink (sources/zarr.py)."""

import json
import os
import zlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from gdal_spark.operators.multidim import MDArray
from gdal_spark.sources.zarr import read_zarr, write_zarr


def _cube(spark, t=5, y=3, x=4):
    df = (
        spark.range(t * y * x)
        .select(
            (F.col("id") / (y * x)).cast("long").alias("t"),
            ((F.col("id") % (y * x)) / x).cast("long").alias("y"),
            (F.col("id") % x).alias("x"),
            ((F.col("id") * 7 + 3) % 100).cast("int").alias("value"),
        )
    )
    return MDArray(df=df, dims=(("t", t), ("y", y), ("x", x)))


def test_roundtrip_values_exact(spark, tmp_path):
    md = _cube(spark)
    out = str(tmp_path / "z")
    write_zarr(md, out, chunks=(2, 3, 4), fill_value=255)
    back = read_zarr(spark, out)
    assert back.shape == (5, 3, 4)
    assert [n for n, _ in back.dims] == ["t", "y", "x"]  # via .zattrs
    a = back.df.toPandas().sort_values(["t", "y", "x"])["value"].to_numpy()
    b = md.df.toPandas().sort_values(["t", "y", "x"])["value"].to_numpy()
    np.testing.assert_array_equal(a, b)


def test_metadata_and_chunk_layout(spark, tmp_path):
    md = _cube(spark)
    out = str(tmp_path / "z")
    write_zarr(md, out, chunks=(2, 3, 4), fill_value=255)
    meta = json.load(open(os.path.join(out, ".zarray")))
    assert meta["zarr_format"] == 2
    assert meta["shape"] == [5, 3, 4] and meta["chunks"] == [2, 3, 4]
    assert meta["compressor"]["id"] == "zlib"
    # ceil(5/2)=3 chunks along t, 1 along y and x
    names = sorted(
        f for f in os.listdir(out) if not f.startswith(".")
    )
    assert names == ["0.0.0", "1.0.0", "2.0.0"]
    # the edge chunk (t=4) is FULL SIZE, padded with fill_value
    raw = zlib.decompress(open(os.path.join(out, "2.0.0"), "rb").read())
    arr = np.frombuffer(raw, dtype="<i4").reshape(2, 3, 4)
    assert (arr[1] == 255).all()  # t=5 plane is pure padding
    assert (arr[0] != 255).all()


def test_edge_padding_not_emitted(spark, tmp_path):
    md = _cube(spark)
    out = str(tmp_path / "z")
    write_zarr(md, out, chunks=(2, 3, 4), fill_value=255)
    back = read_zarr(spark, out)
    assert back.df.count() == 5 * 3 * 4  # no padded rows leak


def test_unsupported_separator_rejected(spark, tmp_path):
    md = _cube(spark)
    out = str(tmp_path / "z")
    write_zarr(md, out, chunks=(2, 3, 4))
    meta = json.load(open(os.path.join(out, ".zarray")))
    meta["dimension_separator"] = "/"
    json.dump(meta, open(os.path.join(out, ".zarray"), "w"))
    with pytest.raises(ValueError, match="separated chunk names"):
        read_zarr(spark, out)
