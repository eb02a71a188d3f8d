"""GeoParquet metadata writer/reader (sources/geoparquet.py)."""

import json
import os

import numpy as np
import pytest

from gdal_spark.geo.wkb import wkb_point, wkb_polygon
from gdal_spark.sources.geoparquet import read_geoparquet, write_geoparquet


def _df(spark):
    sq = np.array(
        [(0.0, 0.0), (2.0, 0.0), (2.0, 3.0), (0.0, 3.0), (0.0, 0.0)]
    )
    return spark.createDataFrame(
        [
            (1, bytearray(wkb_point(10.0, -5.0))),
            (2, bytearray(wkb_polygon([sq]))),
        ],
        "fid long, geometry binary",
    )


def test_roundtrip_and_metadata(spark, tmp_path):
    out = str(tmp_path / "gpq")
    write_geoparquet(_df(spark), out)
    back, geo = read_geoparquet(spark, out)
    assert geo["version"] == "1.1.0"
    assert geo["primary_column"] == "geometry"
    col = geo["columns"]["geometry"]
    assert col["encoding"] == "WKB"
    assert "crs" not in col  # WGS84 omission default
    rows = {r["fid"]: bytes(r["geometry"]) for r in back.collect()}
    assert rows[1] == bytes(wkb_point(10.0, -5.0))  # byte-exact WKB


def test_bbox_and_geometry_types_cover_the_file(spark, tmp_path):
    out = str(tmp_path / "gpq")
    write_geoparquet(_df(spark).coalesce(1), out)
    _, geo = read_geoparquet(spark, out)
    col = geo["columns"]["geometry"]
    assert col["geometry_types"] == ["Point", "Polygon"]
    assert col["bbox"] == [0.0, -5.0, 10.0, 3.0]


def test_plain_parquet_rejected(spark, tmp_path):
    out = str(tmp_path / "plain")
    _df(spark).write.parquet(out)
    with pytest.raises(ValueError, match="geo"):
        read_geoparquet(spark, out)


def test_every_shard_carries_metadata(spark, tmp_path):
    import pyarrow.parquet as pq

    out = str(tmp_path / "gpq")
    write_geoparquet(_df(spark).repartition(2), out)
    shards = [f for f in os.listdir(out) if f.endswith(".parquet")]
    assert len(shards) >= 2
    for f in shards:
        md = pq.read_schema(os.path.join(out, f)).metadata
        assert b"geo" in md
        json.loads(md[b"geo"])  # valid JSON in every file
