"""MBTiles source/sink: on-disk layout (TMS flip, metadata table,
unique tile index), payload roundtrip, distributed read."""

import os
import sqlite3
import tempfile

import pytest
from pyspark.sql import functions as F

from gdal_spark.sources.mbtiles import (
    read_mbtiles,
    read_mbtiles_metadata,
    write_mbtiles,
)


@pytest.fixture
def tiles_df(spark):
    rows = [
        (5, 3, 4, b"payload-a"),
        (5, 3, 5, b"payload-b"),
        (6, 10, 20, b"payload-c"),
    ]
    return spark.createDataFrame(
        rows, "tile_z int, tile_x int, tile_y int, payload binary"
    )


def _path(name):
    d = os.path.join(tempfile.gettempdir(), f"gdal_spark_{os.getuid()}")
    os.makedirs(d, mode=0o700, exist_ok=True)
    return os.path.join(d, f"{name}_p{os.getpid()}.mbtiles")


def test_write_layout_tms_flip_and_metadata(tiles_df):
    p = _path("layout")
    write_mbtiles(tiles_df, p, name="t", fmt="png")
    con = sqlite3.connect(p)
    rows = sorted(
        con.execute(
            "SELECT zoom_level, tile_column, tile_row FROM tiles"
        ).fetchall()
    )
    con.close()
    # XYZ y -> TMS row = 2^z - 1 - y
    assert rows == [(5, 3, 26), (5, 3, 27), (6, 10, 43)]
    meta = read_mbtiles_metadata(p)
    assert meta["format"] == "png"
    assert meta["minzoom"] == "5" and meta["maxzoom"] == "6"
    assert "bounds" in meta and len(meta["bounds"].split(",")) == 4


def test_unique_tile_index_enforced(tiles_df, spark):
    p = _path("uniq")
    write_mbtiles(tiles_df, p)
    con = sqlite3.connect(p)
    with pytest.raises(sqlite3.IntegrityError):
        con.execute("INSERT INTO tiles VALUES (5, 3, 26, x'00')")
    con.close()


def test_roundtrip_payloads(tiles_df, spark):
    p = _path("rt")
    write_mbtiles(tiles_df, p)
    back = read_mbtiles(spark, p).orderBy("tile_z", "tile_x", "tile_y")
    got = [
        (r.tile_z, r.tile_x, r.tile_y, bytes(r.payload))
        for r in back.collect()
    ]
    assert got == [
        (5, 3, 4, b"payload-a"),
        (5, 3, 5, b"payload-b"),
        (6, 10, 20, b"payload-c"),
    ]


def test_empty_archive(spark):
    p = _path("empty")
    df = spark.createDataFrame(
        [], "tile_z int, tile_x int, tile_y int, payload binary"
    )
    write_mbtiles(df, p)
    meta = read_mbtiles_metadata(p)
    assert "minzoom" not in meta  # no tiles -> no zoom metadata
    assert read_mbtiles(spark, p).count() == 0


def test_rejects_unknown_format(tiles_df):
    with pytest.raises(ValueError):
        write_mbtiles(tiles_df, _path("bad"), fmt="tiff")


def test_distributed_read_partitions(spark):
    rows = [(7, x, x % 5, bytes([x % 251])) for x in range(123)]
    df = spark.createDataFrame(
        rows, "tile_z int, tile_x int, tile_y int, payload binary"
    )
    p = _path("dist")
    write_mbtiles(df, p)
    back = read_mbtiles(spark, p, n_partitions=7)
    assert back.rdd.getNumPartitions() >= 1
    assert back.count() == 123
    assert back.agg(F.sum("tile_x")).collect()[0][0] == sum(range(123))
