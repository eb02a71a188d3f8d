"""GPKG raster-tile pyramid (gdalgeopackagerasterband.cpp model)."""

import os
import sqlite3
import tempfile

import numpy as np
from pyspark.sql import functions as F

from gdal_spark.sources.gpkg import (
    read_gpkg_tile_matrix,
    read_gpkg_tiles,
    write_gpkg_tiles,
)
from gdal_spark.tiles import tilemath as tm


def _tiles_df(spark):
    from gdal_spark.raster.png import encode_png

    rows = []
    for z, x, y in [(3, 1, 2), (3, 5, 5), (4, 9, 3)]:
        arr = np.full((8, 8, 3), (z * 37 + x + y) % 256, np.uint8)
        rows.append((z, x, y, bytearray(encode_png(arr))))
    return spark.createDataFrame(
        rows, "tile_z int, tile_x int, tile_y int, payload binary"
    )


def test_roundtrip_topdown_rows_and_matrix(spark):
    path = os.path.join(tempfile.mkdtemp(), "t.gpkg")
    write_gpkg_tiles(_tiles_df(spark), path, table="render",
                     tile_size=8)
    back = {
        (r["tile_z"], r["tile_x"], r["tile_y"])
        for r in read_gpkg_tiles(spark, path, table="render").collect()
    }
    assert back == {(3, 1, 2), (3, 5, 5), (4, 9, 3)}
    # GPKG rows are TOP-DOWN: stored tile_row equals the XYZ y
    con = sqlite3.connect(path)
    raw = set(con.execute(
        "SELECT zoom_level, tile_column, tile_row FROM render"
    ).fetchall())
    assert raw == {(3, 1, 2), (3, 5, 5), (4, 9, 3)}
    # spec tables: app id, matrix set extent, per-zoom matrices
    (app_id,) = con.execute("PRAGMA application_id").fetchone()
    assert app_id == 1196444487  # 'GPKG'
    dt = con.execute(
        "SELECT data_type FROM gpkg_contents WHERE table_name='render'"
    ).fetchone()[0]
    assert dt == "tiles"
    con.close()
    ms, rows = read_gpkg_tile_matrix(path, "render")
    assert ms == (-tm.ORIGIN, -tm.ORIGIN, tm.ORIGIN, tm.ORIGIN)
    assert [(z, mw) for z, mw, *_ in rows] == [(3, 8), (4, 16)]
    for z, _mw, _mh, tw, th, pxs, pys in rows:
        assert (tw, th) == (8, 8)
        assert pxs == pys == tm.resolution(z, 8)


def test_payload_fidelity(spark):
    from gdal_spark.raster.png import decode_png

    path = os.path.join(tempfile.mkdtemp(), "t2.gpkg")
    write_gpkg_tiles(_tiles_df(spark), path)
    rows = read_gpkg_tiles(spark, path).collect()
    for r in rows:
        arr = decode_png(bytes(r["payload"]))
        want = (r["tile_z"] * 37 + r["tile_x"] + r["tile_y"]) % 256
        assert (arr == want).all()
