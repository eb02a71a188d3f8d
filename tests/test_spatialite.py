"""SpatiaLite source/sink (sources/spatialite.py) — blob wire format
and the sqlite layer roundtrip (ogr/ogrsf_frmts/sqlite)."""

import struct

import numpy as np

from gdal_spark.geo import wkb as wkbmod
from gdal_spark.sources.spatialite import (
    read_spatialite,
    splite_blob_to_wkb,
    wkb_to_splite_blob,
    write_spatialite,
)


def _geoms():
    sq = np.array([(0.0, 0.0), (4.0, 0.0), (4.0, 4.0), (0.0, 4.0), (0.0, 0.0)])
    hole = np.array([(1.0, 1.0), (2.0, 1.0), (2.0, 2.0), (1.0, 2.0), (1.0, 1.0)])
    mls = wkbmod.Geometry(
        wkbmod.WKB_MULTILINESTRING,
        parts=[np.array([(0.0, 0.0), (1.0, 1.0)]),
               np.array([(5.0, 5.0), (6.0, 7.0)])],
    )
    return [
        wkbmod.wkb_point(1.0 / 3.0, -2.25),
        wkbmod.wkb_linestring(np.array([(0.0, 0.0), (1.0, 2.0), (3.0, 1.0)])),
        wkbmod.wkb_polygon([sq, hole]),
        wkbmod.geometry_to_wkb(mls),
        wkbmod.wkb_multipolygon([[sq], [sq + 10.0]]),
    ]


def test_blob_roundtrip_all_types():
    for wkb in _geoms():
        blob = wkb_to_splite_blob(wkb, srid=4326)
        assert blob[0] == 0x00 and blob[-1] == 0xFE
        assert blob[38] == 0x7C
        (srid,) = struct.unpack_from("<i", blob, 2)
        assert srid == 4326
        back = splite_blob_to_wkb(blob)
        assert back == wkb  # float64 exact, same WKB writer


def test_blob_mbr_matches_bounds():
    wkb = wkbmod.wkb_linestring(np.array([(-3.0, 2.0), (7.5, -1.25)]))
    blob = wkb_to_splite_blob(wkb)
    xmin, ymin, xmax, ymax = struct.unpack_from("<4d", blob, 6)
    assert (xmin, ymin, xmax, ymax) == (-3.0, -1.25, 7.5, 2.0)


def test_layer_roundtrip(spark, tmp_path):
    rows = [
        (1, "a", bytearray(_geoms()[0])),
        (2, None, bytearray(_geoms()[2])),
    ]
    df = spark.createDataFrame(rows, "fid long, name string, geometry binary")
    path = str(tmp_path / "z.sqlite")
    write_spatialite(df, path, layer="lyr")
    back = read_spatialite(spark, path, "lyr").toPandas()
    back = back.set_index("fid").sort_index()
    assert back.loc[1, "name"] == "a"
    assert back.loc[2, "name"] is None
    g = wkbmod.parse_wkb(bytes(back.loc[2, "geometry"]))
    assert len(g.parts) == 2  # hole preserved
    # metadata present like the reference expects
    import sqlite3

    con = sqlite3.connect(path)
    gt = con.execute(
        "SELECT geometry_type, srid FROM geometry_columns "
        "WHERE f_table_name='lyr'").fetchone()
    con.close()
    assert gt == (3, 4326)
