"""MIF/MID source/sink (sources/mif.py) vs hand-built files
(ogr/ogrsf_frmts/mitab grammar)."""

import numpy as np
import pytest

from gdal_spark.geo import wkb as wkbmod
from gdal_spark.sources.mif import read_mif, write_mif


def _df(spark):
    sq = np.array([(0.0, 0.0), (4.0, 0.0), (4.0, 4.0), (0.0, 4.0), (0.0, 0.0)])
    hole = np.array([(1.0, 1.0), (2.0, 1.0), (2.0, 2.0), (1.0, 2.0), (1.0, 1.0)])
    mls = wkbmod.Geometry(
        wkbmod.WKB_MULTILINESTRING,
        parts=[np.array([(0.0, 0.0), (1.0, 1.0)]),
               np.array([(5.0, 5.0), (6.0, 7.0), (8.0, 8.0)])],
    )
    rows = [
        (1, 'say "hi", ok', bytearray(wkbmod.wkb_point(1.0 / 3.0, -2.25))),
        (2, None, bytearray(wkbmod.wkb_linestring(
            np.array([(0.0, 0.0), (1.0, 2.0), (3.0, 1.0)])))),
        (3, "poly", bytearray(wkbmod.wkb_polygon([sq, hole]))),
        (4, "multi", bytearray(wkbmod.geometry_to_wkb(mls))),
    ]
    return spark.createDataFrame(rows, "fid long, name string, geometry binary")


def test_roundtrip_geometries_and_quoting(spark, tmp_path):
    path = str(tmp_path / "t.mif")
    write_mif(_df(spark), path)
    back = read_mif(spark, path, "fid long, name string").toPandas()
    back = back.set_index("fid").sort_index()
    assert back.loc[1, "name"] == 'say "hi", ok'   # quote + delim escape
    assert back.loc[2, "name"] is None
    g1 = wkbmod.parse_wkb(bytes(back.loc[1, "geometry"]))
    assert tuple(g1.parts[0][0]) == (1.0 / 3.0, -2.25)   # repr-exact
    g2 = wkbmod.parse_wkb(bytes(back.loc[2, "geometry"]))
    assert g2.type_id == wkbmod.WKB_LINESTRING and len(g2.parts[0]) == 3
    g3 = wkbmod.parse_wkb(bytes(back.loc[3, "geometry"]))
    assert len(g3.parts) == 2 and len(g3.parts[1]) == 5   # hole kept
    g4 = wkbmod.parse_wkb(bytes(back.loc[4, "geometry"]))
    assert g4.type_id == wkbmod.WKB_MULTILINESTRING
    assert [len(p) for p in g4.parts] == [2, 3]


def test_foreign_file_with_style_clauses(spark, tmp_path):
    """MapInfo writers attach Pen/Brush/Symbol style clauses — the
    reader must skip them (mitab_feature_mif.cpp style tokens)."""
    mif = """Version 300
Charset "Neutral"
Delimiter ","
Columns 2
  fid Integer
  name Char(32)
Data

Point 1 2
    Symbol (34,0,12)
Region 1
  4
0 0
2 0
2 2
0 0
    Pen (1,2,0)
    Brush (2,16777215,16777215)
"""
    (tmp_path / "s.mif").write_text(mif)
    (tmp_path / "s.mid").write_text('1,"a"\n2,"b"\n')
    back = read_mif(
        spark, str(tmp_path / "s.mif"), "fid long, name string"
    ).toPandas().set_index("fid").sort_index()
    assert list(back.index) == [1, 2]
    assert back.loc[2, "name"] == "b"
    g = wkbmod.parse_wkb(bytes(back.loc[2, "geometry"]))
    assert g.type_id == wkbmod.WKB_POLYGON


def test_multishell_region_refused(spark, tmp_path):
    sq = np.array([(0.0, 0.0), (1.0, 0.0), (1.0, 1.0), (0.0, 0.0)])
    df = spark.createDataFrame(
        [(1, bytearray(wkbmod.wkb_multipolygon([[sq], [sq + 10]])))],
        "fid long, geometry binary",
    )
    with pytest.raises(Exception, match="[Mm]ulti-shell|dissolve"):
        write_mif(df, str(tmp_path / "m.mif"))
