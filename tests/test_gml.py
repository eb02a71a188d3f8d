"""GML source/sink (sources/gml.py)."""

import numpy as np

from gdal_spark.geo import wkb as wkbmod
from gdal_spark.sources.gml import read_gml, write_gml


def test_roundtrip_geometries_and_attrs(spark, tmp_path):
    sq = np.array(
        [(0.0, 0.0), (4.0, 0.0), (4.0, 4.0), (0.0, 4.0), (0.0, 0.0)]
    )
    hole = np.array(
        [(1.0, 1.0), (2.0, 1.0), (2.0, 2.0), (1.0, 2.0), (1.0, 1.0)]
    )
    x = 1.0 / 3.0
    rows = [
        (1, 7, "a&b", bytearray(wkbmod.wkb_point(x, -2.25))),
        (2, 8, None, bytearray(
            wkbmod.wkb_linestring([(0.0, 0.0), (1.0, 2.0)])
        )),
        (3, 9, "poly", bytearray(wkbmod.wkb_polygon([sq, hole]))),
        (4, 10, "multi", bytearray(wkbmod.wkb_multipolygon(
            [[sq], [sq + 10.0]]
        ))),
    ]
    df = spark.createDataFrame(
        rows, "fid long, eas_id long, kind string, geometry binary"
    )
    path = str(tmp_path / "t.gml")
    write_gml(df, path, layer="zones")
    back = read_gml(spark, path, "eas_id long, kind string").toPandas()
    back = back.set_index("fid").sort_index()
    assert back.loc[1, "eas_id"] == 7 and back.loc[1, "kind"] == "a&b"
    assert back.loc[2, "kind"] is None
    g1 = wkbmod.parse_wkb(bytes(back.loc[1, "geometry"]))
    assert tuple(g1.parts[0][0]) == (x, -2.25)  # repr-exact
    g3 = wkbmod.parse_wkb(bytes(back.loc[3, "geometry"]))
    assert len(g3.all_rings()[0]) == 2
    g4 = wkbmod.parse_wkb(bytes(back.loc[4, "geometry"]))
    assert len(g4.all_rings()) == 2  # MultiPolygon members


def test_pretty_printed_funnel(spark, tmp_path):
    doc = """<?xml version="1.0"?>
<ogr:FeatureCollection xmlns:ogr="http://ogr.maptools.org/"
    xmlns:gml="http://www.opengis.net/gml">
  <gml:featureMember>
    <ogr:zones fid="5">
      <ogr:geometryProperty>
        <gml:Point><gml:coordinates>3.5,4.25</gml:coordinates></gml:Point>
      </ogr:geometryProperty>
      <ogr:kind>park</ogr:kind>
    </ogr:zones>
  </gml:featureMember>
</ogr:FeatureCollection>
"""
    path = str(tmp_path / "pretty.gml")
    open(path, "w").write(doc)
    rows = read_gml(spark, path, "kind string").collect()
    assert len(rows) == 1
    assert rows[0]["fid"] == 5 and rows[0]["kind"] == "park"
    g = wkbmod.parse_wkb(bytes(rows[0]["geometry"]))
    assert tuple(g.parts[0][0]) == (3.5, 4.25)
