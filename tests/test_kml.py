"""KML source/sink (sources/kml.py) vs hand-built documents."""

import numpy as np

from gdal_spark.geo import wkb as wkbmod
from gdal_spark.sources.kml import read_kml, write_kml


def _df(spark):
    sq = [(0.0, 0.0), (4.0, 0.0), (4.0, 4.0), (0.0, 4.0), (0.0, 0.0)]
    hole = [(1.0, 1.0), (2.0, 1.0), (2.0, 2.0), (1.0, 2.0), (1.0, 1.0)]
    rows = [
        (1, "a<b&c", bytearray(wkbmod.wkb_point(1.5, -2.25))),
        (2, None, bytearray(wkbmod.wkb_linestring([(0.0, 0.0), (1.0, 2.0)]))),
        (3, "poly", bytearray(wkbmod.wkb_polygon([np.array(sq), np.array(hole)]))),
        (4, "multi", bytearray(wkbmod.wkb_multipolygon(
            [[np.array(sq)], [np.array([(p[0] + 10, p[1]) for p in sq])]]
        ))),
    ]
    return spark.createDataFrame(rows, "fid long, name string, geometry binary")


def test_roundtrip_all_geometry_types(spark, tmp_path):
    path = str(tmp_path / "t.kml")
    write_kml(_df(spark), path)
    back = read_kml(spark, path, "fid long, name string").toPandas()
    back = back.set_index("fid").sort_index()
    assert back.loc[1, "name"] == "a<b&c"       # xml-escaped roundtrip
    assert back.loc[2, "name"] is None          # null attr omitted
    g1 = wkbmod.parse_wkb(bytes(back.loc[1, "geometry"]))
    assert g1.type_id == wkbmod.WKB_POINT
    assert tuple(g1.parts[0][0]) == (1.5, -2.25)
    g3 = wkbmod.parse_wkb(bytes(back.loc[3, "geometry"]))
    rings = g3.all_rings()[0]
    assert len(rings) == 2 and len(rings[1]) == 5   # hole preserved
    g4 = wkbmod.parse_wkb(bytes(back.loc[4, "geometry"]))
    assert len(g4.all_rings()) == 2                  # MultiGeometry


def test_repr_exact_coordinates(spark, tmp_path):
    x = 1.0 / 3.0
    y = 2.0 / 7.0
    df = spark.createDataFrame(
        [(1, bytearray(wkbmod.wkb_point(x, y)))], "fid long, geometry binary"
    )
    path = str(tmp_path / "p.kml")
    write_kml(df, path)
    g = wkbmod.parse_wkb(bytes(
        read_kml(spark, path, "fid long").collect()[0]["geometry"]
    ))
    assert tuple(g.parts[0][0]) == (x, y)  # bit-exact, not %.15g


def test_namespaced_pretty_printed_funnel(spark, tmp_path):
    doc = """<?xml version="1.0"?>
<kml xmlns="http://www.opengis.net/kml/2.2">
  <Document>
    <Placemark>
      <ExtendedData>
        <Data name="fid"><value>7</value></Data>
      </ExtendedData>
      <Point>
        <coordinates>10.5,20.25</coordinates>
      </Point>
    </Placemark>
  </Document>
</kml>
"""
    path = str(tmp_path / "pretty.kml")
    open(path, "w").write(doc)
    rows = read_kml(spark, path, "fid long").collect()
    assert len(rows) == 1 and rows[0]["fid"] == 7
    g = wkbmod.parse_wkb(bytes(rows[0]["geometry"]))
    assert tuple(g.parts[0][0]) == (10.5, 20.25)
