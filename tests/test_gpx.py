"""GPX source/sink (sources/gpx.py) — all five OGR layer views
(ogr/ogrsf_frmts/gpx/ogrgpxlayer.cpp) plus the pretty-printed funnel."""

import numpy as np

from gdal_spark.geo import wkb as wkbmod
from gdal_spark.sources.gpx import read_gpx, write_gpx


def _wpts(spark):
    rows = [
        (1, "a<b&c", 12.5, bytearray(wkbmod.wkb_point(1.0 / 3.0, -2.25))),
        (2, None, None, bytearray(wkbmod.wkb_point(-179.5, 84.0))),
    ]
    return spark.createDataFrame(
        rows, "fid long, name string, ele double, geometry binary"
    )


def _routes(spark):
    pts = np.array([(0.0, 0.0), (1.0, 2.0), (3.0, 1.0)])
    return spark.createDataFrame(
        [(7, "r0", bytearray(wkbmod.wkb_linestring(pts)))],
        "number long, name string, geometry binary",
    )


def _tracks(spark):
    g = wkbmod.Geometry(
        wkbmod.WKB_MULTILINESTRING,
        parts=[
            np.array([(0.0, 0.0), (1.0, 1.0)]),
            np.array([(5.0, 5.0), (6.0, 7.0), (8.0, 8.0)]),
        ],
    )
    return spark.createDataFrame(
        [(3, "t0", bytearray(wkbmod.geometry_to_wkb(g)))],
        "number long, name string, geometry binary",
    )


def test_waypoints_roundtrip(spark, tmp_path):
    path = str(tmp_path / "w.gpx")
    write_gpx(path, waypoints=_wpts(spark))
    back = read_gpx(
        spark, path, "waypoints", "fid long, name string, ele double"
    ).toPandas().set_index("fid").sort_index()
    assert back.loc[1, "name"] == "a<b&c"    # xml-escape + ogr: extension
    assert back.loc[1, "ele"] == 12.5        # native <ele> child
    assert back.loc[2, "name"] is None
    g = wkbmod.parse_wkb(bytes(back.loc[1, "geometry"]))
    assert tuple(g.parts[0][0]) == (1.0 / 3.0, -2.25)  # repr-exact attrs


def test_routes_and_route_points(spark, tmp_path):
    path = str(tmp_path / "r.gpx")
    write_gpx(path, routes=_routes(spark))
    back = read_gpx(
        spark, path, "routes", "number long, name string"
    ).collect()
    assert len(back) == 1 and back[0]["name"] == "r0"
    g = wkbmod.parse_wkb(bytes(back[0]["geometry"]))
    assert g.type_id == wkbmod.WKB_LINESTRING and len(g.parts[0]) == 3
    pts = read_gpx(
        spark, path, "route_points", "route_fid long, route_point_id int"
    ).toPandas().sort_values("route_point_id")
    assert list(pts["route_point_id"]) == [0, 1, 2]
    assert list(pts["route_fid"]) == [7, 7, 7]   # from <number>


def test_tracks_and_track_points(spark, tmp_path):
    path = str(tmp_path / "t.gpx")
    write_gpx(path, tracks=_tracks(spark))
    back = read_gpx(spark, path, "tracks", "number long, name string").collect()
    g = wkbmod.parse_wkb(bytes(back[0]["geometry"]))
    assert g.type_id == wkbmod.WKB_MULTILINESTRING
    assert [len(p) for p in g.parts] == [2, 3]   # trkseg split preserved
    pts = read_gpx(
        spark, path, "track_points",
        "track_fid long, track_seg_id int, track_seg_point_id int",
    ).toPandas().sort_values(["track_seg_id", "track_seg_point_id"])
    assert list(pts["track_seg_id"]) == [0, 0, 1, 1, 1]
    assert list(pts["track_seg_point_id"]) == [0, 1, 0, 1, 2]
    assert set(pts["track_fid"]) == {3}


def test_funnel_pretty_printed(spark, tmp_path):
    """Multi-line documents (foreign writers) fall back to the
    driver-parse funnel with document-order fids."""
    path = str(tmp_path / "p.gpx")
    doc = """<?xml version="1.0"?>
<gpx version="1.1" creator="x" xmlns="http://www.topografix.com/GPX/1/1">
  <wpt lat="10.5" lon="-3.25">
    <ele>100.0</ele>
    <name>first</name>
  </wpt>
  <trk>
    <name>walk</name>
    <trkseg>
      <trkpt lat="1.0" lon="2.0"/>
      <trkpt lat="1.5" lon="2.5"/>
    </trkseg>
  </trk>
</gpx>
"""
    with open(path, "w") as f:
        f.write(doc)
    w = read_gpx(
        spark, path, "waypoints", "name string, ele double"
    ).collect()
    assert len(w) == 1 and w[0]["name"] == "first" and w[0]["ele"] == 100.0
    pts = read_gpx(
        spark, path, "track_points",
        "track_fid long, track_seg_id int, track_seg_point_id int",
    ).toPandas()
    assert len(pts) == 2
    assert set(pts["track_fid"]) == {0}          # document order
