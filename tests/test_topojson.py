"""TopoJSON source/sink (sources/topojson.py) — quantized decode,
shared arcs, negative-index reversal (ogrtopojsonreader.cpp)."""

import json

import numpy as np

from gdal_spark.geo import wkb as wkbmod
from gdal_spark.sources.topojson import read_topojson, write_topojson


def test_roundtrip_nonquantized(spark, tmp_path):
    sq = np.array([(0.0, 0.0), (4.0, 0.0), (4.0, 4.0), (0.0, 4.0), (0.0, 0.0)])
    hole = np.array([(1.0, 1.0), (2.0, 1.0), (2.0, 2.0), (1.0, 2.0), (1.0, 1.0)])
    rows = [
        (1, "pt", bytearray(wkbmod.wkb_point(1.0 / 3.0, -2.25))),
        (2, "ln", bytearray(wkbmod.wkb_linestring(
            np.array([(0.0, 0.0), (1.0, 2.0), (3.0, 1.0)])))),
        (3, "pg", bytearray(wkbmod.wkb_polygon([sq, hole]))),
        (4, "mp", bytearray(wkbmod.wkb_multipolygon(
            [[sq], [sq + 10.0]]))),
    ]
    df = spark.createDataFrame(rows, "fid long, name string, geometry binary")
    path = str(tmp_path / "t.topojson")
    write_topojson(df, path, layer="lyr", id_col="fid")
    back = read_topojson(
        spark, path, "lyr", "fid long, name string", id_col="fid"
    ).toPandas().set_index("fid").sort_index()
    g1 = wkbmod.parse_wkb(bytes(back.loc[1, "geometry"]))
    assert tuple(g1.parts[0][0]) == (1.0 / 3.0, -2.25)   # repr-exact
    g3 = wkbmod.parse_wkb(bytes(back.loc[3, "geometry"]))
    assert len(g3.parts) == 2 and len(g3.parts[1]) == 5
    g4 = wkbmod.parse_wkb(bytes(back.loc[4, "geometry"]))
    assert len(g4.all_rings()) == 2
    assert back.loc[2, "name"] == "ln"


def test_quantized_shared_arcs(spark, tmp_path):
    """Two squares sharing one edge: the shared arc appears once in
    the table, referenced forward by one polygon and reversed (~k) by
    the other — decoded through a delta + transform encoding."""
    # quantum grid: scale 0.5, translate (10, 20); arcs in integer deltas
    doc = {
        "type": "Topology",
        "transform": {"scale": [0.5, 0.5], "translate": [10.0, 20.0]},
        "arcs": [
            # arc 0: shared edge (2,0) -> (2,2) in quantum units
            [[2, 0], [0, 2]],
            # arc 1: left square remainder (2,2) -> (0,2) -> (0,0) -> (2,0)
            [[2, 2], [-2, 0], [0, -2], [2, 0]],
            # arc 2: right square remainder (2,0) -> (4,0) -> (4,2) -> (2,2)
            [[2, 0], [2, 0], [0, 2], [-2, 0]],
        ],
        "objects": {
            "lyr": {
                "type": "GeometryCollection",
                "geometries": [
                    {"type": "Polygon", "arcs": [[0, 1]], "id": 1,
                     "properties": {"name": "left"}},
                    {"type": "Polygon", "arcs": [[2, -1]], "id": 2,
                     "properties": {"name": "right"}},
                ],
            }
        },
    }
    path = str(tmp_path / "q.topojson")
    with open(path, "w") as f:
        json.dump(doc, f)
    back = read_topojson(
        spark, path, "lyr", "fid long, name string", id_col="fid"
    ).toPandas().set_index("fid").sort_index()
    gl = wkbmod.parse_wkb(bytes(back.loc[1, "geometry"]))
    gr = wkbmod.parse_wkb(bytes(back.loc[2, "geometry"]))
    assert gl.type_id == wkbmod.WKB_POLYGON
    left = gl.parts[0]
    right = gr.parts[0]
    assert len(left) == 5 and len(right) == 5
    from gdal_spark.geo.geom import ring_area

    assert abs(abs(ring_area(left)) - 1.0) < 1e-12    # 2x2 quanta * 0.25
    assert abs(abs(ring_area(right)) - 1.0) < 1e-12
    # shared edge endpoints present in both rings, reversed in one
    assert {tuple(p) for p in left} & {tuple(p) for p in right} >= {
        (11.0, 20.0), (11.0, 21.0)}
