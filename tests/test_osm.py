"""OSM XML source/sink (sources/osmxml.py) — node-ref join assembly
(ogr/ogrsf_frmts/osm model)."""

import numpy as np

from gdal_spark.geo import wkb as wkbmod
from gdal_spark.sources.osmxml import (
    read_osm_multipolygons,
    read_osm_nodes,
    read_osm_ways,
    write_osm,
)


def test_relation_roundtrip_with_hole(spark, tmp_path):
    sq = np.array([(0.0, 0.0), (4.0, 0.0), (4.0, 4.0), (0.0, 4.0), (0.0, 0.0)])
    hole = np.array([(1.0, 1.0), (2.0, 1.0), (2.0, 2.0), (1.0, 2.0), (1.0, 1.0)])
    df = spark.createDataFrame(
        [
            (7, "park", bytearray(wkbmod.wkb_polygon([sq, hole]))),
            (9, 'a<b&"c', bytearray(wkbmod.wkb_polygon([sq + 10.0]))),
        ],
        "fid long, kind string, geometry binary",
    )
    path = str(tmp_path / "z.osm")
    write_osm(df, path, id_col="fid")
    back = read_osm_multipolygons(
        spark, path, "fid long, kind string"
    ).toPandas().set_index("fid").sort_index()
    g7 = wkbmod.parse_wkb(bytes(back.loc[7, "geometry"]))
    assert len(g7.parts) == 2 and len(g7.parts[1]) == 5   # hole kept
    assert tuple(g7.parts[0][0]) == (0.0, 0.0)            # repr-exact
    assert back.loc[9, "kind"] == 'a<b&"c'                # xml escape
    g9 = wkbmod.parse_wkb(bytes(back.loc[9, "geometry"]))
    assert len(g9.parts) == 1


def test_ways_layer_foreign_doc(spark, tmp_path):
    """Hand-built doc: a shared node between two ways resolves
    through the distributed join, open ways stay LineStrings."""
    doc = "\n".join([
        '<?xml version="1.0"?>',
        '<osm version="0.6">',
        '<node id="1" lat="0.0" lon="0.0"/>',
        '<node id="2" lat="0.0" lon="5.0"/>',
        '<node id="3" lat="3.0" lon="5.0"/>',
        '<way id="10"><nd ref="1"/><nd ref="2"/></way>',
        '<way id="11"><nd ref="2"/><nd ref="3"/><nd ref="1"/></way>',
        "</osm>",
    ]) + "\n"
    path = str(tmp_path / "w.osm")
    with open(path, "w") as f:
        f.write(doc)
    nodes = read_osm_nodes(spark, path).toPandas()
    assert len(nodes) == 3
    ways = read_osm_ways(spark, path).toPandas().set_index("way_id")
    g10 = wkbmod.parse_wkb(bytes(ways.loc[10, "geometry"]))
    assert [tuple(p) for p in g10.parts[0]] == [(0.0, 0.0), (5.0, 0.0)]
    g11 = wkbmod.parse_wkb(bytes(ways.loc[11, "geometry"]))
    assert len(g11.parts[0]) == 3
    assert tuple(g11.parts[0][0]) == (5.0, 0.0)   # ref order preserved
