"""OSM PBF (sources/osmpbf.py): hand-rolled protobuf wire format,
blob framing, dense-node/way/relation delta coding."""

import numpy as np

from gdal_spark.sources.osmpbf import (
    read_pbf_nodes,
    read_pbf_relations,
    read_pbf_ways,
    write_osm_pbf,
)

NODES = [
    (1, 5.0000001, 50.0),
    (2, 5.25, 50.125),
    (5, -120.5, -33.25),           # id gap exercises deltas
    (1000000007, 179.9999999, -89.9999999),
]
WAYS = [
    (10, [1, 2, 5], {"highway": "primary", "name": "A1"}),
    (11, [5, 1], {}),
]
RELS = [
    (20, [("way", 10, "outer"), ("way", 11, "inner"), ("node", 2, "")],
     {"type": "multipolygon", "fid": "7"}),
]


def test_pbf_roundtrip(spark, tmp_path):
    path = str(tmp_path / "t.pbf")
    write_osm_pbf(path, NODES, WAYS, RELS)
    nodes = read_pbf_nodes(spark, path).toPandas().set_index("node_id")
    assert len(nodes) == 4
    # 1e-7-grid coordinates roundtrip exactly through fixed point
    assert abs(nodes.loc[1, "lon"] - 5.0000001) < 1e-12
    assert abs(nodes.loc[5, "lat"] - -33.25) < 1e-12
    assert abs(nodes.loc[1000000007, "lon"] - 179.9999999) < 1e-12
    ways = read_pbf_ways(spark, path).toPandas().set_index("way_id")
    assert list(ways.loc[10, "refs"]) == [1, 2, 5]
    assert dict(ways.loc[10, "tags"]) == {"highway": "primary",
                                          "name": "A1"}
    assert dict(ways.loc[11, "tags"]) == {}
    rels = read_pbf_relations(spark, path).toPandas().set_index("rel_id")
    r = rels.loc[20]
    assert list(r["member_types"]) == [1, 1, 0]
    assert list(r["member_refs"]) == [10, 11, 2]
    assert list(r["member_roles"]) == ["outer", "inner", ""]
    assert dict(r["tags"])["type"] == "multipolygon"


def test_pbf_assembly_via_xml_join(spark, tmp_path):
    """PBF elements feed the same distributed join assembly as the
    XML model — way 10's geometry resolves through node refs."""
    from pyspark.sql import functions as F

    path = str(tmp_path / "a.pbf")
    write_osm_pbf(path, NODES, WAYS, RELS)
    nodes = read_pbf_nodes(spark, path)
    ways = read_pbf_ways(spark, path)
    exploded = ways.select(
        "way_id", F.posexplode("refs").alias("pos", "node_id")
    )
    located = exploded.join(nodes, "node_id").orderBy("way_id", "pos")
    got = located.where(F.col("way_id") == 10).toPandas()
    assert list(got["node_id"]) == [1, 2, 5]
    assert abs(got["lon"].iloc[2] - -120.5) < 1e-12


def test_pbf_quantization_is_1e7_grid(spark, tmp_path):
    # off-grid input quantizes to the fixed-point grid, like the
    # reference
    path = str(tmp_path / "q.pbf")
    write_osm_pbf(path, [(1, 1.00000005 + 1e-9, 0.0)])
    lon = read_pbf_nodes(spark, path).collect()[0]["lon"]
    assert abs(lon - 1.0000000) < 2e-7
    assert abs(round(lon * 1e7) - lon * 1e7) < 1e-3
