"""OSM XML vector source/sink — the reference's OSM driver model
(ogr/ogrsf_frmts/osm/: nodes / ways referencing node ids / relations
assembling multipolygons from outer+inner way members).

The reference resolves way node-refs through an in-process node
cache (osm2osm custom pages); at 10^9-node scale that cache IS the
bottleneck.  The engine's assembly is Spark-native instead: explode
way refs with their ordinal, EQUI-JOIN against the node table (one
shuffle on node id), regroup by way and sort by ordinal — the
geometry assembly scales like any other join.  Relations then join
the assembled rings (outer first, inners after) into polygons, the
reference's multipolygons layer for type=multipolygon relations.

- write: streamed single-file sink, ONE element per line
  (node / way / relation), repr-exact lat/lon attributes, tags as
  <tag k v/> children.
- read: distributed line scan (our writer's layout); a whole-document
  funnel is deliberately absent — planet-scale OSM files are consumed
  through per-line scans, never DOM parses.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from gdal_spark.geo import wkb as wkbmod
from gdal_spark.geo.wkb import parse_wkb

__all__ = ["write_osm", "read_osm_nodes", "read_osm_ways",
           "read_osm_multipolygons"]

_XML_ESC = {"&": "&amp;", "<": "&lt;", ">": "&gt;", '"': "&quot;"}


def _esc(s) -> str:
    return "".join(_XML_ESC.get(ch, ch) for ch in str(s))


def write_osm(df: DataFrame, path: str, geom_col: str = "geometry",
              id_col: str = "fid") -> None:
    """Write polygon features as multipolygon RELATIONS (outer +
    inner way members, tags on the relation) over ways over nodes —
    the reference's reading of the OSM area model.  Node/way ids are
    assigned sequentially in stream order.

    Memory note: nodes stream straight to disk, but the way/relation
    ELEMENT STRINGS buffer until the node pass ends (OSM element
    order is nodes < ways < relations and re-iterating the DataFrame
    would not replay in the same order) — driver memory is O(features
    x ~100 bytes), far below the node payload it streams."""
    attrs = [f.name for f in df.schema.fields
             if f.name not in (geom_col, id_col)]
    tmp = path + ".tmp"
    next_node = 1
    next_way = 1
    with open(tmp, "w") as f:
        f.write('<?xml version="1.0" encoding="UTF-8"?>\n')
        f.write('<osm version="0.6" generator="gdal_spark">\n')
        buffered_ways: list[str] = []
        buffered_rels: list[str] = []
        for row in df.toLocalIterator():
            g = parse_wkb(bytes(row[geom_col]))
            if g.type_id != wkbmod.WKB_POLYGON:
                raise ValueError("osm: polygon features only (the "
                                 "multipolygon relation model)")
            way_ids = []
            for ring in g.parts:
                pts = ring[:-1]  # closing vertex implied by ref reuse
                ids = list(range(next_node, next_node + len(pts)))
                next_node += len(pts)
                for nid, (x, y) in zip(ids, pts):
                    f.write(
                        f'<node id="{nid}" lat="{repr(float(y))}" '
                        f'lon="{repr(float(x))}"/>\n'
                    )
                refs = "".join(f'<nd ref="{i}"/>' for i in ids + [ids[0]])
                buffered_ways.append(
                    f'<way id="{next_way}">{refs}</way>'
                )
                way_ids.append(next_way)
                next_way += 1
            members = "".join(
                f'<member type="way" ref="{wid}" '
                f'role="{"outer" if k == 0 else "inner"}"/>'
                for k, wid in enumerate(way_ids)
            )
            tags = ['<tag k="type" v="multipolygon"/>',
                    f'<tag k="{id_col}" v="{_esc(row[id_col])}"/>']
            for a in attrs:
                if row[a] is not None:
                    tags.append(f'<tag k="{_esc(a)}" v="{_esc(row[a])}"/>')
            buffered_rels.append(
                f'<relation id="{row[id_col]}">{members}{"".join(tags)}'
                "</relation>"
            )
        for w in buffered_ways:
            f.write(w + "\n")
        for r in buffered_rels:
            f.write(r + "\n")
        f.write("</osm>\n")
    import os

    os.replace(tmp, path)


def _line_scan(spark: SparkSession, path: str, prefix: str, schema,
               parse_fn) -> DataFrame:
    def decode(batches):
        import xml.etree.ElementTree as ET

        for pdf in batches:
            out = []
            for line in pdf["value"]:
                s = line.strip()
                if not s.startswith(prefix):
                    continue
                out.append(parse_fn(ET.fromstring(s)))
            yield pd.DataFrame(out, columns=[f.name for f in schema.fields])

    return spark.read.text(path).mapInPandas(decode, schema)


def read_osm_nodes(spark: SparkSession, path: str) -> DataFrame:
    schema = T.StructType([
        T.StructField("node_id", T.LongType()),
        T.StructField("lon", T.DoubleType()),
        T.StructField("lat", T.DoubleType()),
    ])
    return _line_scan(
        spark, path, "<node ", schema,
        lambda e: {"node_id": int(e.get("id")),
                   "lon": float(e.get("lon")),
                   "lat": float(e.get("lat"))},
    )


def read_osm_ways(spark: SparkSession, path: str) -> DataFrame:
    """Ways with node refs ASSEMBLED into LineString WKB via the
    distributed node equi-join (one shuffle on node id)."""
    schema = T.StructType([
        T.StructField("way_id", T.LongType()),
        T.StructField("refs", T.ArrayType(T.LongType())),
    ])
    ways = _line_scan(
        spark, path, "<way ", schema,
        lambda e: {"way_id": int(e.get("id")),
                   "refs": [int(nd.get("ref")) for nd in e
                            if nd.tag == "nd"]},
    )
    nodes = read_osm_nodes(spark, path)
    exploded = ways.select(
        "way_id", F.posexplode("refs").alias("pos", "node_id")
    )
    located = exploded.join(nodes, "node_id")  # THE node-cache dual

    out_schema = T.StructType([
        T.StructField("way_id", T.LongType()),
        T.StructField("geometry", T.BinaryType()),
    ])

    def assemble(key, pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        pdf = pdf.sort_values("pos")
        pts = np.column_stack([pdf["lon"].to_numpy(),
                               pdf["lat"].to_numpy()])
        return pd.DataFrame(
            [{"way_id": int(key[0]),
              "geometry": wkbmod.wkb_linestring(pts)}]
        )

    return located.groupBy("way_id").applyInPandas(assemble, out_schema)


def read_osm_multipolygons(spark: SparkSession, path: str,
                           tag_schema: str) -> DataFrame:
    """type=multipolygon relations -> polygons with holes: assembled
    ways join the relation member lists (outer ring first, inners
    after), tags land as typed columns per `tag_schema`."""
    attrs = T._parse_datatype_string(tag_schema)
    names = [f.name for f in attrs.fields]
    rel_schema = T.StructType([
        T.StructField("rel_id", T.LongType()),
        T.StructField("outer_refs", T.ArrayType(T.LongType())),
        T.StructField("inner_refs", T.ArrayType(T.LongType())),
        T.StructField("tags", T.MapType(T.StringType(), T.StringType())),
    ])

    def parse_rel(e):
        outer, inner = [], []
        tags = {}
        for ch in e:
            if ch.tag == "member" and ch.get("type") == "way":
                (outer if ch.get("role") == "outer" else inner).append(
                    int(ch.get("ref")))
            elif ch.tag == "tag":
                tags[ch.get("k")] = ch.get("v")
        return {"rel_id": int(e.get("id")), "outer_refs": outer,
                "inner_refs": inner, "tags": tags}

    rels = _line_scan(spark, path, "<relation ", rel_schema, parse_rel)
    rels = rels.where(
        F.col("tags").getItem("type") == "multipolygon"
    )
    ways = read_osm_ways(spark, path)
    members = rels.select(
        "rel_id", "tags",
        F.explode(
            F.concat(
                F.transform("outer_refs",
                            lambda r: F.struct(r.alias("way_id"),
                                               F.lit(0).alias("role"))),
                F.transform("inner_refs",
                            lambda r: F.struct(r.alias("way_id"),
                                               F.lit(1).alias("role"))),
            )
        ).alias("m"),
    ).select("rel_id", "tags", "m.way_id", "m.role")
    joined = members.join(ways, "way_id")

    out_schema = T.StructType(
        list(attrs.fields) + [T.StructField("geometry", T.BinaryType())]
    )
    casts = {f.name: f.dataType.simpleString() for f in attrs.fields}

    def assemble(key, pdf: pd.DataFrame) -> pd.DataFrame:
        rings = []
        pdf = pdf.sort_values("role")
        tags = pdf["tags"].iloc[0]
        for _, r in pdf.iterrows():
            rings.append(parse_wkb(bytes(r["geometry"])).parts[0])
        rec = {}
        for n in names:
            v = tags.get(n)
            if v is None:
                rec[n] = None
            elif casts[n] in ("bigint", "int", "smallint"):
                rec[n] = int(v)
            elif casts[n] in ("double", "float"):
                rec[n] = float(v)
            else:
                rec[n] = v
        rec["geometry"] = wkbmod.wkb_polygon(rings)
        return pd.DataFrame([rec], columns=names + ["geometry"])

    return joined.groupBy("rel_id").applyInPandas(assemble, out_schema)
