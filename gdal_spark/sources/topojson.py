"""TopoJSON vector source/sink — the reference reads TopoJSON through
the GeoJSON driver family (ogr/ogrsf_frmts/geojson/
ogrtopojsonreader.cpp: Topology object, shared arc table, optional
transform quantization, negative arc indexes as reversed
complements).

- read: supports BOTH encodings — quantized (delta-encoded integer
  arcs + {scale, translate} transform) and non-quantized (absolute
  float positions).  Per-FILE distributed parse (the arc table is
  document-global, so the file is the split unit; directories of
  .topojson files scan fully parallel).
- write: non-quantized Topology (absolute positions, repr-exact
  doubles — quantization would break value-level roundtrip oracles;
  the reference itself never writes TopoJSON), one arc per ring /
  line, one object layer, feature properties + id preserved.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from gdal_spark.geo import wkb as wkbmod
from gdal_spark.geo.wkb import parse_wkb

__all__ = ["write_topojson", "read_topojson"]


def _arc_of(ring: np.ndarray) -> list[list[float]]:
    return [[float(x), float(y)] for x, y in ring]


def write_topojson(df: DataFrame, path: str, layer: str = "layer",
                   geom_col: str = "geometry",
                   id_col: str | None = None) -> None:
    """Streamed single-file sink (toLocalIterator, O(one partition)
    driver memory): geometries decompose into the shared arc table,
    one arc per ring/line part."""
    attrs = [f.name for f in df.schema.fields
             if f.name not in (geom_col, id_col)]
    arcs: list = []
    geoms: list = []
    for row in df.toLocalIterator():
        g = parse_wkb(bytes(row[geom_col]))
        props = {a: row[a] for a in attrs}
        rec: dict = {"properties": props}
        if id_col is not None:
            rec["id"] = row[id_col]
        if g.type_id == wkbmod.WKB_POINT:
            x, y = g.parts[0][0]
            rec.update(type="Point", coordinates=[float(x), float(y)])
        elif g.type_id == wkbmod.WKB_LINESTRING:
            rec.update(type="LineString", arcs=[len(arcs)])
            arcs.append(_arc_of(g.parts[0]))
        elif g.type_id == wkbmod.WKB_MULTILINESTRING:
            idx = []
            for part in g.parts:
                idx.append([len(arcs)])
                arcs.append(_arc_of(part))
            rec.update(type="MultiLineString", arcs=idx)
        elif g.type_id == wkbmod.WKB_POLYGON:
            idx = []
            for ring in g.parts:
                idx.append([len(arcs)])
                arcs.append(_arc_of(ring))
            rec.update(type="Polygon", arcs=idx)
        elif g.type_id == wkbmod.WKB_MULTIPOLYGON:
            pidx = []
            for rings in g.polys:
                ridx = []
                for ring in rings:
                    ridx.append([len(arcs)])
                    arcs.append(_arc_of(ring))
                pidx.append(ridx)
            rec.update(type="MultiPolygon", arcs=pidx)
        else:
            raise ValueError(f"topojson: unsupported {g.type_name}")
        geoms.append(rec)
    doc = {
        "type": "Topology",
        "objects": {
            layer: {"type": "GeometryCollection", "geometries": geoms}
        },
        "arcs": arcs,
    }
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        # repr-exact floats: json with float repr (python json uses repr)
        json.dump(doc, f)
    os.replace(tmp, path)


def _decode_arcs(doc: dict) -> list[np.ndarray]:
    """Arc table -> absolute float64 coordinate arrays (applies the
    delta + transform decoding when a transform is present)."""
    tr = doc.get("transform")
    out = []
    for arc in doc["arcs"]:
        a = np.asarray(arc, dtype=np.float64)
        if tr is not None:
            a = np.cumsum(a, axis=0)
            a[:, 0] = a[:, 0] * tr["scale"][0] + tr["translate"][0]
            a[:, 1] = a[:, 1] * tr["scale"][1] + tr["translate"][1]
        out.append(a)
    return out


def _ring_from(arc_ids, arcs: list[np.ndarray]) -> np.ndarray:
    """Concatenate arc refs (negative ~k = reversed complement) into
    one coordinate sequence, joining at shared endpoints."""
    parts = []
    for k in arc_ids:
        a = arcs[k] if k >= 0 else arcs[~k][::-1]
        if parts:
            a = a[1:]  # shared join point
        parts.append(a)
    return np.vstack(parts)


def _geom_to_wkb(rec: dict, arcs: list[np.ndarray]) -> bytes:
    t = rec["type"]
    if t == "Point":
        x, y = rec["coordinates"]
        return wkbmod.wkb_point(float(x), float(y))
    if t == "LineString":
        return wkbmod.wkb_linestring(_ring_from(rec["arcs"], arcs))
    if t == "MultiLineString":
        g = wkbmod.Geometry(
            wkbmod.WKB_MULTILINESTRING,
            parts=[_ring_from(ix, arcs) for ix in rec["arcs"]],
        )
        return wkbmod.geometry_to_wkb(g)
    if t == "Polygon":
        return wkbmod.wkb_polygon(
            [_ring_from(ix, arcs) for ix in rec["arcs"]]
        )
    if t == "MultiPolygon":
        return wkbmod.wkb_multipolygon(
            [[_ring_from(ix, arcs) for ix in ridx]
             for ridx in rec["arcs"]]
        )
    raise ValueError(f"topojson: unsupported geometry {t!r}")


def read_topojson(spark: SparkSession, path: str, layer: str,
                  attr_schema: str, id_col: str | None = None
                  ) -> DataFrame:
    """Distributed per-file parse of `path` (one .topojson file or a
    directory)."""
    attrs = T._parse_datatype_string(attr_schema)
    fields = list(attrs.fields) + [T.StructField("geometry", T.BinaryType())]
    schema = T.StructType(fields)
    names = [f.name for f in attrs.fields]

    def decode_files(batches):
        for pdf in batches:
            rows = []
            for content in pdf["content"]:
                doc = json.loads(bytes(content).decode("utf-8"))
                if doc.get("type") != "Topology":
                    raise ValueError("topojson: not a Topology document")
                arcs = _decode_arcs(doc)
                obj = doc["objects"][layer]
                for rec in obj["geometries"]:
                    props = rec.get("properties", {})
                    r = {}
                    for n in names:
                        if id_col is not None and n == id_col:
                            r[n] = rec.get("id")
                        else:
                            r[n] = props.get(n)
                    r["geometry"] = _geom_to_wkb(rec, arcs)
                    rows.append(r)
            yield pd.DataFrame(rows, columns=names + ["geometry"])

    raw = spark.read.format("binaryFile").load(
        path if path.lower().endswith((".topojson", ".json"))
        else os.path.join(path, "*.topojson")
    ).select("content")
    return raw.mapInPandas(decode_files, schema)
