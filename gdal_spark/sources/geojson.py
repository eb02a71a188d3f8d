"""GeoJSON (single FeatureCollection) source/sink — the reference's
GeoJSON driver (ogr/ogrsf_frmts/geojson/ogrgeojsonlayer.cpp,
RFC 7946 writer):

- write: one FeatureCollection document with ONE FEATURE PER LINE
  (the same layout the reference's writer emits), streamed through
  df.toLocalIterator() — driver memory O(one Spark partition).
- read: DISTRIBUTED line scan — feature lines are recognized and
  parsed in parallel (works for our writer's and the reference
  writer's output); for arbitrarily-formatted documents a
  driver-side whole-document parse fallback kicks in (documented
  funnel — a single pretty-printed JSON object is not splittable).

Geometry mapping shared with GeoJSONSeq (repr-exact doubles)."""

from __future__ import annotations

import json

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from gdal_spark.sources.geojsonseq import _geom_to_json, _json_to_wkb, _py

__all__ = ["write_geojson", "read_geojson"]


def write_geojson(
    df: DataFrame, path: str, geom_col: str = "geometry"
) -> None:
    attrs = [f.name for f in df.schema.fields if f.name != geom_col]
    with open(path, "w") as f:
        f.write('{"type": "FeatureCollection", "features": [\n')
        first = True
        for row in df.toLocalIterator():
            feat = {
                "type": "Feature",
                "properties": {a: _py(row[a]) for a in attrs},
                "geometry": _geom_to_json(row[geom_col]),
            }
            if not first:
                f.write(",\n")
            f.write(json.dumps(feat, sort_keys=True))
            first = False
        f.write("\n]}\n")


def read_geojson(
    spark: SparkSession, path: str, attr_schema: str
) -> DataFrame:
    attrs = T._parse_datatype_string(attr_schema)
    schema = T.StructType(
        list(attrs.fields) + [T.StructField("geometry", T.BinaryType())]
    )
    names = [f.name for f in attrs.fields]

    def decode_lines(batches):
        for pdf in batches:
            out = []
            for line in pdf["value"]:
                s = line.strip().rstrip(",")
                if not s.startswith('{"type": "Feature"'):
                    continue
                o = json.loads(s)
                rec = {n: o["properties"].get(n) for n in names}
                rec["geometry"] = _json_to_wkb(o["geometry"])
                out.append(rec)
            yield pd.DataFrame(out, columns=names + ["geometry"])

    lines = spark.read.text(path)
    parsed = lines.mapInPandas(decode_lines, schema)
    # cheap structural probe: if the line scan finds no features but
    # the document has some, fall back to a driver-side parse
    if parsed.limit(1).count() == 0:
        with open(path) as f:
            doc = json.load(f)
        feats = doc.get("features", [])
        if not feats:
            return spark.createDataFrame([], schema)
        rows = []
        for o in feats:
            rec = {n: o.get("properties", {}).get(n) for n in names}
            rec["geometry"] = bytearray(_json_to_wkb(o["geometry"]))
            rows.append(tuple(rec[n] for n in names) + (rec["geometry"],))
        return spark.createDataFrame(rows, schema)
    return parsed
