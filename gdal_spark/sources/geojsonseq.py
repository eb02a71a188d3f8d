"""GeoJSONSeq (newline-delimited GeoJSON features) source/sink —
the reference's GeoJSONSeq driver (ogr/ogrsf_frmts/geojson/
ogrgeojsonseqdriver.cpp): one Feature object per line, which makes
it the fully DISTRIBUTABLE text format — both read and write are
parallel (unlike the single-writer sqlite/shp sinks): the sink is a
plain Spark text write, the source a text scan + Arrow-batched JSON
parse. Geometry converts via the same GeoJSON mapping as
ST_AsGeoJSON / ST_GeomFromGeoJSON.
"""

from __future__ import annotations

import json

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["write_geojsonseq", "read_geojsonseq"]


def _geom_to_json(wkb: bytes) -> dict:
    from gdal_spark.geo.wkb import parse_wkb

    g = parse_wkb(bytes(wkb))
    if g.type_name == "Point":
        x, y = g.parts[0][0]
        return {"type": "Point", "coordinates": [float(x), float(y)]}
    if g.type_name == "LineString":
        return {
            "type": "LineString",
            "coordinates": [[float(x), float(y)] for x, y in g.parts[0]],
        }
    polys = [
        [[[float(x), float(y)] for x, y in ring] for ring in rings]
        for rings in g.all_rings()
    ]
    if len(polys) == 1 and g.type_name == "Polygon":
        return {"type": "Polygon", "coordinates": polys[0]}
    return {"type": "MultiPolygon", "coordinates": polys}


def _json_to_wkb(o: dict) -> bytes:
    from gdal_spark.geo.wkb import (
        wkb_linestring,
        wkb_multipolygon,
        wkb_point,
        wkb_polygon,
    )

    t, c = o["type"], o["coordinates"]
    if t == "Point":
        return wkb_point(float(c[0]), float(c[1]))
    if t == "LineString":
        return wkb_linestring(np.asarray(c, dtype=np.float64))
    if t == "Polygon":
        return wkb_polygon([np.asarray(r, dtype=np.float64) for r in c])
    return wkb_multipolygon(
        [[np.asarray(r, dtype=np.float64) for r in poly] for poly in c]
    )


def feature_lines(df: DataFrame, geom_col: str = "geometry") -> DataFrame:
    """Rows -> one GeoJSON Feature line each (column `value`)."""
    attrs = [f.name for f in df.schema.fields if f.name != geom_col]

    schema = T.StructType([T.StructField("value", T.StringType())])

    def encode(batches):
        for pdf in batches:
            lines = []
            for _, row in pdf.iterrows():
                feat = {
                    "type": "Feature",
                    "properties": {a: _py(row[a]) for a in attrs},
                    "geometry": _geom_to_json(row[geom_col]),
                }
                lines.append(json.dumps(feat, sort_keys=True))
            yield pd.DataFrame({"value": lines})

    return df.mapInPandas(encode, schema)


def write_geojsonseq(
    df: DataFrame, path: str, geom_col: str = "geometry"
) -> None:
    """Distributed sink: every row becomes one GeoJSON Feature line."""
    feature_lines(df, geom_col).write.mode("overwrite").text(path)


def _py(v):
    if isinstance(v, (np.integer,)):
        return int(v)
    if isinstance(v, (np.floating,)):
        return float(v)
    return v


def lines_to_features(lines: DataFrame, attr_schema: str) -> DataFrame:
    """Feature-line DataFrame (column `value`) -> typed features."""
    attrs = T._parse_datatype_string(attr_schema)
    schema = T.StructType(
        list(attrs.fields) + [T.StructField("geometry", T.BinaryType())]
    )
    names = [f.name for f in attrs.fields]

    def decode(batches):
        for pdf in batches:
            out = []
            for line in pdf["value"]:
                o = json.loads(line)
                rec = {n: o["properties"].get(n) for n in names}
                rec["geometry"] = _json_to_wkb(o["geometry"])
                out.append(rec)
            yield pd.DataFrame(out, columns=names + ["geometry"])

    return lines.mapInPandas(decode, schema)


def read_geojsonseq(
    spark: SparkSession, path: str, attr_schema: str
) -> DataFrame:
    """Distributed source: text lines -> Features. `attr_schema` is a
    DDL string for the properties (e.g. "fid long, kind string");
    geometry lands as WKB."""
    return lines_to_features(spark.read.text(path), attr_schema)
