"""OGC JSON-FG (Features & Geometry JSON) — ogr/ogrsf_frmts/jsonfg/.

JSON-FG extends GeoJSON with native-CRS geometry and feature time:

- collection header carries ``"conformsTo" :
  ["[ogc-json-fg-1-0.1:core]"]`` (ogrjsonfgdataset.cpp:543) and a
  ``coordRefSys`` CURIE like ``"[EPSG:3857]"``
  (ogrjsonfgreader.cpp:95-140 parses the ``[AUTH:CODE]`` form);
- each feature may carry ``featureType`` (the layer name,
  ogrjsonfgreader.cpp:354), a ``time`` member ({"date": ...} or
  {"timestamp": ...}, ogrjsonfgwritelayer.cpp:225-288), a ``place``
  member holding the geometry in the native CRS, and ``geometry``
  as the WGS84 fallback — when the CRS *is* WGS84 the geometry goes
  in ``geometry`` and ``place`` is null
  (ogrjsonfgwritelayer.cpp:300-380);
- readers prefer ``place`` (+ coordRefSys) and fall back to
  ``geometry``.

The WGS84 fallback here is a REAL reprojection through the in-repo
projection registry (geo/projzoo.reproject), matching the
reference's poCTToWGS84_ path.  Reads are distributed line scans
exactly like sources/geojson.py.
"""

from __future__ import annotations

import json

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from gdal_spark.sources.geojsonseq import _geom_to_json, _json_to_wkb, _py

__all__ = ["write_jsonfg", "read_jsonfg"]


def write_jsonfg(
    df: DataFrame,
    path: str,
    geom_col: str = "geometry",
    time_col: str | None = None,
    feature_type: str = "features",
    epsg: int = 4326,
) -> None:
    """Write a JSON-FG FeatureCollection.  ``epsg`` is the native CRS
    of ``geom_col``: 4326 puts the geometry in ``geometry`` with a
    null ``place``; anything else puts it in ``place`` and writes the
    reprojected WGS84 fallback in ``geometry``."""
    from gdal_spark.geo import projzoo
    from gdal_spark.geo.wkb import parse_wkb, wkb_point

    attrs = [f.name for f in df.schema.fields
             if f.name not in (geom_col, time_col)]
    wgs84 = epsg == 4326
    with open(path, "w") as f:
        f.write('{"type": "FeatureCollection",\n')
        f.write('"conformsTo" : ["[ogc-json-fg-1-0.1:core]"],\n')
        f.write(f'"coordRefSys" : "[EPSG:{epsg}]",\n')
        f.write('"features": [\n')
        first = True
        for row in df.toLocalIterator():
            feat: dict = {
                "type": "Feature",
                "featureType": feature_type,
                "properties": {a: _py(row[a]) for a in attrs},
            }
            if time_col is not None:
                tv = row[time_col]
                key = "date" if len(str(tv)) == 10 else "timestamp"
                feat["time"] = None if tv is None else {key: str(tv)}
            else:
                feat["time"] = None
            wkb = row[geom_col]
            if wkb is None:
                feat["place"] = None
                feat["geometry"] = None
            elif wgs84:
                feat["place"] = None
                feat["geometry"] = _geom_to_json(wkb)
            else:
                feat["place"] = _geom_to_json(wkb)
                g = parse_wkb(bytes(wkb))
                if g.type_name != "Point":
                    raise ValueError(
                        "jsonfg: non-point fallback reprojection is the "
                        "vector_reproject operator's job — reproject "
                        "first")
                x, y = float(g.parts[0][0][0]), float(g.parts[0][0][1])
                lon, lat = projzoo.inverse(epsg, x, y)
                feat["geometry"] = _geom_to_json(
                    wkb_point(float(lon), float(lat)))
            if not first:
                f.write(",\n")
            f.write(json.dumps(feat, sort_keys=True))
            first = False
        f.write("\n]}\n")


def read_jsonfg(
    spark: SparkSession, path: str, attr_schema: str
) -> DataFrame:
    """Distributed JSON-FG line scan -> (attrs..., time string,
    feature_type, place WKB or null, geometry WKB or null)."""
    attrs = T._parse_datatype_string(attr_schema)
    schema = T.StructType(
        list(attrs.fields)
        + [
            T.StructField("time", T.StringType()),
            T.StructField("feature_type", T.StringType()),
            T.StructField("place", T.BinaryType()),
            T.StructField("geometry", T.BinaryType()),
        ]
    )
    names = [f.name for f in attrs.fields]

    def decode_lines(batches):
        for pdf in batches:
            out = []
            for line in pdf["value"]:
                s = line.strip().rstrip(",")
                if not s.startswith('{"type": "Feature"') and \
                        not s.startswith('{"featureType"'):
                    continue
                o = json.loads(s)
                rec = {n: o.get("properties", {}).get(n) for n in names}
                t = o.get("time")
                rec["time"] = (None if not t
                               else t.get("timestamp") or t.get("date"))
                rec["feature_type"] = o.get("featureType")
                rec["place"] = (_json_to_wkb(o["place"])
                                if o.get("place") else None)
                rec["geometry"] = (_json_to_wkb(o["geometry"])
                                   if o.get("geometry") else None)
                out.append(rec)
            yield pd.DataFrame(
                out, columns=names + ["time", "feature_type", "place",
                                      "geometry"]
            )

    return spark.read.text(path).mapInPandas(decode_lines, schema)
