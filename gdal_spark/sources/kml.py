"""KML vector source/sink — the reference's KML driver surface
(ogr/ogrsf_frmts/kml: one <Placemark> per feature with ExtendedData
name/value attribute pairs; geometry serialization per
ogr/ogr2kmlgeometry.cpp Point/LineString/Polygon with
outerBoundaryIs/innerBoundaryIs rings and lon,lat coordinate tuples).

- write: streamed single-file sink (df.toLocalIterator(), driver
  memory O(one partition)) emitting ONE PLACEMARK PER LINE —
  coordinates use repr-exact shortest-roundtrip doubles (the KML spec
  does not bound precision; the reference's %.15g loses last-ulp
  fidelity, which would break value-level roundtrip oracles).
- read: DISTRIBUTED line scan — placemark lines parse in parallel
  with stdlib ElementTree; a driver-side whole-document parse is the
  documented funnel for arbitrarily-formatted (pretty-printed,
  namespaced) documents, mirroring sources/geojson.py.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from gdal_spark.geo.wkb import parse_wkb
from gdal_spark.geo import wkb as wkbmod

__all__ = ["write_kml", "read_kml"]

_XML_ESC = {"&": "&amp;", "<": "&lt;", ">": "&gt;", '"': "&quot;"}


def _esc(s: str) -> str:
    return "".join(_XML_ESC.get(ch, ch) for ch in str(s))


def _coords(arr) -> str:
    return " ".join(f"{repr(float(x))},{repr(float(y))}" for x, y in arr)


def _geom_to_kml(wkb: bytes) -> str:
    g = parse_wkb(bytes(wkb))
    if g.type_id == wkbmod.WKB_POINT:
        x, y = g.parts[0][0]
        return (
            f"<Point><coordinates>{repr(float(x))},{repr(float(y))}"
            "</coordinates></Point>"
        )
    if g.type_id == wkbmod.WKB_LINESTRING:
        return (
            f"<LineString><coordinates>{_coords(g.parts[0])}"
            "</coordinates></LineString>"
        )
    polys = g.all_rings()
    parts = []
    for rings in polys:
        p = ["<Polygon><outerBoundaryIs><LinearRing><coordinates>",
             _coords(rings[0]),
             "</coordinates></LinearRing></outerBoundaryIs>"]
        for hole in rings[1:]:
            p += ["<innerBoundaryIs><LinearRing><coordinates>",
                  _coords(hole),
                  "</coordinates></LinearRing></innerBoundaryIs>"]
        p.append("</Polygon>")
        parts.append("".join(p))
    if len(parts) == 1:
        return parts[0]
    return "<MultiGeometry>" + "".join(parts) + "</MultiGeometry>"


def write_kml(df: DataFrame, path: str, geom_col: str = "geometry") -> None:
    attrs = [f.name for f in df.schema.fields if f.name != geom_col]
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        f.write('<?xml version="1.0" encoding="utf-8"?>\n')
        f.write('<kml xmlns="http://www.opengis.net/kml/2.2"><Document>\n')
        for row in df.toLocalIterator():
            data = "".join(
                f'<Data name="{_esc(a)}"><value>{_esc(row[a])}</value></Data>'
                for a in attrs
                if row[a] is not None
            )
            f.write(
                "<Placemark>"
                f"<ExtendedData>{data}</ExtendedData>"
                f"{_geom_to_kml(row[geom_col])}"
                "</Placemark>\n"
            )
        f.write("</Document></kml>\n")
    import os

    os.replace(tmp, path)


def _parse_coords(text: str):
    pts = []
    for tok in text.split():
        xy = tok.split(",")
        pts.append((float(xy[0]), float(xy[1])))
    return pts


def _placemark_to_row(elem, names: list[str]):
    """ElementTree <Placemark> -> (attr dict, wkb)."""
    ns = ""
    if elem.tag.startswith("{"):
        ns = elem.tag[: elem.tag.index("}") + 1]
    rec = {n: None for n in names}
    for d in elem.iter(f"{ns}Data"):
        n = d.get("name")
        if n in rec:
            v = d.find(f"{ns}value")
            rec[n] = v.text if v is not None else None
    pt = elem.find(f".//{ns}Point/{ns}coordinates")
    ls = elem.find(f".//{ns}LineString/{ns}coordinates")
    if pt is not None:
        x, y = _parse_coords(pt.text)[0]
        return rec, wkbmod.wkb_point(x, y)
    if ls is not None:
        return rec, wkbmod.wkb_linestring(_parse_coords(ls.text))
    polys = []
    for poly in elem.iter(f"{ns}Polygon"):
        rings = []
        outer = poly.find(
            f"{ns}outerBoundaryIs/{ns}LinearRing/{ns}coordinates"
        )
        rings.append(_parse_coords(outer.text))
        for inner in poly.findall(
            f"{ns}innerBoundaryIs/{ns}LinearRing/{ns}coordinates"
        ):
            rings.append(_parse_coords(inner.text))
        polys.append(rings)
    if not polys:
        raise ValueError("Placemark without supported geometry")
    if len(polys) == 1:
        return rec, wkbmod.wkb_polygon(polys[0])
    return rec, wkbmod.wkb_multipolygon(polys)


def read_kml(spark: SparkSession, path: str, attr_schema: str) -> DataFrame:
    import xml.etree.ElementTree as ET

    attrs = T._parse_datatype_string(attr_schema)
    schema = T.StructType(
        list(attrs.fields) + [T.StructField("geometry", T.BinaryType())]
    )
    names = [f.name for f in attrs.fields]
    casts = {f.name: f.dataType.simpleString() for f in attrs.fields}

    def cast_row(rec):
        out = {}
        for n in names:
            v = rec[n]
            if v is None:
                out[n] = None
            elif casts[n] in ("bigint", "int", "smallint", "tinyint"):
                out[n] = int(v)
            elif casts[n] in ("double", "float"):
                out[n] = float(v)
            else:
                out[n] = v
        return out

    def decode_lines(batches):
        for pdf in batches:
            out = []
            for line in pdf["value"]:
                s = line.strip()
                # only complete one-line placemarks parse in the
                # distributed path; fragments fall to the funnel
                if not (s.startswith("<Placemark>")
                        and s.endswith("</Placemark>")):
                    continue
                rec, wkb = _placemark_to_row(ET.fromstring(s), names)
                r = cast_row(rec)
                r["geometry"] = wkb
                out.append(r)
            yield pd.DataFrame(out, columns=names + ["geometry"])

    parsed = spark.read.text(path).mapInPandas(decode_lines, schema)
    if parsed.limit(1).count() == 0:
        # funnel: whole-document parse for multi-line/namespaced docs
        root = ET.parse(path).getroot()
        ns = root.tag[: root.tag.index("}") + 1] if root.tag.startswith("{") else ""
        rows = []
        for pm in root.iter(f"{ns}Placemark"):
            rec, wkb = _placemark_to_row(pm, names)
            r = cast_row(rec)
            rows.append(tuple(r[n] for n in names) + (bytearray(wkb),))
        if not rows:
            return spark.createDataFrame([], schema)
        return spark.createDataFrame(rows, schema)
    return parsed
