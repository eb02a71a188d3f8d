"""GML vector source/sink — the classic OGR .gml FeatureCollection
layout (ogr/ogrsf_frmts/gml driver; geometry serialization per
ogr/ogr2gmlgeometry.cpp GML 2: gml:Point/LineString/Polygon with
gml:coordinates "x,y x,y" tuples and outer/innerBoundaryIs rings —
the same element shapes ST_AsGML emits).

- write: streamed single-file sink, ONE <gml:featureMember> per line
  with repr-exact coordinates (the reference's %.15g loses last-ulp
  fidelity — same deviation as sources/kml.py, for value-level
  roundtrip oracles);
- read: DISTRIBUTED per-line parse (each featureMember line is
  wrapped with the namespace declarations and handed to stdlib
  ElementTree), with a driver-side whole-document funnel for
  pretty-printed files.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from gdal_spark.geo import wkb as wkbmod
from gdal_spark.sources.kml import _esc

OGR_NS = "http://ogr.maptools.org/"
GML_NS = "http://www.opengis.net/gml"

__all__ = ["write_gml", "read_gml"]


def _coords(arr) -> str:
    return " ".join(f"{repr(float(x))},{repr(float(y))}" for x, y in arr)


def _geom_to_gml(blob: bytes) -> str:
    g = wkbmod.parse_wkb(bytes(blob))
    if g.type_id == wkbmod.WKB_POINT:
        x, y = g.parts[0][0]
        return (
            f"<gml:Point><gml:coordinates>{repr(float(x))},{repr(float(y))}"
            "</gml:coordinates></gml:Point>"
        )
    if g.type_id == wkbmod.WKB_LINESTRING:
        return (
            f"<gml:LineString><gml:coordinates>{_coords(g.parts[0])}"
            "</gml:coordinates></gml:LineString>"
        )
    polys = g.all_rings()
    parts = []
    for rings in polys:
        p = ["<gml:Polygon><gml:outerBoundaryIs><gml:LinearRing>"
             "<gml:coordinates>", _coords(rings[0]),
             "</gml:coordinates></gml:LinearRing></gml:outerBoundaryIs>"]
        for hole in rings[1:]:
            p += ["<gml:innerBoundaryIs><gml:LinearRing><gml:coordinates>",
                  _coords(hole),
                  "</gml:coordinates></gml:LinearRing></gml:innerBoundaryIs>"]
        p.append("</gml:Polygon>")
        parts.append("".join(p))
    if len(parts) == 1:
        return parts[0]
    return (
        "<gml:MultiPolygon>"
        + "".join(
            f"<gml:polygonMember>{p}</gml:polygonMember>" for p in parts
        )
        + "</gml:MultiPolygon>"
    )


def write_gml(
    df: DataFrame,
    path: str,
    layer: str = "layer",
    geom_col: str = "geometry",
    fid_col: str = "fid",
) -> None:
    attrs = [
        f.name for f in df.schema.fields if f.name not in (geom_col, fid_col)
    ]
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        f.write('<?xml version="1.0" encoding="utf-8"?>\n')
        f.write(
            f'<ogr:FeatureCollection xmlns:ogr="{OGR_NS}" '
            f'xmlns:gml="{GML_NS}">\n'
        )
        for row in df.toLocalIterator():
            cols = "".join(
                f"<ogr:{a}>{_esc(row[a])}</ogr:{a}>"
                for a in attrs
                if row[a] is not None
            )
            f.write(
                "<gml:featureMember>"
                f'<ogr:{layer} fid="{int(row[fid_col])}">'
                "<ogr:geometryProperty>"
                f"{_geom_to_gml(row[geom_col])}"
                f"</ogr:geometryProperty>{cols}</ogr:{layer}>"
                "</gml:featureMember>\n"
            )
        f.write("</ogr:FeatureCollection>\n")
    import os

    os.replace(tmp, path)


def _parse_coords(text: str):
    return [
        (float(t.split(",")[0]), float(t.split(",")[1]))
        for t in text.split()
    ]


def _member_to_row(elem, names: list[str]):
    """<gml:featureMember> element -> (fid, attr dict, wkb)."""
    o = "{%s}" % OGR_NS
    gn = "{%s}" % GML_NS
    feat = list(elem)[0]
    fid = int(feat.get("fid"))
    rec = {n: None for n in names}
    for child in feat:
        tag = child.tag.split("}")[-1]
        if tag in rec:
            rec[tag] = child.text
    pt = feat.find(f".//{gn}Point/{gn}coordinates")
    ls = feat.find(f".//{gn}LineString/{gn}coordinates")
    if pt is not None:
        x, y = _parse_coords(pt.text)[0]
        return fid, rec, wkbmod.wkb_point(x, y)
    if ls is not None:
        return fid, rec, wkbmod.wkb_linestring(_parse_coords(ls.text))
    polys = []
    for poly in feat.iter(f"{gn}Polygon"):
        rings = [
            _parse_coords(
                poly.find(
                    f"{gn}outerBoundaryIs/{gn}LinearRing/{gn}coordinates"
                ).text
            )
        ]
        for inner in poly.findall(
            f"{gn}innerBoundaryIs/{gn}LinearRing/{gn}coordinates"
        ):
            rings.append(_parse_coords(inner.text))
        polys.append(rings)
    if not polys:
        raise ValueError("featureMember without supported geometry")
    if len(polys) == 1:
        return fid, rec, wkbmod.wkb_polygon(polys[0])
    return fid, rec, wkbmod.wkb_multipolygon(polys)


def read_gml(spark: SparkSession, path: str, attr_schema: str) -> DataFrame:
    import xml.etree.ElementTree as ET

    attrs = T._parse_datatype_string(attr_schema)
    schema = T.StructType(
        [T.StructField("fid", T.LongType())]
        + list(attrs.fields)
        + [T.StructField("geometry", T.BinaryType())]
    )
    names = [f.name for f in attrs.fields]
    casts = {f.name: f.dataType.simpleString() for f in attrs.fields}
    wrap = (
        f'<w xmlns:ogr="{OGR_NS}" xmlns:gml="{GML_NS}">%s</w>'
    )

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
                if not (s.startswith("<gml:featureMember>")
                        and s.endswith("</gml:featureMember>")):
                    continue
                elem = ET.fromstring(wrap % s)
                fid, rec, wkb = _member_to_row(list(elem)[0], names)
                r = cast_row(rec)
                r["fid"] = fid
                r["geometry"] = wkb
                out.append(r)
            yield pd.DataFrame(
                out, columns=["fid"] + names + ["geometry"]
            )

    parsed = spark.read.text(path).mapInPandas(decode_lines, schema)
    if parsed.limit(1).count() == 0:
        # funnel: whole-document parse for pretty-printed files
        root = ET.parse(path).getroot()
        gn = "{%s}" % GML_NS
        rows = []
        for fm in root.iter(f"{gn}featureMember"):
            fid, rec, wkb = _member_to_row(fm, names)
            r = cast_row(rec)
            rows.append(
                (fid,) + tuple(r[n] for n in names) + (bytearray(wkb),)
            )
        if not rows:
            return spark.createDataFrame([], schema)
        return spark.createDataFrame(rows, schema)
    return parsed
