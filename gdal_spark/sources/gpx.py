"""GPX vector source/sink — the reference's GPX driver surface
(ogr/ogrsf_frmts/gpx/ogrgpxlayer.cpp + ogrgpxdatasource.cpp): five
layers over one document —

  waypoints     one feature per <wpt>          Point
  routes        one feature per <rte>          LineString of <rtept>
  tracks        one feature per <trk>          MultiLineString, one
                                               part per <trkseg>
  route_points  one feature per <rtept>        Point + route_fid /
                                               route_point_id
  track_points  one feature per <trkpt>        Point + track_fid /
                                               track_seg_id /
                                               track_seg_point_id

Known GPX schema fields (ele, time, name, cmt, desc, sym, type,
number) serialize as native child elements in GPX 1.1 schema order;
any other DataFrame column rides in <extensions> with the same
``ogr:`` prefix the reference writer emits when GPX_USE_EXTENSIONS is
set (ogrgpxlayer.cpp OGRGPXLayer::ICreateFeature extensions branch).

- write: streamed single-file sink (df.toLocalIterator(), driver
  memory O(one partition)) emitting ONE top-level element per line;
  lat/lon attributes and ele text use repr-exact shortest-roundtrip
  doubles (the reference's %.15g loses last-ulp fidelity, which would
  break value-level roundtrip oracles).
- read: DISTRIBUTED line scan — complete one-line elements parse in
  parallel with stdlib ElementTree; a driver-side whole-document
  parse is the documented funnel for arbitrarily-formatted
  (pretty-printed, multi-line) documents, mirroring sources/kml.py.
  In the distributed path the parent fid of route_points /
  track_points comes from the GPX <number> element when present
  (our writer always emits it when a ``number`` column exists); the
  funnel path uses document order, exactly like the reference.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from gdal_spark.geo import wkb as wkbmod
from gdal_spark.geo.wkb import parse_wkb

__all__ = ["write_gpx", "read_gpx"]

# GPX 1.1 wptType child-element order (the subset the engine maps;
# schema sequence: ele, time, …, name, cmt, desc, …, sym, type)
_WPT_FIELDS = ("ele", "time", "name", "cmt", "desc", "sym", "type")
# rteType / trkType children (number is uint per spec)
_CONTAINER_FIELDS = ("name", "cmt", "desc", "number", "type")

_XML_ESC = {"&": "&amp;", "<": "&lt;", ">": "&gt;", '"': "&quot;"}


def _esc(s) -> str:
    return "".join(_XML_ESC.get(ch, ch) for ch in str(s))


def _num(v) -> str:
    # repr-exact doubles for float-typed values, plain text otherwise
    return repr(float(v)) if isinstance(v, float) else _esc(v)


def _fields_xml(row, attrs, known) -> str:
    """Native children for known GPX fields + one <extensions> block
    for the rest (reference: GPX_USE_EXTENSIONS ogr: prefix)."""
    parts = []
    for f in known:
        if f in attrs and row[f] is not None:
            parts.append(f"<{f}>{_num(row[f])}</{f}>")
    ext = [
        f"<ogr:{a}>{_num(row[a])}</ogr:{a}>"
        for a in attrs
        if a not in known and row[a] is not None
    ]
    if ext:
        parts.append("<extensions>" + "".join(ext) + "</extensions>")
    return "".join(parts)


def _pt_xml(tag: str, x: float, y: float, body: str = "") -> str:
    return (
        f'<{tag} lat="{repr(float(y))}" lon="{repr(float(x))}">'
        f"{body}</{tag}>"
    )


def write_gpx(
    path: str,
    waypoints: DataFrame | None = None,
    routes: DataFrame | None = None,
    tracks: DataFrame | None = None,
    geom_col: str = "geometry",
) -> None:
    """Write up to three layers into one .gpx document (the reference
    emits wpt, then rte, then trk — ogrgpxdatasource.cpp enforces
    that layer creation order)."""
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        f.write('<?xml version="1.0"?>\n')
        f.write(
            '<gpx version="1.1" creator="gdal_spark" '
            'xmlns="http://www.topografix.com/GPX/1/1" '
            'xmlns:ogr="http://osgeo.org/gdal">\n'
        )
        if waypoints is not None:
            attrs = [c for c in waypoints.columns if c != geom_col]
            for row in waypoints.toLocalIterator():
                x, y = parse_wkb(bytes(row[geom_col])).parts[0][0]
                f.write(
                    _pt_xml("wpt", x, y, _fields_xml(row, attrs, _WPT_FIELDS))
                    + "\n"
                )
        if routes is not None:
            attrs = [c for c in routes.columns if c != geom_col]
            for row in routes.toLocalIterator():
                g = parse_wkb(bytes(row[geom_col]))
                body = [_fields_xml(row, attrs, _CONTAINER_FIELDS)]
                for x, y in g.parts[0]:
                    body.append(_pt_xml("rtept", x, y))
                f.write(f"<rte>{''.join(body)}</rte>\n")
        if tracks is not None:
            attrs = [c for c in tracks.columns if c != geom_col]
            for row in tracks.toLocalIterator():
                g = parse_wkb(bytes(row[geom_col]))
                segs = g.parts  # LineString → 1 part, MLS → n parts
                body = [_fields_xml(row, attrs, _CONTAINER_FIELDS)]
                for seg in segs:
                    body.append(
                        "<trkseg>"
                        + "".join(_pt_xml("trkpt", x, y) for x, y in seg)
                        + "</trkseg>"
                    )
                f.write(f"<trk>{''.join(body)}</trk>\n")
        f.write("</gpx>\n")
    import os

    os.replace(tmp, path)


# ---------------------------------------------------------------------------
# read
# ---------------------------------------------------------------------------

def _local(tag: str) -> str:
    return tag[tag.index("}") + 1:] if tag.startswith("{") else tag


def _elem_fields(elem) -> dict:
    """Child elements (native GPX fields) + <extensions> children
    (ogr: prefix stripped) → text dict."""
    rec = {}
    for ch in elem:
        name = _local(ch.tag)
        if name == "extensions":
            for ext in ch:
                rec[_local(ext.tag)] = ext.text
        elif name not in ("rtept", "trkseg", "trkpt"):
            rec[name] = ch.text
    return rec


def _pts(elem, tag: str):
    out = []
    for ch in elem:
        if _local(ch.tag) == tag:
            out.append((float(ch.get("lon")), float(ch.get("lat"))))
    return out


_POINT_LAYER_KEYS = {
    "route_points": ("route_fid", "route_point_id"),
    "track_points": ("track_fid", "track_seg_id", "track_seg_point_id"),
}


def _elem_rows(elem, layer: str, doc_fid: int | None):
    """One parsed top-level element → list of (fields, wkb) rows for
    the requested layer. doc_fid is the document-order ordinal (funnel
    path) or None (distributed path → fall back to <number>)."""
    tag = _local(elem.tag)
    fields = _elem_fields(elem)
    if layer == "waypoints" and tag == "wpt":
        x, y = float(elem.get("lon")), float(elem.get("lat"))
        return [(fields, wkbmod.wkb_point(x, y))]
    if layer == "routes" and tag == "rte":
        return [(fields, wkbmod.wkb_linestring(_pts(elem, "rtept")))]
    if layer == "tracks" and tag == "trk":
        import numpy as np

        segs = [
            np.asarray(_pts(seg, "trkpt"), dtype=np.float64)
            for seg in elem
            if _local(seg.tag) == "trkseg"
        ]
        g = wkbmod.Geometry(wkbmod.WKB_MULTILINESTRING, parts=segs)
        return [(fields, wkbmod.geometry_to_wkb(g))]
    if layer == "route_points" and tag == "rte":
        fid = doc_fid if doc_fid is not None else int(fields.get("number", -1))
        return [
            ({"route_fid": fid, "route_point_id": i},
             wkbmod.wkb_point(x, y))
            for i, (x, y) in enumerate(_pts(elem, "rtept"))
        ]
    if layer == "track_points" and tag == "trk":
        fid = doc_fid if doc_fid is not None else int(fields.get("number", -1))
        rows = []
        seg_id = 0
        for seg in elem:
            if _local(seg.tag) != "trkseg":
                continue
            for i, (x, y) in enumerate(_pts(seg, "trkpt")):
                rows.append(
                    ({"track_fid": fid, "track_seg_id": seg_id,
                      "track_seg_point_id": i},
                     wkbmod.wkb_point(x, y))
                )
            seg_id += 1
        return rows
    return []


def _cast_fn(dt: str):
    if dt in ("bigint", "int", "smallint", "tinyint"):
        return lambda v: int(v)
    if dt in ("double", "float"):
        return lambda v: float(v)
    return lambda v: v


def read_gpx(
    spark: SparkSession, path: str, layer: str, attr_schema: str
) -> DataFrame:
    """Distributed one-element-per-line scan of `layer`; driver-parse
    funnel for pretty-printed documents (see module docstring)."""
    import xml.etree.ElementTree as ET

    if layer not in ("waypoints", "routes", "tracks",
                     "route_points", "track_points"):
        raise ValueError(f"gpx: unknown layer {layer!r}")
    attrs = T._parse_datatype_string(attr_schema)
    schema = T.StructType(
        list(attrs.fields) + [T.StructField("geometry", T.BinaryType())]
    )
    names = [f.name for f in attrs.fields]
    casts = {f.name: _cast_fn(f.dataType.simpleString()) for f in attrs.fields}
    open_tags = ("<wpt ", "<rte>", "<trk>")
    close_tags = ("</wpt>", "</rte>", "</trk>", "/>")

    def to_row(fields: dict, wkb: bytes) -> dict:
        r = {
            n: casts[n](fields[n])
            if fields.get(n) is not None else None
            for n in names
        }
        r["geometry"] = wkb
        return r

    def decode_lines(batches):
        for pdf in batches:
            out = []
            for line in pdf["value"]:
                s = line.strip()
                if not (s.startswith(open_tags) and s.endswith(close_tags)):
                    continue
                # single lines lose the root's xmlns:ogr declaration —
                # re-bind it with a throwaway wrapper element
                elem = ET.fromstring(
                    f'<g xmlns:ogr="http://osgeo.org/gdal">{s}</g>'
                )[0]
                for fields, wkb in _elem_rows(elem, layer, None):
                    out.append(to_row(fields, wkb))
            yield pd.DataFrame(out, columns=names + ["geometry"])

    parsed = spark.read.text(path).mapInPandas(decode_lines, schema)
    if parsed.limit(1).count() == 0:
        root = ET.parse(path).getroot()
        want = {"waypoints": "wpt", "routes": "rte",
                "route_points": "rte", "tracks": "trk",
                "track_points": "trk"}[layer]
        rows, fid = [], 0
        for elem in root:
            if _local(elem.tag) != want:
                continue
            for fields, wkb in _elem_rows(elem, layer, fid):
                r = to_row(fields, wkb)
                rows.append(tuple(r[n] for n in names) + (bytearray(wkb),))
            fid += 1
        if not rows:
            return spark.createDataFrame([], schema)
        return spark.createDataFrame(rows, schema)
    return parsed
