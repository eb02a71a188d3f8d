"""Minimal WKT reader/writer (Point/LineString/Polygon/Multi*, 2-D).

Mirrors OGR's exportToWkt/importFromWkt surface (ogr/ogrgeometry.cpp
WKT paths) for the types the engine carries. Numbers are emitted with
repr-style shortest round-trip formatting.
"""

from __future__ import annotations

import re

import numpy as np

from gdal_spark.geo.wkb import (
    WKB_LINESTRING,
    WKB_MULTILINESTRING,
    WKB_MULTIPOINT,
    WKB_MULTIPOLYGON,
    WKB_POINT,
    WKB_POLYGON,
    Geometry,
)


def _fmt(v: float) -> str:
    s = repr(float(v))
    return s[:-2] if s.endswith(".0") else s


def _coords_txt(arr: np.ndarray) -> str:
    return ", ".join(f"{_fmt(x)} {_fmt(y)}" for x, y in arr)


def to_wkt(geom: Geometry) -> str:
    t = geom.type_id
    if t == WKB_POINT:
        x, y = geom.parts[0][0]
        return f"POINT ({_fmt(x)} {_fmt(y)})"
    if t == WKB_LINESTRING:
        return f"LINESTRING ({_coords_txt(geom.parts[0])})"
    if t == WKB_POLYGON:
        rings = ", ".join(f"({_coords_txt(r)})" for r in geom.parts)
        return f"POLYGON ({rings})"
    if t == WKB_MULTIPOINT:
        pts = ", ".join(f"({_fmt(x)} {_fmt(y)})" for x, y in geom.parts[0])
        return f"MULTIPOINT ({pts})"
    if t == WKB_MULTILINESTRING:
        lines = ", ".join(f"({_coords_txt(l)})" for l in geom.parts)
        return f"MULTILINESTRING ({lines})"
    if t == WKB_MULTIPOLYGON:
        polys = ", ".join(
            "(" + ", ".join(f"({_coords_txt(r)})" for r in rings) + ")"
            for rings in geom.polys
        )
        return f"MULTIPOLYGON ({polys})"
    raise ValueError(f"wkt: unsupported type {t}")


_NUM = r"[-+0-9.eE]+"


def _parse_coords(txt: str) -> np.ndarray:
    pairs = re.findall(rf"({_NUM})\s+({_NUM})", txt)
    return np.array([[float(a), float(b)] for a, b in pairs], dtype=np.float64)


def _split_groups(body: str) -> list[str]:
    """Split a parenthesized list body on top-level commas."""
    out, depth, cur = [], 0, []
    for ch in body:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == "," and depth == 0:
            out.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    if cur:
        out.append("".join(cur))
    return out


def from_wkt(text: str) -> Geometry:
    text = text.strip()
    m = re.match(r"^(\w+)\s*\((.*)\)$", text, re.S)
    if not m:
        raise ValueError(f"wkt: cannot parse {text[:40]!r}")
    kind = m.group(1).upper()
    body = m.group(2)
    if kind == "POINT":
        return Geometry(WKB_POINT, parts=[_parse_coords(body)])
    if kind == "LINESTRING":
        return Geometry(WKB_LINESTRING, parts=[_parse_coords(body)])
    if kind == "POLYGON":
        rings = [_parse_coords(g) for g in _split_groups(body)]
        return Geometry(WKB_POLYGON, parts=rings)
    if kind == "MULTIPOINT":
        return Geometry(WKB_MULTIPOINT, parts=[_parse_coords(body)])
    if kind == "MULTILINESTRING":
        return Geometry(
            WKB_MULTILINESTRING, parts=[_parse_coords(g) for g in _split_groups(body)]
        )
    if kind == "MULTIPOLYGON":
        polys = []
        for g in _split_groups(body):
            inner = g.strip()
            inner = inner[1:-1] if inner.startswith("(") else inner
            polys.append([_parse_coords(r) for r in _split_groups(inner)])
        return Geometry(WKB_MULTIPOLYGON, polys=polys)
    raise ValueError(f"wkt: unsupported kind {kind}")
