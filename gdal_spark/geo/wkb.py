"""Minimal WKB geometry codec (pure struct/numpy — no GEOS/shapely).

The canonical vector schema follows the reference's own Arrow export:
geometry as a WKB binary column (ogr/ogrsf_frmts/generic/
ogrlayerarrow.cpp:377-511, extension name ogc.wkb). Supported types:
Point (1), LineString (2), Polygon (3), MultiPoint (4),
MultiLineString (5), MultiPolygon (6) — 2D, either byte order on
read, little-endian on write.
"""

from __future__ import annotations

import struct

import numpy as np

WKB_POINT = 1
WKB_LINESTRING = 2
WKB_POLYGON = 3
WKB_MULTIPOINT = 4
WKB_MULTILINESTRING = 5
WKB_MULTIPOLYGON = 6

_TYPE_NAMES = {
    1: "Point", 2: "LineString", 3: "Polygon",
    4: "MultiPoint", 5: "MultiLineString", 6: "MultiPolygon",
}


def wkb_point(x: float, y: float) -> bytes:
    return struct.pack("<BIdd", 1, WKB_POINT, x, y)


def wkb_linestring(coords: np.ndarray) -> bytes:
    coords = np.asarray(coords, dtype="<f8")
    return struct.pack("<BII", 1, WKB_LINESTRING, len(coords)) + coords.tobytes()


def wkb_polygon(rings: list[np.ndarray]) -> bytes:
    """rings[0] = exterior (CCW by convention), rest = holes. Each ring
    must be explicitly closed (first point == last point); if not, it
    is closed automatically."""
    out = [struct.pack("<BII", 1, WKB_POLYGON, len(rings))]
    for ring in rings:
        ring = np.asarray(ring, dtype="<f8")
        if not np.array_equal(ring[0], ring[-1]):
            ring = np.vstack([ring, ring[:1]])
        out.append(struct.pack("<I", len(ring)))
        out.append(ring.tobytes())
    return b"".join(out)


def wkb_multipolygon(polys: list[list[np.ndarray]]) -> bytes:
    out = [struct.pack("<BII", 1, WKB_MULTIPOLYGON, len(polys))]
    for rings in polys:
        out.append(wkb_polygon(rings))
    return b"".join(out)


class Geometry:
    """Parsed geometry: type id + list of coordinate arrays.

    - Point/MultiPoint: parts = [(n,2) array]
    - LineString/MultiLineString: parts = one (n,2) array per line
    - Polygon: rings = [exterior, holes...]; MultiPolygon: polys =
      list of ring lists.
    """

    __slots__ = ("type_id", "parts", "polys")

    def __init__(self, type_id: int, parts=None, polys=None):
        self.type_id = type_id
        self.parts = parts or []
        self.polys = polys or []

    @property
    def type_name(self) -> str:
        return _TYPE_NAMES.get(self.type_id, f"Unknown({self.type_id})")

    def bounds(self) -> tuple[float, float, float, float]:
        arrs = self.parts or [r for rings in self.polys for r in rings[:1]]
        if self.polys:
            arrs = [rings[0] for rings in self.polys]
        allc = np.vstack(arrs)
        return (
            float(allc[:, 0].min()), float(allc[:, 1].min()),
            float(allc[:, 0].max()), float(allc[:, 1].max()),
        )

    def all_rings(self):
        if self.type_id == WKB_POLYGON:
            return [self.parts]
        if self.type_id == WKB_MULTIPOLYGON:
            return self.polys
        return []


def _read_coords(buf: bytes, off: int, n: int, bo: str) -> tuple[np.ndarray, int]:
    arr = np.frombuffer(buf, dtype=f"{bo}f8", count=2 * n, offset=off).reshape(n, 2)
    return arr.astype(np.float64), off + 16 * n


def _parse_one(buf: bytes, off: int) -> tuple[Geometry, int]:
    bo = "<" if buf[off] == 1 else ">"
    (tid,) = struct.unpack_from(f"{bo}I", buf, off + 1)
    tid = tid & 0xFF  # strip Z/M/SRID flags (2D payloads only)
    off += 5
    if tid == WKB_POINT:
        coords, off = _read_coords(buf, off, 1, bo)
        return Geometry(tid, parts=[coords]), off
    if tid in (WKB_LINESTRING, WKB_MULTIPOINT):
        (n,) = struct.unpack_from(f"{bo}I", buf, off)
        off += 4
        if tid == WKB_MULTIPOINT:
            pts = []
            for _ in range(n):
                g, off = _parse_one(buf, off)
                pts.append(g.parts[0])
            return Geometry(tid, parts=[np.vstack(pts)] if pts else []), off
        coords, off = _read_coords(buf, off, n, bo)
        return Geometry(tid, parts=[coords]), off
    if tid == WKB_POLYGON:
        (nrings,) = struct.unpack_from(f"{bo}I", buf, off)
        off += 4
        rings = []
        for _ in range(nrings):
            (npts,) = struct.unpack_from(f"{bo}I", buf, off)
            off += 4
            ring, off = _read_coords(buf, off, npts, bo)
            rings.append(ring)
        return Geometry(tid, parts=rings), off
    if tid in (WKB_MULTILINESTRING, WKB_MULTIPOLYGON):
        (n,) = struct.unpack_from(f"{bo}I", buf, off)
        off += 4
        if tid == WKB_MULTIPOLYGON:
            polys = []
            for _ in range(n):
                g, off = _parse_one(buf, off)
                polys.append(g.parts)
            return Geometry(tid, polys=polys), off
        lines = []
        for _ in range(n):
            g, off = _parse_one(buf, off)
            lines.append(g.parts[0])
        return Geometry(tid, parts=lines), off
    raise ValueError(f"wkb: unsupported geometry type {tid}")


def parse_wkb(buf: bytes) -> Geometry:
    g, _ = _parse_one(bytes(buf), 0)
    return g


def geometry_to_wkb(geom: Geometry) -> bytes:
    t = geom.type_id
    if t == WKB_POINT:
        x, y = geom.parts[0][0]
        return wkb_point(float(x), float(y))
    if t == WKB_LINESTRING:
        return wkb_linestring(geom.parts[0])
    if t == WKB_POLYGON:
        return wkb_polygon(geom.parts)
    if t == WKB_MULTIPOLYGON:
        return wkb_multipolygon(geom.polys)
    if t == WKB_MULTIPOINT:
        pts = geom.parts[0]
        out = [struct.pack("<BII", 1, WKB_MULTIPOINT, len(pts))]
        for x, y in pts:
            out.append(wkb_point(float(x), float(y)))
        return b"".join(out)
    if t == WKB_MULTILINESTRING:
        out = [struct.pack("<BII", 1, WKB_MULTILINESTRING, len(geom.parts))]
        for line in geom.parts:
            out.append(wkb_linestring(line))
        return b"".join(out)
    raise ValueError(f"wkb: unsupported type {t}")
