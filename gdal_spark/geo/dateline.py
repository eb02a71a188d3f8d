"""Antimeridian (dateline) wrapping — the `-wrapdateline` option of
ogr2ogr (apps/ogr2ogr_lib.cpp:8116; semantics from
OGRGeometryFactory::transformWithOptions WRAPDATELINE=YES,
ogr/ogrgeometryfactory.cpp).

A geometry whose consecutive vertices jump more than 180 degrees of
longitude is first UNWRAPPED (cumulative +-360 so the coordinate
walk is continuous), then cut at every boundary 180 + 360k it spans,
and each piece is normalized back into [-180, 180].  Cut points are
the exact linear interpolation y0 + (b - x0)/(x1 - x0) * (y1 - y0) —
kept in this operand order so SQL twins reproduce them bit-for-bit.

Lines split into MultiLineString; polygons are clipped per 360-degree
strip (Sutherland-Hodgman against the two vertical strip edges) and
recombine into a MultiPolygon.  Points just normalize.
"""

from __future__ import annotations

import numpy as np

from gdal_spark.geo.wkb import (
    Geometry,
    WKB_LINESTRING,
    WKB_MULTILINESTRING,
    WKB_MULTIPOLYGON,
    WKB_POINT,
    WKB_POLYGON,
    parse_wkb,
    wkb_linestring,
    wkb_multipolygon,
    wkb_point,
    wkb_polygon,
)

__all__ = ["unwrap_lons", "split_line_at_dateline", "wrap_dateline_wkb"]


def unwrap_lons(coords: np.ndarray) -> np.ndarray:
    """(N,2) -> (N,2) with longitudes made continuous: any step of
    more than 180 deg pulls the rest of the walk by +-360."""
    out = coords.astype(np.float64).copy()
    adj = 0.0
    for i in range(1, len(out)):
        d = coords[i, 0] + adj - out[i - 1, 0]
        if d > 180.0:
            adj -= 360.0
        elif d < -180.0:
            adj += 360.0
        out[i, 0] = coords[i, 0] + adj
    return out


def _strip_index(x: float) -> int:
    """Index k of the strip (-180+360k, 180+360k] containing x."""
    return int(np.floor((x + 180.0) / 360.0 - 1e-12))


def split_line_at_dateline(coords: np.ndarray) -> list[np.ndarray]:
    """Unwrapped polyline -> pieces cut at each 180+360k boundary,
    each normalized into [-180, 180]."""
    u = unwrap_lons(coords)
    pieces: list[list] = []
    cur = [u[0]]
    for i in range(1, len(u)):
        x0, y0 = cur[-1]
        x1, y1 = u[i]
        k0, k1 = _strip_index(x0), _strip_index(x1)
        step = 1 if k1 > k0 else -1
        for k in range(k0, k1, step):
            b = 180.0 + 360.0 * (k if step > 0 else k - 1)
            if b == x0:
                continue
            yi = y0 + (b - x0) / (x1 - x0) * (y1 - y0)
            cur.append((b, yi))
            pieces.append(cur)
            cur = [(b, yi)]
        cur.append((x1, y1))
    pieces.append(cur)
    out = []
    for p in pieces:
        arr = np.asarray(p, dtype=np.float64)
        if len(arr) < 2:
            continue
        # classify by the piece's MAX longitude: boundary points sit at
        # exactly 180+360k and belong to the strip below (inclusive),
        # so the max identifies the strip even for pieces whose both
        # endpoints are cut points
        k = _strip_index(float(arr[:, 0].max()))
        arr[:, 0] -= 360.0 * k
        out.append(arr)
    return out


def _clip_ring_strip(ring: np.ndarray, lo: float, hi: float) -> np.ndarray:
    """Sutherland-Hodgman clip of a closed ring to the vertical strip
    lo <= x <= hi (exact interpolation, same operand order)."""
    def clip(pts, boundary, keep_left):
        out = []
        n = len(pts)
        for i in range(n):
            x0, y0 = pts[i]
            x1, y1 = pts[(i + 1) % n]
            in0 = (x0 <= boundary) if keep_left else (x0 >= boundary)
            in1 = (x1 <= boundary) if keep_left else (x1 >= boundary)
            if in0:
                out.append((x0, y0))
            if in0 != in1:
                yi = y0 + (boundary - x0) / (x1 - x0) * (y1 - y0)
                out.append((boundary, yi))
        return out

    pts = [tuple(p) for p in ring[:-1]] if np.array_equal(
        ring[0], ring[-1]
    ) else [tuple(p) for p in ring]
    pts = clip(pts, hi, True)
    if pts:
        pts = clip(pts, lo, False)
    if len(pts) < 3:
        return np.empty((0, 2))
    pts.append(pts[0])
    return np.asarray(pts, dtype=np.float64)


def wrap_dateline_wkb(buf: bytes) -> bytes:
    """WKB -> WKB with WRAPDATELINE=YES semantics."""
    g = parse_wkb(bytes(buf))
    if g.type_id == WKB_POINT:
        x, y = g.parts[0][0]
        while x > 180.0:
            x -= 360.0
        while x < -180.0:
            x += 360.0
        return wkb_point(float(x), float(y))
    if g.type_id in (WKB_LINESTRING, WKB_MULTILINESTRING):
        lines = g.parts if g.type_id == WKB_MULTILINESTRING else [
            g.parts[0]
        ]
        pieces = []
        for line in lines:
            pieces.extend(split_line_at_dateline(line))
        if len(pieces) == 1:
            return wkb_linestring(pieces[0])
        import struct as _s

        body = b"".join(wkb_linestring(p) for p in pieces)
        return (
            b"\x01" + _s.pack("<I", WKB_MULTILINESTRING)
            + _s.pack("<I", len(pieces)) + body
        )
    if g.type_id in (WKB_POLYGON, WKB_MULTIPOLYGON):
        polys = g.polys if g.type_id == WKB_MULTIPOLYGON else [g.parts]
        out_polys = []
        for rings in polys:
            shell = unwrap_lons(rings[0])
            kmin = _strip_index(float(shell[:, 0].min()))
            kmax = _strip_index(float(shell[:, 0].max() - 1e-12))
            for k in range(kmin, kmax + 1):
                lo, hi = -180.0 + 360.0 * k, 180.0 + 360.0 * k
                new_rings = []
                for ri, ring in enumerate(rings):
                    u = unwrap_lons(ring) if ri else shell
                    c = _clip_ring_strip(u, lo, hi)
                    if len(c):
                        c = c.copy()
                        c[:, 0] -= 360.0 * k
                        new_rings.append(c)
                if new_rings:
                    out_polys.append(new_rings)
        if len(out_polys) == 1:
            return wkb_polygon(out_polys[0])
        return wkb_multipolygon(out_polys)
    raise ValueError(
        f"wrapdateline: unsupported geometry type {g.type_id}"
    )
