"""Constructive / measure geometry operations (pure numpy, GEOS-free).

OGR semantics re-derived (ogr/ogrgeometry.cpp, ogr/ogrsurface.cpp,
ogr/ogrcurve.cpp), planar 2-D:

- get_Area: shoelace, holes subtracted        (ogrsurface.cpp:18)
- get_Length: ring/line perimeter             (ogrcurve.cpp:91-ish)
- Centroid: area-weighted                      (ogrgeometry.cpp:6106)
- segmentize(max_len): insert evenly spaced vertices so no segment
  exceeds max_len; original vertices preserved (ogrgeometry.cpp:890 /
  ogrlinestring segmentize: n_extra = ceil(len/max)-1, equal split)
- Simplify: Douglas-Peucker distance tolerance (ogrgeometry.cpp:6360
  delegates to GEOS DP)
- ConvexHull: Andrew monotone chain            (ogrgeometry.cpp:4186)
- Buffer: round-join offset approximated by sampling circles along
  the boundary + hull/union; v1 supports positive buffers of convex
  polygons via vertex-arc expansion (ogrgeometry.cpp:4526)
- IsValid (subset): ring closure, >= 4 points, no self-intersection
  for single rings                              (ogrgeometry.cpp:2297)
"""

from __future__ import annotations

import math

import numpy as np

from gdal_spark.geo.geom import ring_area, segments_intersect


def line_length(coords: np.ndarray) -> float:
    d = np.diff(coords, axis=0)
    return float(np.hypot(d[:, 0], d[:, 1]).sum())


def polygon_perimeter(rings: list[np.ndarray]) -> float:
    """Sum of all ring lengths (OGR get_Length on a polygon sums
    exterior + interior ring perimeters)."""
    return float(sum(line_length(r) for r in rings))


def segmentize(coords: np.ndarray, max_len: float) -> np.ndarray:
    """Insert vertices so no segment exceeds max_len; each segment is
    split into ceil(len/max_len) equal parts (reference rule)."""
    out = [coords[:1]]
    for (x0, y0), (x1, y1) in zip(coords[:-1], coords[1:]):
        seg = math.hypot(x1 - x0, y1 - y0)
        n = max(1, math.ceil(seg / max_len - 1e-12))
        ts = np.linspace(0.0, 1.0, n + 1)[1:]
        out.append(np.column_stack([x0 + ts * (x1 - x0), y0 + ts * (y1 - y0)]))
    return np.vstack(out)


def douglas_peucker(coords: np.ndarray, tol: float) -> np.ndarray:
    """Classic DP simplification (keeps endpoints)."""
    if len(coords) <= 2:
        return coords
    keep = np.zeros(len(coords), dtype=bool)
    keep[0] = keep[-1] = True
    stack = [(0, len(coords) - 1)]
    while stack:
        i0, i1 = stack.pop()
        if i1 <= i0 + 1:
            continue
        p0, p1 = coords[i0], coords[i1]
        seg = p1 - p0
        L2 = float(seg @ seg)
        pts = coords[i0 + 1 : i1]
        if L2 == 0.0:
            d = np.hypot(*(pts - p0).T)
        else:
            t = np.clip(((pts - p0) @ seg) / L2, 0.0, 1.0)
            proj = p0 + t[:, None] * seg
            d = np.hypot(*(pts - proj).T)
        imax = int(np.argmax(d))
        if d[imax] > tol:
            idx = i0 + 1 + imax
            keep[idx] = True
            stack.append((i0, idx))
            stack.append((idx, i1))
    return coords[keep]


def convex_hull(points: np.ndarray) -> np.ndarray:
    """Andrew monotone chain; returns closed CCW ring."""
    pts = np.unique(points, axis=0)
    if len(pts) <= 2:
        return np.vstack([pts, pts[:1]])
    pts = pts[np.lexsort((pts[:, 1], pts[:, 0]))]

    def half(seq):
        chain: list[np.ndarray] = []
        for p in seq:
            while len(chain) >= 2 and np.cross(
                chain[-1] - chain[-2], p - chain[-2]
            ) <= 0:
                chain.pop()
            chain.append(p)
        return chain

    lower = half(pts)
    upper = half(pts[::-1])
    ring = np.array(lower[:-1] + upper[:-1])
    return np.vstack([ring, ring[:1]])


def buffer_convex(ring: np.ndarray, dist: float, quad_segs: int = 8) -> np.ndarray:
    """Positive round buffer of a convex CCW ring: offset each vertex
    by arcs, take the convex hull (exact for convex inputs up to arc
    discretization — GDAL's Buffer quadrant-segments contract)."""
    pts = []
    n_arc = max(4, 4 * quad_segs)
    ang = np.linspace(0.0, 2.0 * np.pi, n_arc, endpoint=False)
    circ = np.column_stack([np.cos(ang), np.sin(ang)]) * dist
    for v in ring[:-1]:
        pts.append(v + circ)
    return convex_hull(np.vstack(pts))


def is_valid_ring(ring: np.ndarray) -> bool:
    """Subset of OGR IsValid for a single ring: closed, >= 4 points,
    no self-intersection between non-adjacent segments."""
    if len(ring) < 4 or not np.array_equal(ring[0], ring[-1]):
        return False
    n = len(ring) - 1
    for i in range(n):
        for j in range(i + 2, n):
            if i == 0 and j == n - 1:
                continue
            if segments_intersect(ring[i], ring[i + 1], ring[j], ring[j + 1]):
                return False
    return True


MEAN_EARTH_RADIUS = 6371008.8  # IUGG mean radius


def geodesic_ring_area(ring: np.ndarray, radius: float = MEAN_EARTH_RADIUS) -> float:
    """SPHERICAL polygon area (m^2) by the Chamberlain–Duquette
    formula — SUPERSEDED as the ST_GeodesicArea backend by the
    ellipsoidal WGS84 solver in geo/geodesic.py (which matches the
    reference's PROJ semantics, ogr/ogrsurface.cpp:39); kept as the
    explicit spherical-model helper:
        area = |Σ (λ2-λ1)·(2 + sin φ1 + sin φ2)| · R² / 2
    over edges in radians."""
    lon = np.radians(ring[:, 0])
    lat = np.radians(ring[:, 1])
    s = np.sum((lon[1:] - lon[:-1]) * (2.0 + np.sin(lat[:-1]) + np.sin(lat[1:])))
    return abs(s) * radius * radius / 2.0


def geodesic_line_length(coords: np.ndarray, radius: float = MEAN_EARTH_RADIUS) -> float:
    """Great-circle length (m) via haversine edge sums — SUPERSEDED
    as the ST_GeodesicLength backend by geo/geodesic.py (ellipsoidal,
    get_GeodesicLength semantics, ogrcurve.cpp:111); kept as the
    explicit spherical-model helper."""
    lon = np.radians(coords[:, 0])
    lat = np.radians(coords[:, 1])
    dlat = lat[1:] - lat[:-1]
    dlon = lon[1:] - lon[:-1]
    a = (
        np.sin(dlat / 2.0) ** 2
        + np.cos(lat[:-1]) * np.cos(lat[1:]) * np.sin(dlon / 2.0) ** 2
    )
    return float((2.0 * radius * np.arcsin(np.sqrt(a))).sum())


def point_on_surface(rings: list[np.ndarray]) -> tuple[float, float]:
    """A point guaranteed inside: scanline through the centroid-y,
    midpoint of the widest run (PointOnSurface contract: inside, not
    necessarily centroid)."""
    from gdal_spark.geo.geom import points_in_polygon

    ys = rings[0][:, 1]
    y = float(ys.min() + ys.max()) / 2.0
    xs_all = []
    for ring in rings:
        x1, y1 = ring[:-1, 0], ring[:-1, 1]
        x2, y2 = ring[1:, 0], ring[1:, 1]
        sel = (y1 > y) != (y2 > y)
        if sel.any():
            xs_all.extend(x1[sel] + (y - y1[sel]) * (x2[sel] - x1[sel]) / (y2[sel] - y1[sel]))
    xs_all.sort()
    best = None
    for a, b in zip(xs_all[0::2], xs_all[1::2]):
        if best is None or (b - a) > best[1]:
            best = ((a + b) / 2.0, b - a)
    if best is None:
        c = rings[0][:-1].mean(axis=0)
        return float(c[0]), float(c[1])
    return float(best[0]), y
