"""Constructive geometry ops the reference gets from GEOS:

- concave_hull: OGRGeometry::ConcaveHull(ratio, allowHoles)
  (ogr/ogrgeometry.cpp:4305 -> GEOSConcaveHull, GEOS >= 3.11).
  GEOS-style (HullTriangulation) erosion: Delaunay-triangulate the
  vertices, then erode border triangles longest-border-edge-first
  while the border edge exceeds the length threshold `shortest +
  ratio * (longest - shortest)` (the concaveHullByLengthRatio rule)
  and removal keeps the region simply connected. This variant is
  slightly conservative: a triangle whose opposite vertex already
  sits on the border (incl. two-border-edge ears) is never eaten, so
  the hull can retain a little more area than GEOS at low ratios —
  it is always a superset of the sites and a subset of the convex
  hull. ratio=1 -> convex hull; ratio=0 -> maximal erosion.
- normalize_polys / normalize_line: OGRGeometry::Normalize
  (ogr/ogrgeometry.cpp:4106 -> GEOSNormalize, i.e. the JTS canonical
  form): each ring rotated to start at its lexicographically minimum
  vertex; SHELLS CLOCKWISE, HOLES COUNTER-CLOCKWISE; holes sorted;
  a LineString is reversed if its reverse is lexicographically
  smaller.
- simplify_preserve_topology: OGRGeometry::SimplifyPreserveTopology
  (ogr/ogrgeometry.cpp:6440 -> GEOSTopologyPreserveSimplify, the JTS
  TopologyPreservingSimplifier guarantee subset we re-derive):
  Douglas-Peucker per ring, but a component is never collapsed below
  a valid ring and never made self-crossing — when DP at the given
  tolerance would do either, the tolerance is halved until the
  result is a simple ring (bottoming out at the original ring).
  Cross-component containment shifts (a simplified shell swallowing
  a neighbour) are NOT re-checked — documented divergence; the JTS
  class guards those with its own quadtree of component linework.
"""

from __future__ import annotations

import numpy as np

from gdal_spark.geo.geom import ring_area
from gdal_spark.geo.makevalid import chain_is_simple
from gdal_spark.geo.ops import convex_hull, douglas_peucker

__all__ = [
    "concave_hull",
    "normalize_polys",
    "normalize_line",
    "simplify_preserve_topology",
]


def concave_hull(
    points: np.ndarray, ratio: float, allow_holes: bool = False
) -> np.ndarray:
    """-> closed CCW hull ring. points: (N, 2) distinct sites.
    `allow_holes` is accepted for API parity; the erosion never eats
    interior triangles, so holes cannot appear and the flag is a
    no-op (matching GEOS output for allowHoles=false; callers wanting
    holes get the documented subset)."""
    from gdal_spark.raster.tin import delaunay

    pts = np.asarray(points, dtype=np.float64)
    if len(pts) < 3:
        raise ValueError("concave_hull needs >= 3 points")
    tris = delaunay(pts)
    if len(tris) == 0:
        return convex_hull(pts)
    alive = set(range(len(tris)))
    # edge -> triangle incidences
    edge_tris: dict[tuple[int, int], list[int]] = {}
    for t, (a, b, c) in enumerate(tris):
        for e in ((a, b), (b, c), (c, a)):
            k = (min(e), max(e))
            edge_tris.setdefault(k, []).append(t)

    def elen(e):
        return float(np.hypot(*(pts[e[0]] - pts[e[1]])))

    lens = {e: elen(e) for e in edge_tris}
    lo, hi = min(lens.values()), max(lens.values())
    threshold = lo + max(0.0, min(1.0, ratio)) * (hi - lo)

    def border_edges():
        return {
            e for e, ts in edge_tris.items()
            if sum(1 for t in ts if t in alive) == 1
        }

    border = border_edges()
    border_verts = {v for e in border for v in e}
    import heapq

    heap = [(-lens[e], e) for e in border]
    heapq.heapify(heap)
    while heap:
        neg, e = heapq.heappop(heap)
        if e not in border or -neg <= threshold:
            continue
        ts = [t for t in edge_tris[e] if t in alive]
        if len(ts) != 1:
            continue
        t = ts[0]
        # interior vertex = the triangle vertex not on edge e
        iv = next(v for v in tris[t] if v not in e)
        if iv in border_verts:
            continue  # eating would pinch the region
        alive.discard(t)
        border.discard(e)
        for a, b in ((tris[t][0], tris[t][1]), (tris[t][1], tris[t][2]),
                     (tris[t][2], tris[t][0])):
            k = (min(a, b), max(a, b))
            if k == e:
                continue
            border.add(k)
            heapq.heappush(heap, (-lens[k], k))
        border_verts.add(iv)
    # chain the border edges into the hull ring
    if not alive:
        return convex_hull(pts)
    border = border_edges()
    nbr: dict[int, list[int]] = {}
    for a, b in border:
        nbr.setdefault(a, []).append(b)
        nbr.setdefault(b, []).append(a)
    start = min(nbr)
    ring = [start]
    prev, cur = None, start
    while True:
        nxt = [v for v in nbr[cur] if v != prev]
        if not nxt:
            break
        # at a pinch vertex (degree > 2) take the first unused
        prev, cur = cur, nxt[0]
        if cur == start:
            break
        ring.append(cur)
    out = pts[ring]
    closed = np.vstack([out, out[:1]])
    if ring_area(closed) < 0:
        closed = closed[::-1].copy()
    return closed


def _rotate_ring(ring: np.ndarray) -> np.ndarray:
    """Closed ring -> closed ring starting at the lexicographically
    minimum (x, y) vertex."""
    pts = ring[:-1]
    i = int(np.lexsort((pts[:, 1], pts[:, 0]))[0])
    rolled = np.vstack([pts[i:], pts[:i]])
    return np.vstack([rolled, rolled[:1]])


def _orient(ring: np.ndarray, clockwise: bool) -> np.ndarray:
    cw = ring_area(ring) < 0
    return ring if cw == clockwise else ring[::-1].copy()


def normalize_polys(polys: list[list[np.ndarray]]) -> list[list[np.ndarray]]:
    """JTS canonical form for a (multi)polygon: every ring starts at
    its minimum vertex, shells CW, holes CCW; holes sorted by their
    start vertex; polygons sorted by shell start vertex."""
    out = []
    for rings in polys:
        shell = _rotate_ring(_orient(rings[0], clockwise=True))
        shell = _rotate_ring(shell)  # re-anchor after orientation flip
        holes = [_rotate_ring(_orient(h, clockwise=False)) for h in rings[1:]]
        holes.sort(key=lambda h: (h[0, 0], h[0, 1]))
        out.append([shell] + holes)
    out.sort(key=lambda rs: (rs[0][0, 0], rs[0][0, 1]))
    return out


def normalize_line(coords: np.ndarray) -> np.ndarray:
    """JTS LineString.normalize: reverse when the reversed coordinate
    sequence compares lexicographically smaller."""
    fwd = [tuple(p) for p in coords]
    rev = fwd[::-1]
    return coords[::-1].copy() if rev < fwd else coords


def simplify_preserve_topology(
    rings: list[np.ndarray], tol: float, max_halvings: int = 8
) -> list[np.ndarray]:
    """Per-ring topology-preserving DP simplify (see module doc)."""
    out = []
    for r in rings:
        t = tol
        best = r
        for _ in range(max_halvings + 1):
            s = douglas_peucker(r, t)
            if (
                len(s) >= 4
                and ring_area(s) != 0.0
                and chain_is_simple(s[:-1], closed=True)
            ):
                best = s
                break
            t /= 2.0
        out.append(best)
    return out
