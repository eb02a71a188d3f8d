"""General polygon boolean operations (Greiner-Hormann).

Replaces the convex-only Sutherland-Hodgman kernel for the layer
overlay family: re-derives the pairwise geometry semantics the
reference delegates to GEOS (OGRGeometry::Intersection/Union/
Difference, ogr/ogrgeometry.cpp:4893,5012,5331) for the layer ops in
ogr/ogrsf_frmts/generic/ogrlayer.cpp:3345-5806 — arbitrary (non-
convex) rings with holes, multipolygon inputs and outputs.

Geometry model: a "polyset" is a flat list of closed rings (each an
(N+1, 2) float64 array, first == last) interpreted with EVEN-ODD
semantics — a point is inside iff it is inside an odd number of
rings. Ring orientation on input is irrelevant; outputs are
re-oriented by nesting depth (outer CCW, holes CW) when grouped into
polygons by `rings_to_polygons`.

GENERAL-POSITION CONTRACT (documented limitation): each operand's
rings must be SIMPLE (no self-intersections — not detected), and
ring boundaries of the two operands must cross transversally — no
shared vertices, no vertex-on-edge, no collinear overlapping edges
between the two operands. Cross-operand violations raise
DegenerateGeometry rather than silently producing wrong output. The engine's blob fixture
family guarantees general position by construction (operand A on the
integer lattice, operand B on the half-integer lattice, features of
a layer confined to disjoint cells).

Algorithm (Greiner & Hormann 1998):
1. insert all pairwise edge crossings into both ring vertex chains;
2. mark each crossing entry/exit by even-odd parity walking from an
   original vertex whose inside-ness is point-in-polyset tested;
3. trace result rings, switching chains at each crossing; entry
   flags flipped per op (intersection / union / difference);
4. rings that never cross contribute whole according to containment
   rules per op.
"""

from __future__ import annotations

import numpy as np

from gdal_spark.geo.geom import points_in_ring, ring_area

__all__ = [
    "DegenerateGeometry",
    "boolean_op",
    "polyset_area",
    "rings_to_polygons",
    "point_in_polyset",
]


class DegenerateGeometry(ValueError):
    """Operands violate the general-position contract."""


class _V:
    __slots__ = ("x", "y", "nxt", "prv", "neighbor", "intersect", "entry",
                 "visited")

    def __init__(self, x: float, y: float, intersect: bool = False):
        self.x = x
        self.y = y
        self.nxt = None
        self.prv = None
        self.neighbor = None
        self.intersect = intersect
        self.entry = False
        self.visited = False


def _build_ring(ring: np.ndarray) -> list[_V]:
    """Closed ring array -> list of original vertices (no closing dup)."""
    pts = ring[:-1]
    return [_V(float(x), float(y)) for x, y in pts]


def _link(ring: list[_V]) -> None:
    n = len(ring)
    for i, v in enumerate(ring):
        v.nxt = ring[(i + 1) % n]
        v.prv = ring[(i - 1) % n]


def point_in_polyset(x: float, y: float, rings: list[np.ndarray]) -> bool:
    """Even-odd containment across all rings."""
    px = np.asarray([x])
    py = np.asarray([y])
    inside = False
    for r in rings:
        if points_in_ring(px, py, r)[0]:
            inside = not inside
    return inside


def _edge_intersections(
    a_rings: list[list[_V]], b_rings: list[list[_V]]
) -> int:
    """Find all crossings between original edges of a and b; returns
    count. Inserts crossing vertices into both chains (alpha-sorted)
    and cross-links them."""
    # collect per-edge insertion lists keyed by the origin vertex
    pending_a: dict[int, list] = {}
    pending_b: dict[int, list] = {}
    a_edges = [
        (v, v.nxt) for ring in a_rings for v in ring
    ]
    b_edges = [
        (w, w.nxt) for ring in b_rings for w in ring
    ]
    n_cross = 0
    for v1, v2 in a_edges:
        ax, ay = v1.x, v1.y
        dx1, dy1 = v2.x - ax, v2.y - ay
        for w1, w2 in b_edges:
            bx, by = w1.x, w1.y
            dx2, dy2 = w2.x - bx, w2.y - by
            denom = dx1 * dy2 - dy1 * dx2
            if denom == 0.0:
                # parallel: general position forbids collinear OVERLAP;
                # disjoint parallels are fine. Detect overlap cheaply:
                # cross of (w1 - v1) with d1 == 0 means same line.
                if (bx - ax) * dy1 - (by - ay) * dx1 == 0.0:
                    # same infinite line: overlapping extent is degenerate
                    lo1, hi1 = sorted((0.0, dx1 * dx1 + dy1 * dy1))
                    t1 = (bx - ax) * dx1 + (by - ay) * dy1
                    t2 = (w2.x - ax) * dx1 + (w2.y - ay) * dy1
                    if max(min(t1, t2), lo1) < min(max(t1, t2), hi1):
                        raise DegenerateGeometry(
                            "collinear overlapping edges between operands"
                        )
                continue
            t = ((bx - ax) * dy2 - (by - ay) * dx2) / denom
            u = ((bx - ax) * dy1 - (by - ay) * dx1) / denom
            if t < 0.0 or t > 1.0 or u < 0.0 or u > 1.0:
                continue
            if t == 0.0 or t == 1.0 or u == 0.0 or u == 1.0:
                raise DegenerateGeometry(
                    "vertex-on-edge / shared vertex between operands"
                )
            ix, iy = ax + t * dx1, ay + t * dy1
            va = _V(ix, iy, True)
            vb = _V(ix, iy, True)
            va.neighbor = vb
            vb.neighbor = va
            pending_a.setdefault(id(v1), []).append((t, va))
            pending_b.setdefault(id(w1), []).append((u, vb))
            n_cross += 1
    # splice pending vertices into the chains in alpha order
    for ring in a_rings:
        for v in ring:
            _splice(v, pending_a.get(id(v)))
    for ring in b_rings:
        for w in ring:
            _splice(w, pending_b.get(id(w)))
    return n_cross


def _splice(origin: _V, inserts) -> None:
    if not inserts:
        return
    inserts.sort(key=lambda p: p[0])
    cur = origin
    nxt = origin.nxt
    for _alpha, v in inserts:
        cur.nxt = v
        v.prv = cur
        v.nxt = nxt
        nxt.prv = v
        cur = v


def _mark_entries(
    rings: list[list[_V]], other: list[np.ndarray], flip: bool
) -> None:
    """Walk each ring from its first ORIGINAL vertex, alternating
    entry/exit at crossings; initial inside-ness by point test."""
    for ring in rings:
        start = ring[0]
        inside = point_in_polyset(start.x, start.y, other)
        v = start.nxt
        while True:
            if v.intersect:
                v.entry = (not inside) != flip
                inside = not inside
            if v is start:
                break
            v = v.nxt


def _trace(a_rings: list[list[_V]]) -> list[np.ndarray]:
    out = []
    crossings = []
    for ring in a_rings:
        v = ring[0]
        while True:
            if v.intersect:
                crossings.append(v)
            v = v.nxt
            if v is ring[0]:
                break
    for start in crossings:
        if start.visited:
            continue
        pts = []
        cur = start
        while True:
            cur.visited = True
            cur.neighbor.visited = True
            if cur.entry:
                while True:
                    pts.append((cur.x, cur.y))
                    cur = cur.nxt
                    if cur.intersect:
                        break
            else:
                while True:
                    pts.append((cur.x, cur.y))
                    cur = cur.prv
                    if cur.intersect:
                        break
            cur = cur.neighbor
            if cur is start or cur.neighbor is start:
                break
        if len(pts) >= 3:
            ring = np.asarray(pts, dtype=np.float64)
            out.append(np.vstack([ring, ring[:1]]))
    return out


def boolean_op(
    a: list[np.ndarray], b: list[np.ndarray], op: str
) -> list[np.ndarray]:
    """op in {'inter', 'union', 'diff'} (diff = a minus b).
    Returns the result polyset (even-odd ring list; orientation
    unspecified — use rings_to_polygons / polyset_area)."""
    if op not in ("inter", "union", "diff"):
        raise ValueError(op)
    a = [r for r in a if len(r) >= 4]
    b = [r for r in b if len(r) >= 4]
    if not a:
        return [r.copy() for r in b] if op == "union" else []
    if not b:
        return [] if op == "inter" else [r.copy() for r in a]
    av = [_build_ring(r) for r in a]
    bv = [_build_ring(r) for r in b]
    for ring in av:
        _link(ring)
    for ring in bv:
        _link(ring)
    n_cross = _edge_intersections(av, bv)

    # entry-flag convention: no flips -> intersection; flip both ->
    # union; a minus b = a intersect complement(b), and complementing
    # b flips the SUBJECT chain's inside-ness parity -> flip a.
    flip_a = op in ("union", "diff")
    flip_b = op == "union"
    _mark_entries(av, b, flip_a)
    _mark_entries(bv, a, flip_b)

    result = _trace(av) if n_cross else []

    # rings that never cross contribute whole per containment rules
    for src_rings, src_np, other_np in (
        (av, a, b),
        (bv, b, a),
    ):
        for ring_v, ring_np in zip(src_rings, src_np):
            if any(v.intersect for v in _iter_ring(ring_v)):
                continue
            inside = point_in_polyset(ring_v[0].x, ring_v[0].y, other_np)
            if src_np is b and op == "diff":
                keep = inside  # b-rings inside a become holes
            elif src_np is b and op == "inter":
                keep = inside
            elif src_np is b and op == "union":
                keep = not inside
            elif op == "inter":
                keep = inside
            else:  # a-rings for union / diff
                keep = not inside
            if keep:
                result.append(ring_np.copy())
    return result


def _iter_ring(ring: list[_V]):
    v = ring[0]
    while True:
        yield v
        v = v.nxt
        if v is ring[0]:
            break


def _ring_contains(outer: np.ndarray, pt: tuple[float, float]) -> bool:
    return bool(
        points_in_ring(np.asarray([pt[0]]), np.asarray([pt[1]]), outer)[0]
    )


def rings_to_polygons(rings: list[np.ndarray]) -> list[list[np.ndarray]]:
    """Group an even-odd ring set into polygons-with-holes: nesting
    depth parity decides outer (even) vs hole (odd); holes attach to
    their immediate parent. Orientation normalized: outer CCW, holes
    CW. Component count is metadata-sized, so the O(n^2) nesting scan
    is fine (n = rings of ONE feature's result)."""
    if not rings:
        return []
    info = []
    for r in rings:
        info.append({"ring": r, "area": abs(ring_area(r)), "pt": (r[0, 0], r[0, 1])})
    # depth = number of other rings strictly containing a sample point
    for i, it in enumerate(info):
        depth = 0
        parent = None
        parent_area = None
        for j, other in enumerate(info):
            if i == j:
                continue
            if other["area"] > it["area"] and _ring_contains(other["ring"], it["pt"]):
                depth += 1
                if parent_area is None or other["area"] < parent_area:
                    parent = j
                    parent_area = other["area"]
        it["depth"] = depth
        it["parent"] = parent
    polys: dict[int, list[np.ndarray]] = {}
    order = sorted(range(len(info)), key=lambda i: info[i]["depth"])
    for i in order:
        it = info[i]
        r = it["ring"]
        ccw = ring_area(r) > 0
        if it["depth"] % 2 == 0:
            polys[i] = [r if ccw else r[::-1].copy()]
        else:
            target = polys.get(it["parent"])
            if target is None:  # parent was itself a hole: new outer
                polys[i] = [r if ccw else r[::-1].copy()]
            else:
                target.append(r[::-1].copy() if ccw else r)
    return [polys[i] for i in sorted(polys)]


def polyset_area(rings: list[np.ndarray]) -> float:
    """Even-odd area of a ring set (sum over polygons of outer minus
    holes), independent of input ring orientation."""
    total = 0.0
    for poly in rings_to_polygons(rings):
        total += abs(ring_area(poly[0]))
        for hole in poly[1:]:
            total -= abs(ring_area(hole))
    return total
