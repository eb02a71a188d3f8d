"""Pairwise geometry predicates + distance (the ST_ relate family).

Re-derives the reference's GEOS-backed pairwise predicates
(ogr/ogrgeometry.cpp: Intersects :579, Disjoint :5588, Touches
:5661, Crosses :5734, Within :5842, Contains :5915, Overlaps :5989,
Distance :3562) for the geometry types the engine carries: points
and (multi)polygons with holes, even-odd semantics.

Classification (areal x areal), robust for exact-coordinate
families (integers / dyadic rationals, where orientation tests are
exact in double):

1. any PROPER edge crossing  -> interiors overlap transversally:
   intersects, overlaps (neither containment possible), not touches;
2. otherwise boundary CONTACT (vertex-on-edge / shared vertex /
   collinear overlap, detected by the improper branch of the
   orientation classifier) with interior tests deciding touches vs
   containment;
3. interior tests use a polygon interior point (guaranteed interior
   sample) against the other polygon's even-odd membership.

point x areal uses even-odd membership with explicit
boundary detection (a point ON the boundary is not within, but does
intersect/touch — matching GEOS).

Distance: min over vertex-to-segment squared distances across the
two boundaries, 0 when intersecting; exact for dyadic coordinates
(projections clamp to rational points).
"""

from __future__ import annotations

import numpy as np

from gdal_spark.geo.geom import points_in_polygon, ring_area

__all__ = [
    "proper_crossing",
    "boundary_contact",
    "point_on_boundary",
    "interior_point",
    "polygon_relate",
    "polygon_distance2",
    "point_polygon_distance2",
    "line_line_relate",
    "line_polygon_relate",
]


def _edges(rings: list[np.ndarray]) -> tuple[np.ndarray, np.ndarray]:
    a = np.concatenate([r[:-1] for r in rings], axis=0)
    b = np.concatenate([r[1:] for r in rings], axis=0)
    return a, b


def _cross_sign(ax, ay, bx, by, cx, cy) -> np.ndarray:
    v = (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)
    return np.sign(v)


def proper_crossing(a_rings: list[np.ndarray], b_rings: list[np.ndarray]) -> bool:
    """True iff some A edge and B edge cross at a single interior
    point of both (transversal crossing)."""
    (a1, a2), (b1, b2) = _edges(a_rings), _edges(b_rings)
    # vectorize A edges x B edges
    a1x, a1y = a1[:, 0][:, None], a1[:, 1][:, None]
    a2x, a2y = a2[:, 0][:, None], a2[:, 1][:, None]
    b1x, b1y = b1[:, 0][None, :], b1[:, 1][None, :]
    b2x, b2y = b2[:, 0][None, :], b2[:, 1][None, :]
    o1 = _cross_sign(a1x, a1y, a2x, a2y, b1x, b1y)
    o2 = _cross_sign(a1x, a1y, a2x, a2y, b2x, b2y)
    o3 = _cross_sign(b1x, b1y, b2x, b2y, a1x, a1y)
    o4 = _cross_sign(b1x, b1y, b2x, b2y, a2x, a2y)
    strict = (o1 * o2 < 0) & (o3 * o4 < 0)
    return bool(strict.any())


def boundary_contact(a_rings: list[np.ndarray], b_rings: list[np.ndarray]) -> bool:
    """True iff the boundaries touch WITHOUT a proper crossing being
    required: vertex-on-edge, shared vertex, or collinear overlap."""
    (a1, a2), (b1, b2) = _edges(a_rings), _edges(b_rings)
    a1x, a1y = a1[:, 0][:, None], a1[:, 1][:, None]
    a2x, a2y = a2[:, 0][:, None], a2[:, 1][:, None]
    b1x, b1y = b1[:, 0][None, :], b1[:, 1][None, :]
    b2x, b2y = b2[:, 0][None, :], b2[:, 1][None, :]
    o1 = _cross_sign(a1x, a1y, a2x, a2y, b1x, b1y)
    o2 = _cross_sign(a1x, a1y, a2x, a2y, b2x, b2y)
    o3 = _cross_sign(b1x, b1y, b2x, b2y, a1x, a1y)
    o4 = _cross_sign(b1x, b1y, b2x, b2y, a2x, a2y)

    def on_seg(px, py, qx, qy, rx, ry):
        return (
            (np.minimum(px, qx) <= rx) & (rx <= np.maximum(px, qx))
            & (np.minimum(py, qy) <= ry) & (ry <= np.maximum(py, qy))
        )

    touch = (
        ((o1 == 0) & on_seg(a1x, a1y, a2x, a2y, b1x, b1y))
        | ((o2 == 0) & on_seg(a1x, a1y, a2x, a2y, b2x, b2y))
        | ((o3 == 0) & on_seg(b1x, b1y, b2x, b2y, a1x, a1y))
        | ((o4 == 0) & on_seg(b1x, b1y, b2x, b2y, a2x, a2y))
    )
    return bool(touch.any())


def point_on_boundary(x: float, y: float, rings: list[np.ndarray]) -> bool:
    a, b = _edges(rings)
    o = _cross_sign(a[:, 0], a[:, 1], b[:, 0], b[:, 1], x, y)
    on = (
        (o == 0)
        & (np.minimum(a[:, 0], b[:, 0]) <= x) & (x <= np.maximum(a[:, 0], b[:, 0]))
        & (np.minimum(a[:, 1], b[:, 1]) <= y) & (y <= np.maximum(a[:, 1], b[:, 1]))
    )
    return bool(on.any())


def interior_point(rings: list[np.ndarray]) -> tuple[float, float]:
    """A point strictly interior to the even-odd polygon: scan a
    horizontal line through the outer ring's vertical midspan and
    take the midpoint of the first inside interval (the
    point-on-surface construction, ogrgeometry.cpp:6311)."""
    outer = max(rings, key=lambda r: abs(ring_area(r)))
    ys = outer[:-1, 1]
    # pick a scan height between two distinct vertex heights (never
    # exactly at a vertex -> no degenerate crossings on the scanline)
    uniq = np.unique(ys)
    if len(uniq) == 1:
        raise ValueError("degenerate ring")
    yscan = None
    mid = 0.5 * (uniq.min() + uniq.max())
    lo = uniq[uniq <= mid].max()
    hi = uniq[uniq > mid].min() if (uniq > mid).any() else uniq.max()
    yscan = 0.5 * (lo + hi)
    if yscan in uniq:
        yscan = lo + (hi - lo) * 0.49609375  # dyadic, off-vertex
    xs = []
    for r in rings:
        x1, y1 = r[:-1, 0], r[:-1, 1]
        x2, y2 = r[1:, 0], r[1:, 1]
        sel = (y1 > yscan) != (y2 > yscan)
        if sel.any():
            xs.append(x1[sel] + (yscan - y1[sel]) * (x2[sel] - x1[sel]) / (y2[sel] - y1[sel]))
    allx = np.sort(np.concatenate(xs))
    return float(0.5 * (allx[0] + allx[1])), float(yscan)


def polygon_relate(
    a_rings: list[np.ndarray], b_rings: list[np.ndarray]
) -> dict[str, bool]:
    """-> {intersects, disjoint, within, contains, overlaps, touches,
    equals} for two even-odd areal geometries."""
    # cheap bbox reject (the FilterGeometry ladder's first rung)
    ab = np.concatenate([r for r in a_rings])
    bb = np.concatenate([r for r in b_rings])
    if (
        ab[:, 0].max() < bb[:, 0].min() or ab[:, 0].min() > bb[:, 0].max()
        or ab[:, 1].max() < bb[:, 1].min() or ab[:, 1].min() > bb[:, 1].max()
    ):
        return {
            "intersects": False, "disjoint": True, "within": False,
            "contains": False, "overlaps": False, "touches": False,
            "equals": False,
        }
    equals = _rings_equal(a_rings, b_rings)
    if equals:
        return {
            "intersects": True, "disjoint": False, "within": True,
            "contains": True, "overlaps": False, "touches": False,
            "equals": True,
        }
    crossing = proper_crossing(a_rings, b_rings)
    contact = crossing or boundary_contact(a_rings, b_rings)
    ia = interior_point(a_rings)
    ib = interior_point(b_rings)
    a_in_b = bool(points_in_polygon([ia[0]], [ia[1]], b_rings)[0])
    b_in_a = bool(points_in_polygon([ib[0]], [ib[1]], a_rings)[0])
    if crossing:
        return {
            "intersects": True, "disjoint": False, "within": False,
            "contains": False, "overlaps": True, "touches": False,
            "equals": False,
        }
    # no proper crossing: containment / touch / disjoint
    within = a_in_b
    contains = b_in_a
    intersects = contact or within or contains
    touches = contact and not within and not contains
    return {
        "intersects": intersects,
        "disjoint": not intersects,
        "within": within,
        "contains": contains,
        "overlaps": False,
        "touches": touches,
        "equals": False,
    }


def _rings_equal(a_rings: list[np.ndarray], b_rings: list[np.ndarray]) -> bool:
    if len(a_rings) != len(b_rings):
        return False

    def norm(r):
        pts = r[:-1]
        k = int(np.lexsort((pts[:, 1], pts[:, 0]))[0])
        fwd = np.roll(pts, -k, axis=0)
        rev = np.roll(pts[::-1], -int(np.lexsort(((pts[::-1])[:, 1], (pts[::-1])[:, 0]))[0]), axis=0)
        return min(fwd.tobytes(), rev.tobytes())

    return sorted(norm(r) for r in a_rings) == sorted(norm(r) for r in b_rings)


def _seg_events(p1, p2, q1, q2):
    """Intersection events of segment (p1,p2) with (q1,q2), exact for
    dyadic coordinates. -> (kind, t, u) list where kind is 'proper'
    (transversal interior-interior), 'touch' (an endpoint of one on
    the other, t/u give the location params), or 'overlap' (collinear
    1-D overlap; t,u are the [lo,hi] params of the overlap on p)."""
    d1 = p2 - p1
    d2 = q2 - q1
    den = d1[0] * d2[1] - d1[1] * d2[0]
    e = q1 - p1
    out = []
    if den == 0.0:
        if e[0] * d1[1] - e[1] * d1[0] != 0.0:
            return out  # parallel, not collinear
        ln = float(d1 @ d1)
        if ln == 0.0:
            return out
        t1 = float(e @ d1) / ln
        t2 = float((q2 - p1) @ d1) / ln
        lo, hi = min(t1, t2), max(t1, t2)
        lo_c, hi_c = max(lo, 0.0), min(hi, 1.0)
        if lo_c < hi_c:
            out.append(("overlap", lo_c, hi_c))
        elif lo_c == hi_c:
            out.append(("touch", lo_c, 0.0 if lo == lo_c else 1.0))
        return out
    t = (e[0] * d2[1] - e[1] * d2[0]) / den
    u = (e[0] * d1[1] - e[1] * d1[0]) / den
    if t < 0.0 or t > 1.0 or u < 0.0 or u > 1.0:
        return out
    if 0.0 < t < 1.0 and 0.0 < u < 1.0:
        out.append(("proper", t, u))
    else:
        out.append(("touch", t, u))
    return out


def _cover_union(intervals: list[tuple[float, float]]) -> float:
    """Total covered length of [0,1] by the interval union."""
    if not intervals:
        return 0.0
    intervals = sorted(intervals)
    total = 0.0
    cur_lo, cur_hi = intervals[0]
    for lo, hi in intervals[1:]:
        if lo > cur_hi:
            total += cur_hi - cur_lo
            cur_lo, cur_hi = lo, hi
        else:
            cur_hi = max(cur_hi, hi)
    return total + (cur_hi - cur_lo)


def _line_covered_by(a: np.ndarray, b: np.ndarray) -> bool:
    """Every point of polyline `a` lies on polyline `b` (collinear
    cover of each a-segment by b-segments)."""
    for i in range(len(a) - 1):
        p1, p2 = a[i], a[i + 1]
        if np.array_equal(p1, p2):
            continue
        ivs = []
        for j in range(len(b) - 1):
            for kind, x, y in _seg_events(p1, p2, b[j], b[j + 1]):
                if kind == "overlap":
                    ivs.append((x, y))
        if _cover_union(ivs) < 1.0 - 1e-12:
            return False
    return True


def line_line_relate(a: np.ndarray, b: np.ndarray) -> dict[str, bool]:
    """DE-9IM predicates for two open polylines (the reference's
    GEOS-backed Crosses/Touches/Overlaps for line pairs,
    ogrgeometry.cpp:5734,5661,5989). Line boundary = the two global
    endpoints; every other point is interior.

    crosses  <=> dim(I x I) == 0  (point contacts between interiors,
                 no collinear overlap)
    overlaps <=> dim(I x I) == 1 and neither covers the other
    touches  <=> intersection nonempty and I x I empty
    """
    a_ends = (a[0], a[-1])
    b_ends = (b[0], b[-1])

    def is_end(p, ends):
        return any(np.array_equal(p, e) for e in ends)

    ii0 = ii1 = contact = False
    for i in range(len(a) - 1):
        p1, p2 = a[i], a[i + 1]
        for j in range(len(b) - 1):
            q1, q2 = b[j], b[j + 1]
            for kind, t, u in _seg_events(p1, p2, q1, q2):
                contact = True
                if kind == "overlap":
                    ii1 = True
                elif kind == "proper":
                    ii0 = True
                else:  # touch at a point: interior iff not a global end
                    pt = p1 + t * (p2 - p1)
                    if not is_end(pt, a_ends) and not is_end(pt, b_ends):
                        ii0 = True
    within = contact and _line_covered_by(a, b)
    contains = contact and _line_covered_by(b, a)
    equals = within and contains
    return {
        "intersects": contact,
        "disjoint": not contact,
        "crosses": ii0 and not ii1,
        "overlaps": ii1 and not within and not contains,
        "touches": contact and not ii0 and not ii1,
        "within": within,
        "contains": contains,
        "equals": equals,
    }


def line_polygon_relate(
    line: np.ndarray, rings: list[np.ndarray]
) -> dict[str, bool]:
    """DE-9IM predicates for an open polyline vs an even-odd areal
    geometry (ogrgeometry.cpp:5734 Crosses L/A et al.): split the
    line at every boundary contact, classify each piece's midpoint as
    inside / on-boundary / outside, then:

    crosses <=> pieces both inside and outside
    within  <=> some piece inside, none outside (endpoints may lie on
                the boundary)
    touches <=> contact but no piece inside
    """
    has_in = has_out = has_on = contact = False
    for i in range(len(line) - 1):
        p1, p2 = line[i], line[i + 1]
        if np.array_equal(p1, p2):
            continue
        cuts = {0.0, 1.0}
        for r in rings:
            for j in range(len(r) - 1):
                for kind, t, u in _seg_events(p1, p2, r[j], r[j + 1]):
                    contact = True
                    if kind == "overlap":
                        cuts.add(t)
                        cuts.add(u)
                    else:
                        cuts.add(t)
        ts = sorted(cuts)
        for lo, hi in zip(ts[:-1], ts[1:]):
            if hi <= lo:
                continue
            mid = p1 + 0.5 * (lo + hi) * (p2 - p1)
            if point_on_boundary(mid[0], mid[1], rings):
                has_on = True
            elif bool(points_in_polygon([mid[0]], [mid[1]], rings)[0]):
                has_in = True
            else:
                has_out = True
    intersects = has_in or has_on or contact
    return {
        "intersects": intersects,
        "disjoint": not intersects,
        "crosses": has_in and has_out,
        "within": has_in and not has_out,
        "touches": intersects and not has_in,
        "overlaps": False,
        "contains": False,
        "equals": False,
    }


def _pts_seg_dist2(px, py, sx1, sy1, sx2, sy2) -> np.ndarray:
    """Squared distance of points (px,py)[:,None] to segments
    (s..)[None,:]; vectorized."""
    dx = sx2 - sx1
    dy = sy2 - sy1
    ln = dx * dx + dy * dy
    with np.errstate(invalid="ignore", divide="ignore"):
        t = ((px - sx1) * dx + (py - sy1) * dy) / np.where(ln == 0, 1.0, ln)
    t = np.clip(np.where(ln == 0, 0.0, t), 0.0, 1.0)
    qx = sx1 + t * dx
    qy = sy1 + t * dy
    return (px - qx) ** 2 + (py - qy) ** 2


def polygon_distance2(
    a_rings: list[np.ndarray], b_rings: list[np.ndarray]
) -> float:
    """Squared min distance between two areal geometries; 0 when they
    intersect (interiors or boundaries). Boundary-to-boundary vertex/
    segment checks suffice for disjoint polygons (the minimum is
    attained at a vertex of one against an edge of the other)."""
    rel = polygon_relate(a_rings, b_rings)
    if rel["intersects"]:
        return 0.0
    (a1, a2), (b1, b2) = _edges(a_rings), _edges(b_rings)
    d1 = _pts_seg_dist2(
        a1[:, 0][:, None], a1[:, 1][:, None],
        b1[:, 0][None, :], b1[:, 1][None, :],
        b2[:, 0][None, :], b2[:, 1][None, :],
    )
    d2 = _pts_seg_dist2(
        b1[:, 0][:, None], b1[:, 1][:, None],
        a1[:, 0][None, :], a1[:, 1][None, :],
        a2[:, 0][None, :], a2[:, 1][None, :],
    )
    return float(min(d1.min(), d2.min()))


def point_polygon_distance2(x: float, y: float, rings: list[np.ndarray]) -> float:
    """Squared distance of a point to an areal geometry (0 inside or
    on the boundary)."""
    if point_on_boundary(x, y, rings) or bool(
        points_in_polygon([x], [y], rings)[0]
    ):
        return 0.0
    a, b = _edges(rings)
    d = _pts_seg_dist2(
        np.asarray([x])[:, None], np.asarray([y])[:, None],
        a[:, 0][None, :], a[:, 1][None, :], b[:, 0][None, :], b[:, 1][None, :],
    )
    return float(d.min())
