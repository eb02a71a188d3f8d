"""MakeValid: repair self-intersecting rings (OGRGeometry::MakeValid,
ogr/ogrgeometry.cpp:3922; GEOS MakeValid 'linework' semantics for
areal inputs).

Method: node each ring at its proper self-crossings, then decompose
the closed walk into SIMPLE loops with a stack — when the walk
revisits a crossing point, the vertices since its first visit close
one loop. Winding parity along any ray is preserved by the
decomposition, so the loop set under even-odd semantics covers
exactly the region the invalid ring covered; rings_to_polygons then
nests/orients them into a valid (Multi)Polygon. A bowtie splits into
its two triangles, matching the reference's structure-method output.

Degenerate self-contacts (vertex exactly on a non-adjacent edge,
collinear overlapping edges) raise DegenerateGeometry, mirroring the
boolean kernel's contract.
"""

from __future__ import annotations

import numpy as np

from gdal_spark.geo.boolean import DegenerateGeometry, rings_to_polygons

__all__ = ["node_ring", "split_simple_loops", "make_valid_rings", "chain_is_simple"]

_KEY = 1 << 28


def node_ring(ring: np.ndarray) -> np.ndarray:
    """Insert every proper self-crossing into the (closed) ring's
    vertex sequence; returns the noded CLOSED ring. Crossing points
    appear once per passage (twice total)."""
    pts = ring[:-1]
    n = len(pts)
    inserts: dict[int, list[tuple[float, tuple[float, float]]]] = {}
    for i in range(n):
        p1, p2 = pts[i], pts[(i + 1) % n]
        d1 = p2 - p1
        for j in range(i + 1, n):
            if j == i or (j + 1) % n == i or (i + 1) % n == j:
                continue  # adjacent edges share a vertex, not a crossing
            q1, q2 = pts[j], pts[(j + 1) % n]
            d2 = q2 - q1
            den = d1[0] * d2[1] - d1[1] * d2[0]
            if den == 0.0:
                if (q1[0] - p1[0]) * d1[1] - (q1[1] - p1[1]) * d1[0] == 0.0:
                    lo = min(0.0, d1 @ d1)
                    t1 = (q1 - p1) @ d1
                    t2 = (q2 - p1) @ d1
                    if max(min(t1, t2), lo) < min(max(t1, t2), d1 @ d1):
                        raise DegenerateGeometry("collinear self-overlap")
                continue
            t = ((q1[0] - p1[0]) * d2[1] - (q1[1] - p1[1]) * d2[0]) / den
            u = ((q1[0] - p1[0]) * d1[1] - (q1[1] - p1[1]) * d1[0]) / den
            if t <= 0.0 or t >= 1.0 or u <= 0.0 or u >= 1.0:
                if (0.0 <= t <= 1.0 and u in (0.0, 1.0)) or (
                    0.0 <= u <= 1.0 and t in (0.0, 1.0)
                ):
                    if 0.0 < t < 1.0 or 0.0 < u < 1.0:
                        raise DegenerateGeometry("vertex-on-edge self-contact")
                continue
            x, y = p1[0] + t * d1[0], p1[1] + t * d1[1]
            inserts.setdefault(i, []).append((t, (x, y)))
            inserts.setdefault(j, []).append((u, (x, y)))
    out = []
    for i in range(n):
        out.append(tuple(pts[i]))
        for _t, p in sorted(inserts.get(i, [])):
            out.append(p)
    out.append(out[0])
    return np.asarray(out, dtype=np.float64)


def chain_is_simple(pts: np.ndarray, closed: bool) -> bool:
    """OGC/GEOS IsSimple for one vertex chain (ogrgeometry.cpp:2416
    delegates to GEOS IsSimpleOp semantics): no two segments intersect
    except adjacent segments at their one shared vertex (and, for a
    closed chain, the first/last segments at the closure point).
    Unlike node_ring this never adds a synthetic closure edge for an
    OPEN chain and returns False (not DegenerateGeometry) on
    vertex-on-edge or collinear-overlap self-contacts.

    `pts`: (n,2) vertices WITHOUT a duplicated closing vertex when
    `closed` is True (pass ring[:-1]).
    """
    n = len(pts)
    nseg = n if closed else n - 1

    def seg(i):
        return pts[i], pts[(i + 1) % n]

    for i in range(nseg):
        p1, p2 = seg(i)
        d1 = p2 - p1
        if d1[0] == 0.0 and d1[1] == 0.0:
            return False  # zero-length segment repeats a point
        for j in range(i + 1, nseg):
            adjacent = j == i + 1 or (closed and i == 0 and j == nseg - 1)
            q1, q2 = seg(j)
            d2 = q2 - q1
            den = d1[0] * d2[1] - d1[1] * d2[0]
            if den == 0.0:
                # parallel: intersect only if collinear AND their
                # parameter intervals on the shared line overlap
                if (q1[0] - p1[0]) * d1[1] - (q1[1] - p1[1]) * d1[0] != 0.0:
                    continue
                t1 = float((q1 - p1) @ d1)
                t2 = float((q2 - p1) @ d1)
                lo, hi = min(t1, t2), max(t1, t2)
                span = float(d1 @ d1)
                if adjacent:
                    # sharing exactly the common vertex is fine;
                    # any 1-D overlap is a backtrack -> not simple
                    if max(lo, 0.0) < min(hi, span):
                        return False
                else:
                    if max(lo, 0.0) <= min(hi, span):
                        return False
                continue
            t = ((q1[0] - p1[0]) * d2[1] - (q1[1] - p1[1]) * d2[0]) / den
            u = ((q1[0] - p1[0]) * d1[1] - (q1[1] - p1[1]) * d1[0]) / den
            if t < 0.0 or t > 1.0 or u < 0.0 or u > 1.0:
                continue
            if adjacent:
                # non-collinear adjacent segments can only meet at the
                # shared vertex (t/u at the matching ends) — allowed
                continue
            return False
    return True


def split_simple_loops(noded: np.ndarray) -> list[np.ndarray]:
    """Decompose a noded closed ring into simple loops: stack-walk
    the sequence, closing a loop whenever a point key repeats."""

    def key(p):
        return (int(np.floor(p[0] * _KEY + 0.5)), int(np.floor(p[1] * _KEY + 0.5)))

    loops: list[np.ndarray] = []
    stack: list[tuple[float, float]] = []
    pos: dict[tuple, int] = {}
    for p in map(tuple, noded[:-1]):
        k = key(p)
        if k in pos:
            start = pos[k]
            loop = stack[start:] + [stack[start]]
            if len(loop) >= 4:
                loops.append(np.asarray(loop, dtype=np.float64))
            for q in stack[start:]:
                pos.pop(key(q), None)
            del stack[start:]
        pos[k] = len(stack)
        stack.append(p)
    if len(stack) >= 3:
        loops.append(np.asarray(stack + [stack[0]], dtype=np.float64))
    return loops


def _face_cycles(noded: np.ndarray) -> list[np.ndarray]:
    """Planar face traversal of one noded closed walk: half-edges
    both ways, rotational successor at each vertex, faces traced with
    the region on the left. Returns every face boundary cycle
    (bounded faces AND the outer face; orientation as traced)."""

    def key(p):
        return (int(np.floor(p[0] * _KEY + 0.5)), int(np.floor(p[1] * _KEY + 0.5)))

    pts = noded[:-1]
    n = len(pts)
    verts: dict[tuple, tuple[float, float]] = {}
    half: list[tuple[tuple, tuple]] = []
    seen_edges: set[tuple] = set()
    for i in range(n):
        a, b = key(pts[i]), key(pts[(i + 1) % n])
        if a == b:
            continue
        verts[a] = tuple(pts[i])
        verts[b] = tuple(pts[(i + 1) % n])
        e = (min(a, b), max(a, b))
        if e in seen_edges:
            raise DegenerateGeometry("repeated edge in noded walk")
        seen_edges.add(e)
        half.append((a, b))
        half.append((b, a))
    # rotational order of outgoing half-edges per vertex
    outgoing: dict[tuple, list[tuple]] = {}
    for a, b in half:
        outgoing.setdefault(a, []).append(b)
    angles: dict[tuple, dict[tuple, float]] = {}
    for a, bs in outgoing.items():
        ax, ay = verts[a]
        angs = {}
        for b in bs:
            bx, by = verts[b]
            angs[b] = float(np.arctan2(by - ay, bx - ax))
        order = sorted(bs, key=lambda b: angs[b])
        angles[a] = {b: idx for idx, b in enumerate(order)}
        outgoing[a] = order
    nxt: dict[tuple[tuple, tuple], tuple[tuple, tuple]] = {}
    for a, b in half:
        # from half-edge a->b: rotate from the twin b->a to the next
        # outgoing edge CLOCKWISE at b (face kept on the left)
        order = outgoing[b]
        idx = angles[b][a]
        nxt[(a, b)] = (b, order[(idx - 1) % len(order)])
    cycles = []
    used: set[tuple] = set()
    for h in half:
        if h in used:
            continue
        cyc = []
        cur = h
        while cur not in used:
            used.add(cur)
            cyc.append(verts[cur[0]])
            cur = nxt[cur]
        ring = np.asarray(cyc + [cyc[0]], dtype=np.float64)
        if len(ring) >= 4:
            cycles.append(ring)
    return cycles


def make_valid_rings(rings: list[np.ndarray]) -> list[list[np.ndarray]]:
    """-> valid polygons (list of ring groups, outer CCW / holes CW)
    covering the even-odd region of the possibly self-intersecting
    input rings. Already-valid input passes through unchanged in
    content (re-grouped/re-oriented).

    Method: per input ring, node self-crossings and run planar FACE
    TRAVERSAL; bounded faces whose interior has odd winding parity
    w.r.t. the original rings are kept (this handles interleaved
    crossing patterns like the pentagram, where simple loop-splitting
    cannot). Kept faces are interior-disjoint simple cycles, so
    rings_to_polygons nests them into valid OGC polygons. Distinct
    input rings must not cross each other (raise), matching the
    boolean kernel's cross-operand contract."""
    from gdal_spark.geo.geom import points_in_polygon
    from gdal_spark.geo.predicates import interior_point, proper_crossing

    all_cycles: list[np.ndarray] = []
    for r in rings:
        noded = node_ring(r)
        for cyc in _face_cycles(noded):
            # keep traced cycles bounding a face on their left: the
            # left-on rule makes bounded faces CCW and the outer face CW
            if ring_area_signed(cyc) <= 0.0:
                continue
            ix, iy = interior_point([cyc])
            # parity vs THIS ring only: each ring contributes its own
            # odd-winding faces; cross-ring even-odd (holes) composes
            # afterwards via nesting parity in rings_to_polygons
            if points_in_polygon([ix], [iy], [r])[0]:
                all_cycles.append(cyc)
    for i in range(len(all_cycles)):
        for j in range(i + 1, len(all_cycles)):
            if proper_crossing([all_cycles[i]], [all_cycles[j]]):
                raise DegenerateGeometry("input rings cross each other")
    return rings_to_polygons(all_cycles)


def ring_area_signed(ring: np.ndarray) -> float:
    x = ring[:, 0]
    y = ring[:, 1]
    return 0.5 * float(np.sum(x[:-1] * y[1:] - x[1:] * y[:-1]))
