"""Robust polygon overlay via planar arrangement + face classification.

The degenerate-capable companion to the Greiner-Hormann kernel in
geo/boolean.py: re-derives the snap-rounded overlay semantics the
reference gets from GEOS (OGRGeometry::Intersection/Union/Difference,
ogr/ogrgeometry.cpp:4893,5012,5331; robustness exercised by
autotest/ogr/ogr_layer_algebra.py adjacency cases). Where GH enforces
a general-position contract (raises DegenerateGeometry on shared
vertices, vertex-on-edge contacts, collinear overlapping edges
between operands), this kernel handles ALL of those: real-world layer
algebra is full of coincident boundaries (parcels, admin units).

Method (classic arrangement overlay, exact at snapped coordinates):

1. KEY every vertex on the 2^-20 identity grid (vertices within a
   key cell merge into one node) while geometry math and emitted
   rings keep the ORIGINAL float64 coordinates — robustness of a
   snap-rounding pass without displacing exact inputs (an explicit
   vertex snap is available separately as set_precision, the
   ogrgeometry.cpp:6608 ST_SetPrecision analog).
2. NODE all segments of both operands pairwise: proper crossings
   split both segments, T-junctions (vertex-on-edge) split the edge
   at the exact vertex key, collinear overlaps split both segments at
   each other's interior endpoints.
3. DEDUPE coincident subsegments into undirected arrangement edges
   carrying crossing parities (parityA, parityB) = (#A-copies mod 2,
   #B-copies mod 2). Crossing an edge flips even-odd inside-ness of
   an operand iff its parity bit is set; (0,0) edges (e.g. an edge
   shared by two rings of the same operand) change nothing and are
   dropped.
4. FACE TRAVERSAL of the half-edge structure (rotational successor,
   face kept on the left — same construction as makevalid's planar
   face walk) assigns every half-edge a face.
5. CLASSIFY faces combinatorially: per connected component, BFS from
   the component's unbounded face with parity (0,0), XOR-ing edge
   parities across each shared edge — no point-in-face sampling, so
   no epsilon anywhere. Cross-component nesting (an island ring with
   no boundary contact) is resolved by point-in-ring tests of one
   component node against OTHER components' rings — strictly
   non-degenerate by construction (shared geometry would have been
   noded into the same component).
6. KEEP faces by the boolean op on (insideA, insideB) and extract the
   region boundary: half-edges whose left face is kept and right face
   is not, chained with the kept region on the left (rotate clockwise
   from the incoming twin to the first boundary half-edge).

Output is an even-odd ring set (outers CCW, holes CW as traced) —
the same contract as boolean.boolean_op, consumable by
rings_to_polygons / polyset_area.

Scale note: this runs per feature-pair inside Arrow-batched UDFs; the
O(E^2) noding is over ONE pair's edges (tens to hundreds), never a
layer. Distribution (cell-join candidate generation) happens in
operators/overlay.py, unchanged.
"""

from __future__ import annotations

import numpy as np

from gdal_spark.geo.geom import points_in_ring, ring_area

__all__ = ["set_precision", "overlay_rings", "snap_rings", "ArrangementError"]

_Q = 1 << 20  # node-identity grid: vertices within 2^-20 merge


class ArrangementError(ValueError):
    """Internal inconsistency (should not happen on exact input)."""


def _key(x: float, y: float) -> tuple[int, int]:
    return (int(np.floor(x * _Q + 0.5)), int(np.floor(y * _Q + 0.5)))


# key -> representative ORIGINAL coordinate (first registration wins).
# Keys quantize node IDENTITY only; geometry math and emitted rings
# use the original float64 coordinates, so non-dyadic inputs (e.g.
# mercator-derived lon/lat) round-trip without the ~5e-7 displacement
# a vertex snap would cause. Reset by each public entry point; pandas
# UDF workers are single-threaded, so a module global is safe.
_REG: dict[tuple[int, int], tuple[float, float]] = {}


def _register(x: float, y: float) -> tuple[int, int]:
    k = _key(x, y)
    _REG.setdefault(k, (float(x), float(y)))
    return k


def _coord(k: tuple[int, int]) -> tuple[float, float]:
    c = _REG.get(k)
    return c if c is not None else (k[0] / _Q, k[1] / _Q)


def _clean_ring(pts: np.ndarray) -> np.ndarray | None:
    """Drop consecutive duplicates and back-tracking spikes from an
    OPEN vertex list; -> closed ring array or None if collapsed."""
    out: list[tuple[float, float]] = []
    for p in map(tuple, pts):
        if out and p == out[-1]:
            continue
        # spike: a-b-a backtrack; removing b may expose a new spike
        while len(out) >= 2 and p == out[-2]:
            out.pop()
        out.append(p)
    # closure-wrap dups/spikes
    while len(out) >= 2 and out[0] == out[-1]:
        out.pop()
    while len(out) >= 3 and out[1] == out[-1]:
        out.pop()
        out.pop(0)
    if len(out) < 3:
        return None
    ring = np.asarray(out + [out[0]], dtype=np.float64)
    if ring_area(ring) == 0.0:
        return None
    return ring


def set_precision(rings: list[np.ndarray], grid: float) -> list[np.ndarray]:
    """ST_SetPrecision-style vertex grid snapping
    (ogrgeometry.cpp:6608 OGRGeometry::SetPrecision semantics, minus
    GEOS's full hot-pixel pass): round every vertex to a multiple of
    `grid`, then remove collapsed edges/spikes and degenerate rings."""
    out = []
    for r in rings:
        snapped = np.floor(np.asarray(r, dtype=np.float64) / grid + 0.5) * grid
        c = _clean_ring(snapped[:-1] if len(snapped) > 1 else snapped)
        if c is not None:
            out.append(c)
    return out


def snap_rings(rings: list[np.ndarray]) -> list[np.ndarray]:
    """Clean rings by NODE KEY (consecutive same-key vertices and
    key-spikes dropped, degenerate rings removed) while PRESERVING
    original float coordinates, and register every kept vertex as its
    key's representative coordinate."""
    out = []
    for r in rings:
        pts = [tuple(p) for p in np.asarray(r, dtype=np.float64)[:-1]]
        keys: list[tuple[int, int]] = []
        kept: list[tuple[float, float]] = []
        for p in pts:
            k = _key(p[0], p[1])
            if keys and k == keys[-1]:
                continue
            while len(keys) >= 2 and k == keys[-2]:
                keys.pop()
                kept.pop()
            keys.append(k)
            kept.append(p)
        while len(keys) >= 2 and keys[0] == keys[-1]:
            keys.pop()
            kept.pop()
        while len(keys) >= 3 and keys[1] == keys[-1]:
            keys.pop()
            kept.pop()
            keys.pop(0)
            kept.pop(0)
        if len(kept) < 3:
            continue
        ring = np.asarray(kept + [kept[0]], dtype=np.float64)
        if ring_area(ring) == 0.0:
            continue
        for x, y in kept:
            _register(x, y)
        out.append(ring)
    return out


def _ring_segments(rings: list[np.ndarray]) -> list[tuple[tuple, tuple]]:
    segs = []
    for r in rings:
        ks = [_key(x, y) for x, y in r[:-1]]
        n = len(ks)
        for i in range(n):
            a, b = ks[i], ks[(i + 1) % n]
            if a != b:
                segs.append((a, b))
    return segs


def _node_all(
    segs: list[tuple[tuple, tuple, int]], mode: str = "parity"
) -> dict[tuple[tuple, tuple], list[int]]:
    """Fully node the segment soup; -> undirected edge -> [pA, pB]
    crossing parities. segs entries are (key_a, key_b, src 0|1).

    mode='parity' (overlay semantics): coincident copies XOR — an
    edge covered an even number of times by one operand changes
    nothing for that operand and is dropped when (0,0).
    mode='keep' (linework semantics, the JTS noding contract used by
    Polygonize/BuildArea): duplicates collapse to ONE edge with a
    crossing flip of (1, 0) — the edge is a boundary regardless of
    how many input lines traced it."""
    n = len(segs)
    coords = [(_coord(a), _coord(b)) for a, b, _s in segs]
    splits: list[set[tuple]] = [set() for _ in range(n)]
    for i in range(n):
        (ax, ay), (bx, by) = coords[i]
        d1x, d1y = bx - ax, by - ay
        len1 = d1x * d1x + d1y * d1y
        for j in range(i + 1, n):
            (cx, cy), (dx_, dy_) = coords[j]
            d2x, d2y = dx_ - cx, dy_ - cy
            den = d1x * d2y - d1y * d2x
            ex, ey = cx - ax, cy - ay
            if den == 0.0:
                # parallel; collinear iff cross((c-a), d1) == 0
                if ex * d1y - ey * d1x != 0.0:
                    continue
                # project j's endpoints on i (param t*len1) and vice versa
                t1 = ex * d1x + ey * d1y
                t2 = (dx_ - ax) * d1x + (dy_ - ay) * d1y
                for t, k in ((t1, segs[j][0]), (t2, segs[j][1])):
                    if 0.0 < t < len1:
                        splits[i].add(k)
                len2 = d2x * d2x + d2y * d2y
                u1 = (ax - cx) * d2x + (ay - cy) * d2y
                u2 = (bx - cx) * d2x + (by - cy) * d2y
                for u, k in ((u1, segs[i][0]), (u2, segs[i][1])):
                    if 0.0 < u < len2:
                        splits[j].add(k)
                continue
            t = (ex * d2y - ey * d2x) / den
            u = (ex * d1y - ey * d1x) / den
            if t < 0.0 or t > 1.0 or u < 0.0 or u > 1.0:
                continue
            t_end = t == 0.0 or t == 1.0
            u_end = u == 0.0 or u == 1.0
            if t_end and u_end:
                continue  # shared endpoint: already a common node
            if t_end:
                # i's endpoint lies on j's interior: split j at it
                splits[j].add(segs[i][0] if t == 0.0 else segs[i][1])
            elif u_end:
                splits[i].add(segs[j][0] if u == 0.0 else segs[j][1])
            else:
                px, py = ax + t * d1x, ay + t * d1y
                k = _register(px, py)
                splits[i].add(k)
                splits[j].add(k)
    edges: dict[tuple[tuple, tuple], list[int]] = {}
    for i, (a, b, src) in enumerate(segs):
        (ax, ay) = _coord(a)
        (bx, by) = _coord(b)
        d1x, d1y = bx - ax, by - ay
        ks = [a]
        mids = sorted(
            (k for k in splits[i] if k != a and k != b),
            key=lambda k: (_coord(k)[0] - ax) * d1x + (_coord(k)[1] - ay) * d1y,
        )
        ks.extend(mids)
        ks.append(b)
        for p, q in zip(ks[:-1], ks[1:]):
            if p == q:
                continue
            e = (p, q) if p <= q else (q, p)
            par = edges.setdefault(e, [0, 0])
            if mode == "keep":
                par[0] = 1
            else:
                par[src] ^= 1
    if mode == "keep":
        return edges
    return {e: p for e, p in edges.items() if p[0] or p[1]}


def _faces(
    edges: dict[tuple[tuple, tuple], list[int]]
) -> tuple[dict, list, dict, dict]:
    """Half-edge face traversal. Returns (face_of_halfedge,
    face_cycles, outgoing, rot_index)."""
    outgoing: dict[tuple, list[tuple]] = {}
    for (a, b) in edges:
        outgoing.setdefault(a, []).append(b)
        outgoing.setdefault(b, []).append(a)
    rot: dict[tuple, dict[tuple, int]] = {}
    for a, bs in outgoing.items():
        ax, ay = _coord(a)
        order = sorted(
            bs, key=lambda b: np.arctan2(_coord(b)[1] - ay, _coord(b)[0] - ax)
        )
        outgoing[a] = order
        rot[a] = {b: i for i, b in enumerate(order)}
    face_of: dict[tuple[tuple, tuple], int] = {}
    cycles: list[list[tuple]] = []
    for (a0, b0) in edges:
        for h in ((a0, b0), (b0, a0)):
            if h in face_of:
                continue
            fid = len(cycles)
            cyc = []
            cur = h
            while cur not in face_of:
                face_of[cur] = fid
                cyc.append(cur[0])
                u, v = cur
                order = outgoing[v]
                cur = (v, order[(rot[v][u] - 1) % len(order)])
            cycles.append(cyc)
    return face_of, cycles, outgoing, rot


def _cycle_area(cyc: list[tuple]) -> float:
    pts = [_coord(k) for k in cyc]
    s = 0.0
    for (x1, y1), (x2, y2) in zip(pts, pts[1:] + pts[:1]):
        s += x1 * y2 - x2 * y1
    return 0.5 * s


def _components(
    edges: dict[tuple[tuple, tuple], list[int]]
) -> dict[tuple, int]:
    parent: dict[tuple, tuple] = {}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    roots: dict[tuple, int] = {}
    comp: dict[tuple, int] = {}
    for x in parent:
        r = find(x)
        comp[x] = roots.setdefault(r, len(roots))
    return comp


_KEEP = {
    "inter": lambda a, b: a and b,
    "union": lambda a, b: a or b,
    "diff": lambda a, b: a and not b,
    "xor": lambda a, b: a != b,
}


def _face_parities(edges, face_of, cycles, comp, ring_src):
    """Global (parityA, parityB) per face: per-component BFS from the
    component's unbounded face, XOR-ing edge parities, plus a
    cross-component nesting base from strictly-non-degenerate
    point-in-ring tests."""
    face_comp = [comp[cyc[0]] for cyc in cycles]
    n_comp = 1 + max(comp.values())
    outer_face = [-1] * n_comp
    outer_area = [np.inf] * n_comp
    for fid, cyc in enumerate(cycles):
        area = _cycle_area(cyc)
        c = face_comp[fid]
        if area < outer_area[c]:
            outer_area[c] = area
            outer_face[c] = fid
    adj: dict[int, list[tuple[int, int, int]]] = {}
    for (e, par) in edges.items():
        f1 = face_of[(e[0], e[1])]
        f2 = face_of[(e[1], e[0])]
        adj.setdefault(f1, []).append((f2, par[0], par[1]))
        adj.setdefault(f2, []).append((f1, par[0], par[1]))
    parity: list[tuple[int, int] | None] = [None] * len(cycles)
    for c in range(n_comp):
        start = outer_face[c]
        parity[start] = (0, 0)
        stack = [start]
        while stack:
            f = stack.pop()
            pa, pb = parity[f]
            for (g, fa, fb) in adj.get(f, ()):
                np_ = (pa ^ fa, pb ^ fb)
                if parity[g] is None:
                    parity[g] = np_
                    stack.append(g)
                elif parity[g] != np_ and f != g:
                    raise ArrangementError("inconsistent face parity")
    base = [(0, 0)] * n_comp
    if n_comp > 1:
        comp_nodes: dict[int, tuple] = {}
        for k, c in comp.items():
            comp_nodes.setdefault(c, k)
        for c in range(n_comp):
            px, py = _coord(comp_nodes[c])
            pa = pb = 0
            for ring, src, k0 in ring_src:
                if comp.get(k0) == c:
                    continue
                # a fully-cancelled ring pair (comp None) still XORs
                # out pairwise, so it is safe to include
                if points_in_ring(np.asarray([px]), np.asarray([py]), ring)[0]:
                    if src == 0:
                        pa ^= 1
                    else:
                        pb ^= 1
            base[c] = (pa, pb)
    out = []
    for fid in range(len(cycles)):
        pa, pb = parity[fid]
        ba, bb = base[face_comp[fid]]
        out.append((pa ^ ba, pb ^ bb))
    return out, face_comp, outer_face


def _extract_boundary(edges, face_of, outgoing, rot, keep):
    """Chain the kept-region boundary: half-edges whose left face is
    kept and right face is not, continued by rotating clockwise from
    the incoming twin to the first boundary half-edge (kept region
    stays on the left; outers trace CCW, holes CW)."""
    boundary: set[tuple[tuple, tuple]] = set()
    for e in edges:
        h1 = (e[0], e[1])
        h2 = (e[1], e[0])
        k1, k2 = keep[face_of[h1]], keep[face_of[h2]]
        if k1 and not k2:
            boundary.add(h1)
        elif k2 and not k1:
            boundary.add(h2)
    result: list[np.ndarray] = []
    visited: set[tuple[tuple, tuple]] = set()
    for h0 in list(boundary):
        if h0 in visited:
            continue
        pts = []
        cur = h0
        while cur not in visited:
            visited.add(cur)
            pts.append(_coord(cur[0]))
            u, v = cur
            order = outgoing[v]
            i = rot[v][u]
            deg = len(order)
            for step in range(1, deg + 1):
                cand = (v, order[(i - step) % deg])
                if cand in boundary:
                    cur = cand
                    break
            else:
                raise ArrangementError("boundary chain dead end")
        if cur != h0:
            raise ArrangementError("boundary chain re-entered mid-ring")
        if len(pts) >= 3:
            ring = np.asarray(pts + [pts[0]], dtype=np.float64)
            if ring_area(ring) != 0.0:
                result.append(ring)
    return result


def _ring_sources(rings_by_src):
    """[(src, rings)] -> (segs, ring_src) inputs for the arrangement."""
    segs: list[tuple[tuple, tuple, int]] = []
    ring_src: list[tuple[np.ndarray, int, tuple]] = []
    for src, rings in rings_by_src:
        for r in rings:
            for seg in _ring_segments([r]):
                segs.append((seg[0], seg[1], src))
            ring_src.append((r, src, _key(r[0, 0], r[0, 1])))
    return segs, ring_src


def overlay_rings(
    a: list[np.ndarray], b: list[np.ndarray], op: str
) -> list[np.ndarray]:
    """Robust boolean overlay of two even-odd polysets; accepts every
    degeneracy the GH kernel rejected. -> even-odd result ring set."""
    if op not in _KEEP:
        raise ValueError(op)
    keep_fn = _KEEP[op]
    _REG.clear()
    a_s = snap_rings(a)
    b_s = snap_rings(b)
    if not a_s or not b_s:
        if op == "inter":
            return []
        if op == "diff":
            return [r.copy() for r in a_s]
        return [r.copy() for r in a_s + b_s]  # union / xor
    segs, ring_src = _ring_sources(((0, a_s), (1, b_s)))
    edges = _node_all(segs)
    if not edges:
        return []  # operands cancelled exactly
    face_of, cycles, outgoing, rot = _faces(edges)
    comp = _components(edges)
    parities, _fc, _of = _face_parities(edges, face_of, cycles, comp, ring_src)
    keep = [bool(keep_fn(pa, pb)) for pa, pb in parities]
    return _extract_boundary(edges, face_of, outgoing, rot, keep)


def build_area(linework: list[np.ndarray]) -> list[np.ndarray]:
    """ST_BuildArea (ogrgeometry.cpp:6916 -> GEOSBuildArea): form the
    areal region bounded by fully-noded closed linework under the
    ALTERNATING rule (rings nested inside other rings become holes,
    doubly-nested rings islands, ...). Input: closed rings (open
    chains should be pre-closed by the caller); dangling/unclosed
    geometry contributes nothing (its edges bound no parity change
    only when duplicated — single dangling segments raise through the
    parity consistency check). -> even-odd result ring set."""
    _REG.clear()
    a_s = snap_rings(linework)
    if not a_s:
        return []
    segs, ring_src = _ring_sources(((0, a_s),))
    edges = _node_all(segs, mode="keep")
    if not edges:
        return []
    face_of, cycles, outgoing, rot = _faces(edges)
    comp = _components(edges)
    parities, _fc, _of = _face_parities(edges, face_of, cycles, comp, ring_src)
    keep = [pa == 1 for pa, _pb in parities]
    return _extract_boundary(edges, face_of, outgoing, rot, keep)


def polygonize_faces(linework: list[np.ndarray]) -> list[list[np.ndarray]]:
    """Geometry Polygonize (ogrgeometry.cpp:6789 -> GEOSPolygonize /
    the JTS Polygonizer): every bounded face of the noded linework
    becomes its own polygon; a component nested inside a face
    additionally cuts a hole into that face's polygon (two concentric
    squares -> a donut AND the inner square). -> list of polygons as
    ring groups (outer CCW first, holes CW)."""
    _REG.clear()
    a_s = snap_rings(linework)
    if not a_s:
        return []
    segs, _ring_src = _ring_sources(((0, a_s),))
    edges = _node_all(segs, mode="keep")
    if not edges:
        return []
    face_of, cycles, outgoing, rot = _faces(edges)
    comp = _components(edges)
    face_comp = [comp[cyc[0]] for cyc in cycles]
    n_comp = 1 + max(comp.values())
    areas = [_cycle_area(cyc) for cyc in cycles]
    outer_face = [-1] * n_comp
    outer_area = [np.inf] * n_comp
    for fid, a in enumerate(areas):
        c = face_comp[fid]
        if a < outer_area[c]:
            outer_area[c] = a
            outer_face[c] = fid
    def cyc_ring(fid, reverse=False):
        pts = [_coord(k) for k in cycles[fid]]
        if reverse:
            pts = pts[::-1]
        return np.asarray(pts + [pts[0]], dtype=np.float64)
    # direct nesting: component -> smallest bounded face (of another
    # component) containing one of its nodes; strictly non-degenerate
    holes_of: dict[int, list[int]] = {}
    if n_comp > 1:
        comp_nodes: dict[int, tuple] = {}
        for k, c in comp.items():
            comp_nodes.setdefault(c, k)
        bounded = [fid for fid in range(len(cycles)) if areas[fid] > 0.0]
        for c in range(n_comp):
            px, py = _coord(comp_nodes[c])
            best = None
            for fid in bounded:
                if face_comp[fid] == c:
                    continue
                ring = cyc_ring(fid)
                if points_in_ring(np.asarray([px]), np.asarray([py]), ring)[0]:
                    if best is None or areas[fid] < areas[best]:
                        best = fid
            if best is not None:
                holes_of.setdefault(best, []).append(c)
    polys: list[list[np.ndarray]] = []
    for fid in range(len(cycles)):
        if areas[fid] <= 0.0:
            continue
        rings = [cyc_ring(fid)]
        for c in holes_of.get(fid, ()):  # nested components cut holes
            rings.append(cyc_ring(outer_face[c], reverse=False))
        polys.append(rings)
    return polys
