"""Polygon boolean operations — the layer-algebra kernel.

Re-derives the pairwise geometry semantics the reference delegates to
GEOS (OGRGeometry::Intersection/Union/Difference,
ogr/ogrgeometry.cpp:4893,5012,5331) for the layer ops in
ogr/ogrsf_frmts/generic/ogrlayer.cpp:3345-5806 — arbitrary
(non-convex) rings with holes, multipolygon inputs and outputs.

Geometry model: a "polyset" is a flat list of closed rings (each an
(N+1, 2) float64 array, first == last) interpreted with EVEN-ODD
semantics — a point is inside iff it is inside an odd number of
rings. Ring orientation on input is irrelevant; outputs are
re-oriented by nesting depth (outer CCW, holes CW) when grouped into
polygons by `rings_to_polygons`.

Backend: the planar-arrangement kernel in geo/arrangement.py (full
noding -> face traversal -> combinatorial parity classification ->
boundary extraction). It replaced the earlier Greiner-Hormann
implementation for two reasons, both found by randomized differential
testing against dense grid-sampled ground truth:

1. ROBUSTNESS — GH enforced a general-position contract and raised
   DegenerateGeometry on any coincident-boundary input (shared
   vertices, vertex-on-edge, collinear overlapping edges). The
   arrangement kernel handles all of those exactly, matching the
   reference's GEOS snap-rounded overlay behavior on adjacency data
   (autotest/ogr/ogr_layer_algebra.py).
2. CORRECTNESS — the GH trace mis-handled some perfectly
   general-position 4-crossing pairs (difference came back ~3x off
   vs grid truth, seed-7 trial 4 of the differential harness); the
   arrangement kernel matches ground truth on 400/400 randomized
   trials and on every closed-form blob oracle.

Node identity quantizes on the 2^-20 key grid (vertices closer than
that merge), but all geometry math and emitted rings carry the
ORIGINAL float64 coordinates — exact passthrough for any input, no
displacement.

DegenerateGeometry remains defined here: the self-noding paths
(geo/makevalid.node_ring) still raise it for contacts they cannot
represent, and downstream callers catch it.
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
    """A geometry contact the requested kernel cannot represent."""


def point_in_polyset(x: float, y: float, rings: list[np.ndarray]) -> bool:
    """Even-odd containment across all rings."""
    px = np.asarray([x])
    py = np.asarray([y])
    inside = False
    for r in rings:
        if points_in_ring(px, py, r)[0]:
            inside = not inside
    return inside


def boolean_op(
    a: list[np.ndarray], b: list[np.ndarray], op: str
) -> list[np.ndarray]:
    """op in {'inter', 'union', 'diff', 'xor'} (diff = a minus b).
    Returns the result polyset (even-odd ring list; orientation as
    traced, kept region on the left — use rings_to_polygons /
    polyset_area downstream). Accepts every coincident-boundary
    degeneracy; see module docstring."""
    from gdal_spark.geo.arrangement import overlay_rings

    if op not in ("inter", "union", "diff", "xor"):
        raise ValueError(op)
    a = [r for r in a if len(r) >= 4]
    b = [r for r in b if len(r) >= 4]
    # trivial cases return inputs UNSNAPPED (byte-identical passthrough)
    if not a:
        return [r.copy() for r in b] if op in ("union", "xor") else []
    if not b:
        return [] if op == "inter" else [r.copy() for r in a]
    return overlay_rings(a, b, op)


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
    from gdal_spark.geo.predicates import interior_point

    info = []
    for r in rings:
        # nesting sample: a point STRICTLY interior to the ring —
        # result rings of degenerate overlays may share vertices, so
        # the first vertex can lie ON a candidate parent's boundary
        # where the half-open ray test is arbitrary
        try:
            pt = interior_point([r])
        except Exception:
            pt = (r[0, 0], r[0, 1])
        info.append({"ring": r, "area": abs(ring_area(r)), "pt": pt})
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
