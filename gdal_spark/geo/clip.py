"""Convex polygon clipping (Sutherland-Hodgman) for overlay joins.

The reference's layer overlay ops (Intersection/Union/Clip/Erase,
ogr/ogrsf_frmts/generic/ogrlayer.cpp:3345-5806) delegate pairwise
geometry to GEOS. v1 here supports CONVEX outer rings (the engine's
fixture family) with exact closed-form clipping; general polygons
route through the same operator shape with a different kernel.

All rings CCW, closed (first == last).
"""

from __future__ import annotations

import numpy as np

from gdal_spark.geo.geom import ring_area


def clip_convex(subject: np.ndarray, clip: np.ndarray) -> np.ndarray:
    """Sutherland-Hodgman: clip CCW ring `subject` by CCW convex ring
    `clip`; returns the (closed) intersection ring, possibly empty."""
    out = subject[:-1].tolist()
    for (cx1, cy1), (cx2, cy2) in zip(clip[:-1], clip[1:]):
        if not out:
            break
        inp = out
        out = []
        ex, ey = cx2 - cx1, cy2 - cy1

        def inside(p):
            return ex * (p[1] - cy1) - ey * (p[0] - cx1) >= 0.0

        def intersect(p, q):
            dx, dy = q[0] - p[0], q[1] - p[1]
            denom = ex * dy - ey * dx
            t = (ex * (cy1 - p[1]) - ey * (cx1 - p[0])) / denom
            return [p[0] + t * dx, p[1] + t * dy]

        s = inp[-1]
        for p in inp:
            if inside(p):
                if not inside(s):
                    out.append(intersect(s, p))
                out.append(list(p))
            elif inside(s):
                out.append(intersect(s, p))
            s = p
    if len(out) < 3:
        return np.empty((0, 2))
    ring = np.asarray(out, dtype=np.float64)
    return np.vstack([ring, ring[:1]])


def intersection_area(a: np.ndarray, b: np.ndarray) -> float:
    """Area of the intersection of two CCW convex rings."""
    inter = clip_convex(a, b)
    if len(inter) == 0:
        return 0.0
    return abs(ring_area(inter))
