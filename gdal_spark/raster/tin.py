"""TIN 'linear' grid interpolation (alg/gdalgrid.cpp GGA_Linear /
gdal_alg.h:402-416): Delaunay-triangulate the scatter points, then
barycentric-interpolate each grid pixel from its containing
triangle's three vertices. The reference delegates triangulation to
qhull (alg/delaunay.c); here it is a from-scratch Bowyer-Watson
incremental build (pure numpy/python, O(N^2) — the point set is the
metadata-sized side of the operator).

Correctness anchor (used by the oracle): barycentric interpolation
reproduces any LINEAR field f = a + bx + cy EXACTLY regardless of
which (valid) triangulation was built, so a linear-field fixture has
a closed-form SQL twin without expressing the triangulation in SQL.
"""

from __future__ import annotations

import numpy as np

__all__ = ["delaunay", "tin_interpolate_grid"]


def _circumcircle(p0, p1, p2) -> tuple[float, float, float]:
    """(cx, cy, r2) of the circle through three points."""
    ax, ay = p0
    bx, by = p1
    cx, cy = p2
    d = 2.0 * (ax * (by - cy) + bx * (cy - ay) + cx * (ay - by))
    if d == 0.0:
        return 0.0, 0.0, float("inf")
    ux = (
        (ax * ax + ay * ay) * (by - cy)
        + (bx * bx + by * by) * (cy - ay)
        + (cx * cx + cy * cy) * (ay - by)
    ) / d
    uy = (
        (ax * ax + ay * ay) * (cx - bx)
        + (bx * bx + by * by) * (ax - cx)
        + (cx * cx + cy * cy) * (bx - ax)
    ) / d
    r2 = (ax - ux) ** 2 + (ay - uy) ** 2
    return ux, uy, r2


def delaunay(points: np.ndarray) -> np.ndarray:
    """Bowyer-Watson incremental Delaunay triangulation.
    points: (N, 2), assumed distinct and not all collinear.
    -> (T, 3) int index triples."""
    pts = np.asarray(points, dtype=np.float64)
    n = len(pts)
    if n < 3:
        return np.empty((0, 3), dtype=np.int64)
    # super-triangle containing everything
    cx, cy = pts[:, 0].mean(), pts[:, 1].mean()
    m = max(pts[:, 0].ptp(), pts[:, 1].ptp(), 1.0) * 16.0
    sup = np.array(
        [[cx - 2 * m, cy - m], [cx + 2 * m, cy - m], [cx, cy + 2 * m]]
    )
    allp = np.vstack([pts, sup])
    tris: list[tuple[int, int, int]] = [(n, n + 1, n + 2)]
    circ: list[tuple[float, float, float]] = [
        _circumcircle(allp[n], allp[n + 1], allp[n + 2])
    ]
    for i in range(n):
        px, py = allp[i]
        bad = []
        for t, (ux, uy, r2) in enumerate(circ):
            if (px - ux) ** 2 + (py - uy) ** 2 <= r2:
                bad.append(t)
        # boundary polygon = edges of bad triangles not shared twice
        edge_count: dict[tuple[int, int], int] = {}
        for t in bad:
            a, b, c = tris[t]
            for e in ((a, b), (b, c), (c, a)):
                k = (min(e), max(e))
                edge_count[k] = edge_count.get(k, 0) + 1
        boundary = [e for e, cnt in edge_count.items() if cnt == 1]
        for t in sorted(bad, reverse=True):
            tris.pop(t)
            circ.pop(t)
        for a, b in boundary:
            tris.append((a, b, i))
            circ.append(_circumcircle(allp[a], allp[b], allp[i]))
    out = [
        t for t in tris if t[0] < n and t[1] < n and t[2] < n
    ]
    return np.asarray(out, dtype=np.int64)


def tin_interpolate_grid(
    points: np.ndarray,
    values: np.ndarray,
    grid_w: int,
    grid_h: int,
    bounds: tuple[float, float, float, float],
    y_rows: tuple[int, int] | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """Interpolate pixel CENTERS of a grid over `bounds` from the TIN
    of (points, values); returns (vals, mask) for rows
    [y_rows[0], y_rows[1]) (default: all rows). Pixels outside the
    hull stay masked (GGA_Linear leaves them nodata when
    dfRadius=0)."""
    x0, y0b, x1, y1b = bounds
    resx = (x1 - x0) / grid_w
    resy = (y1b - y0b) / grid_h
    r0, r1 = y_rows if y_rows is not None else (0, grid_h)
    h = r1 - r0
    cx = x0 + (np.arange(grid_w) + 0.5) * resx
    cy = y0b + (np.arange(r0, r1) + 0.5) * resy
    CX = np.broadcast_to(cx[None, :], (h, grid_w))
    CY = np.broadcast_to(cy[:, None], (h, grid_w))
    vals = np.zeros((h, grid_w), dtype=np.float64)
    mask = np.zeros((h, grid_w), dtype=bool)
    tris = delaunay(points)
    for a, b, c in tris:
        pa, pb, pc = points[a], points[b], points[c]
        den = (pb[1] - pc[1]) * (pa[0] - pc[0]) + (pc[0] - pb[0]) * (pa[1] - pc[1])
        if den == 0.0:
            continue
        xm0 = min(pa[0], pb[0], pc[0])
        xm1 = max(pa[0], pb[0], pc[0])
        ym0 = min(pa[1], pb[1], pc[1])
        ym1 = max(pa[1], pb[1], pc[1])
        sel_x = (cx >= xm0 - resx) & (cx <= xm1 + resx)
        sel_y = (cy >= ym0 - resy) & (cy <= ym1 + resy)
        if not sel_x.any() or not sel_y.any():
            continue
        xs = np.nonzero(sel_x)[0]
        ys = np.nonzero(sel_y)[0]
        X = CX[np.ix_(ys, xs)]
        Y = CY[np.ix_(ys, xs)]
        w0 = ((pb[1] - pc[1]) * (X - pc[0]) + (pc[0] - pb[0]) * (Y - pc[1])) / den
        w1 = ((pc[1] - pa[1]) * (X - pc[0]) + (pa[0] - pc[0]) * (Y - pc[1])) / den
        w2 = 1.0 - w0 - w1
        eps = 1e-12
        inside = (w0 >= -eps) & (w1 >= -eps) & (w2 >= -eps)
        v = w0 * values[a] + w1 * values[b] + w2 * values[c]
        sub_mask = mask[np.ix_(ys, xs)]
        take = inside & ~sub_mask
        sub_vals = vals[np.ix_(ys, xs)]
        sub_vals[take] = v[take]
        sub_mask |= inside
        vals[np.ix_(ys, xs)] = sub_vals
        mask[np.ix_(ys, xs)] = sub_mask
    return vals, mask
