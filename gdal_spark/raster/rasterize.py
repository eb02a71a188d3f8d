"""Vector -> raster burn-in (gdal_rasterize semantics), pure numpy.

Re-derives the reference's exact scanline polygon-fill rule
(alg/llrasterize.cpp:58-209, GDALdllImageFilledPolygon):

- a pixel is burned iff its CENTER falls inside the polygon;
- per scanline row y the test height is dy = y + 0.5;
- an edge (dy1 < dy2 after orienting) contributes an intersection
  when dy1 <= dy < dy2 (half-open => each vertex counted once);
- intersection x is rounded as floor(x + 0.5);
- sorted intersections pair up even-odd; each pair [xa, xb) burns
  pixels xa .. xb-1 inclusive (holes fall out of even-odd pairing);
- horizontal BOTTOM segments are filled separately, TOP horizontal
  segments are skipped (llrasterize.cpp:155-186).

ALL_TOUCHED additionally burns every pixel any edge passes through
(alg/gdalrasterize.cpp:779, llrasterize.cpp GDALdllImageLineAllTouched):
implemented as a supercover line walk over the edge segments.

MERGE_ALG: REPLACE overwrites, ADD accumulates
(alg/gdalrasterize.cpp:800-817).
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "fill_polygon_runs",
    "rasterize_polygon",
    "burn_rings",
    "all_touched_mask",
]


def fill_polygon_runs(
    rings: list[np.ndarray],
    height: int,
    y_min: int | None = None,
    y_max: int | None = None,
) -> list[tuple[int, int, int]]:
    """Scanline-fill a polygon given rings in PIXEL coordinates.

    Returns burn runs as (y, x_start, x_end_exclusive) with the exact
    reference rounding (llrasterize.cpp:109,193: floor(intersect+0.5),
    fill polyInts[i] .. polyInts[i+1]-1). x runs are NOT clipped here;
    the caller clips to its buffer. y is clipped to [0, height), and
    optionally to the window [y_min, y_max) — callers rasterizing one
    tile of a world-spanning polygon restrict the scan to their own
    rows instead of walking the full y extent.
    """
    ys = np.concatenate([r[:, 1] for r in rings])
    miny = max(int(ys.min()), 0)
    maxy = min(int(ys.max()), height - 1)
    if y_min is not None:
        miny = max(miny, y_min)
    if y_max is not None:
        maxy = min(maxy, y_max - 1)
    runs: list[tuple[int, int, int]] = []
    for y in range(miny, maxy + 1):
        dy = y + 0.5
        xs: list[int] = []
        horiz: list[tuple[int, int]] = []
        for ring in rings:
            x1 = ring[:-1, 0]
            y1 = ring[:-1, 1]
            x2 = ring[1:, 0]
            y2 = ring[1:, 1]
            lo = np.minimum(y1, y2)
            hi = np.maximum(y1, y2)
            # orient each edge so dy1 < dy2; half-open [dy1, dy2)
            sel = (dy >= lo) & (dy < hi)
            if sel.any():
                ex1 = np.where(y1[sel] < y2[sel], x1[sel], x2[sel])
                ey1 = lo[sel]
                ex2 = np.where(y1[sel] < y2[sel], x2[sel], x1[sel])
                ey2 = hi[sel]
                xint = (dy - ey1) * (ex2 - ex1) / (ey2 - ey1) + ex1
                xs.extend(np.floor(xint + 0.5).astype(np.int64).tolist())
            # bottom-horizontal segments exactly at pixel-center height
            # (llrasterize.cpp:155-186): an edge with y1 == y2 == dy and
            # x1 > x2 (ring order) burns floor(x2+0.5)..floor(x1+0.5)-1;
            # top horizontals (x1 < x2) are skipped — the regular
            # even-odd loop already covers them.
            hsel = (y1 == dy) & (y2 == dy) & (x1 > x2)
            if hsel.any():
                ha = np.floor(x2[hsel] + 0.5).astype(np.int64)
                hb = np.floor(x1[hsel] + 0.5).astype(np.int64)
                horiz.extend(
                    (xa, xb) for xa, xb in zip(ha.tolist(), hb.tolist()) if xb > xa
                )
        xs.sort()
        row_runs: list[tuple[int, int]] = []
        for i in range(0, len(xs) - 1, 2):
            if xs[i + 1] > xs[i]:
                row_runs.append((xs[i], xs[i + 1]))
        # merge horizontal runs avoiding double-burn of pixels the
        # even-odd pass already produced (the bAvoidBurningSamePoints
        # polyInts2 merge, llrasterize.cpp:210+) so callers can treat
        # runs as disjoint per polygon (safe under MERGE_ALG=ADD).
        for xa, xb in horiz:
            cur = [(xa, xb)]
            for ra, rb in row_runs:
                nxt = []
                for ca, cb in cur:
                    if rb <= ca or ra >= cb:
                        nxt.append((ca, cb))
                    else:
                        if ca < ra:
                            nxt.append((ca, ra))
                        if rb < cb:
                            nxt.append((rb, cb))
                cur = nxt
            row_runs.extend(cur)
        runs.extend((y, xa, xb) for xa, xb in row_runs)
    return runs


def burn_rings(
    out: np.ndarray,
    rings: list[np.ndarray],
    burn_value: float,
    merge_alg: str = "replace",
    all_touched: bool = False,
) -> int:
    """Burn one polygon into `out` (shape (H, W)); rings already in
    pixel coordinates of `out`. Returns burned-pixel count."""
    h, w = out.shape
    mask = np.zeros((h, w), dtype=bool)
    for y, xa, xb in fill_polygon_runs(rings, h):
        xa = max(xa, 0)
        xb = min(xb, w)
        if xb > xa:
            mask[y, xa:xb] = True
    if all_touched:
        mask |= all_touched_mask(rings, h, w)
    if merge_alg == "add":
        out[mask] += burn_value
    else:
        out[mask] = burn_value
    return int(mask.sum())


def rasterize_polygon(
    rings: list[np.ndarray],
    width: int,
    height: int,
    burn_value: float = 1.0,
    merge_alg: str = "replace",
    all_touched: bool = False,
    dtype=np.float64,
) -> np.ndarray:
    out = np.zeros((height, width), dtype=dtype)
    burn_rings(out, rings, burn_value, merge_alg, all_touched)
    return out


def all_touched_mask(rings: list[np.ndarray], height: int, width: int) -> np.ndarray:
    """Pixels any ring edge passes through (supercover traversal --
    the ALL_TOUCHED contract of GDALdllImageLineAllTouched)."""
    mask = np.zeros((height, width), dtype=bool)

    def mark(px: float, py: float) -> None:
        ix, iy = int(np.floor(px)), int(np.floor(py))
        if 0 <= ix < width and 0 <= iy < height:
            mask[iy, ix] = True

    for ring in rings:
        for (x0, y0), (x1, y1) in zip(ring[:-1], ring[1:]):
            n = int(max(abs(x1 - x0), abs(y1 - y0)) * 2) + 1
            ts = np.linspace(0.0, 1.0, n + 1)
            for t in ts:
                mark(x0 + t * (x1 - x0), y0 + t * (y1 - y0))
    return mask
