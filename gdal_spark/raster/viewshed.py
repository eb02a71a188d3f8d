"""Viewshed (alg/viewshed/ semantics — Wang et al. reference-plane
propagation, the XDraw family GDAL's viewshed implements).

Pixels are processed in concentric Chebyshev rings outward from the
observer; for each pixel the sightline crosses the previous ring at
a fractional position between two adjacent ring pixels, and the
blocking slope there is linearly interpolated from their running
maxima (alg/viewshed/viewshed.cpp CalcHeightLine/CalcHeightDiagonal
interpolation idea). A pixel is visible iff its own slope to the
observer is >= that interpolated blocking slope; its running maximum
is max(own, interpolated). Earth curvature/refraction options are
not modeled (GDAL applies them as an elevation pre-adjustment).

Per-ring work is vectorized numpy; the ring recurrence is the only
sequential axis (ring k needs ring k-1), so a W x H viewshed costs
O(W*H) with max(W, H) tiny sequential steps.
"""

from __future__ import annotations

import numpy as np

__all__ = ["viewshed"]


def viewshed(
    dem: np.ndarray, ox: int, oy: int, observer_height: float = 2.0
) -> np.ndarray:
    """-> boolean visibility mask, same shape as dem (float array)."""
    h, w = dem.shape
    z0 = float(dem[oy, ox]) + observer_height
    yy, xx = np.mgrid[0:h, 0:w]
    dx = xx - ox
    dy = yy - oy
    dist = np.hypot(dx, dy)
    with np.errstate(divide="ignore", invalid="ignore"):
        slope = (dem - z0) / dist
    slope[oy, ox] = -np.inf
    maxs = np.full((h, w), -np.inf)
    vis = np.zeros((h, w), dtype=bool)
    vis[oy, ox] = True
    cheb = np.maximum(np.abs(dx), np.abs(dy))
    n_rings = int(cheb.max())
    for k in range(1, n_rings + 1):
        ys, xs = np.nonzero(cheb == k)
        if len(ys) == 0:
            continue
        # sightline crossing of ring k-1: obs + (k-1)/k * (p - obs)
        t = (k - 1.0) / k
        cx = ox + t * (xs - ox)
        cy = oy + t * (ys - oy)
        # interpolate between the two bracketing ring-(k-1) cells:
        # clamp the continuous crossing onto the ring square, then
        # blend its floor/ceil neighbors along the varying axis
        fx = np.floor(cx).astype(np.int64)
        fy = np.floor(cy).astype(np.int64)
        wx = cx - fx
        wy = cy - fy
        fx2 = np.minimum(fx + 1, w - 1)
        fy2 = np.minimum(fy + 1, h - 1)
        m00 = maxs[fy, fx]
        m01 = maxs[fy, fx2]
        m10 = maxs[fy2, fx]
        m11 = maxs[fy2, fx2]
        # the crossing always lies on a ring-(k-1) square edge, so one
        # of (wx, wy) is ~0 and this bilinear reduces to the linear
        # blend along that edge (float noise leaks negligible weight
        # onto the already-processed inner ring)
        with np.errstate(invalid="ignore"):
            # (-inf * 0 -> nan only in where-branches that are not
            # selected; the chosen branch is always finite or -inf)
            top = np.where(wx <= 0, m00, np.where(wx >= 1, m01, m00 * (1 - wx) + m01 * wx))
            bot = np.where(wx <= 0, m10, np.where(wx >= 1, m11, m10 * (1 - wx) + m11 * wx))
            block = np.where(wy <= 0, top, np.where(wy >= 1, bot, top * (1 - wy) + bot * wy))
        if k == 1:
            block = np.full_like(block, -np.inf)  # nothing blocks ring 1
        s = slope[ys, xs]
        vis[ys, xs] = s >= block
        maxs[ys, xs] = np.maximum(s, block)
    return vis
