"""Approximate transformer — GDALApproxTransformer re-derived
(alg/gdaltransformer.cpp GDALApproxTransform; default warp behavior
with -et 0.125): evaluate the exact transform only at scanline
endpoints and midpoints, interpolate linearly where the midpoint
error is within the threshold, subdivide where it is not.

The reference subdivides one scanline recursively; this engine keeps
the same contract but runs ALL active segments' midpoints through the
exact transform in ONE vectorized call per depth level — the warp's
per-tile kernels stay Arrow/numpy-batch shaped, and a smooth
transform (TPS over a tile, RPC away from terrain breaks) costs
O(log W) exact-batch calls instead of W point evaluations.

`exact_tf(xs, ys) -> (X, Y)` is any vectorized transformer from the
zoo (tps/rpc/gcp/geoloc/projzoo.reproject).  Accuracy contract: the
returned coordinates differ from exact by <= threshold AT THE PROBED
MIDPOINTS; between probes the deviation is bounded by the same
threshold for transforms whose second derivative does not flip sign
within a segment (the reference's documented caveat — it is an
APPROXIMATION, identical failure mode)."""

from __future__ import annotations

import numpy as np

__all__ = ["approx_transform_row", "ApproxStats"]


class ApproxStats:
    """Exact-call accounting (tests assert the win)."""

    __slots__ = ("exact_points", "batches")

    def __init__(self) -> None:
        self.exact_points = 0
        self.batches = 0


def approx_transform_row(
    exact_tf,
    y: float,
    x0: int,
    x1: int,
    threshold: float = 0.125,
    max_depth: int = 32,
    stats: ApproxStats | None = None,
):
    """Transform the integer-x scanline [x0, x1] at row y.

    Returns (X, Y) float64 arrays of length x1-x0+1.  Exact values
    land at every probed point; everything else linearly interpolates
    between the nearest probes once their midpoint error passes the
    threshold test."""
    n = x1 - x0 + 1
    xs_out = np.empty(n, dtype=np.float64)
    ys_out = np.empty(n, dtype=np.float64)

    def tf(xs: np.ndarray):
        if stats is not None:
            stats.exact_points += len(xs)
            stats.batches += 1
        return exact_tf(xs.astype(np.float64),
                        np.full(len(xs), float(y), dtype=np.float64))

    if n <= 3:
        X, Y = tf(np.arange(x0, x1 + 1, dtype=np.float64))
        return np.asarray(X, dtype=np.float64), np.asarray(Y, dtype=np.float64)

    ends = np.array([x0, x1], dtype=np.float64)
    EX, EY = tf(ends)
    # known[x-offset] = exact value; segments = (lo, hi) index pairs
    xs_out[0], ys_out[0] = EX[0], EY[0]
    xs_out[-1], ys_out[-1] = EX[1], EY[1]
    exact_at = {0: (float(EX[0]), float(EY[0])),
                n - 1: (float(EX[1]), float(EY[1]))}
    segments = [(0, n - 1)]
    for _ in range(max_depth):
        need = [s for s in segments if s[1] - s[0] > 1]
        if not need:
            break
        mids = np.array([(lo + hi) // 2 for lo, hi in need],
                        dtype=np.int64)
        MX, MY = tf(mids.astype(np.float64) + x0)
        next_segments = []
        for (lo, hi), mid, mx, my in zip(need, mids, MX, MY):
            lx, ly = exact_at[lo]
            hx, hy = exact_at[hi]
            t = (mid - lo) / (hi - lo)
            ix = lx + t * (hx - lx)
            iy = ly + t * (hy - ly)
            exact_at[int(mid)] = (float(mx), float(my))
            if abs(ix - mx) <= threshold and abs(iy - my) <= threshold:
                # interpolate the whole segment off its exact probes
                for a, b in ((lo, mid), (mid, hi)):
                    ax, ay = exact_at[a]
                    bx, by = exact_at[b]
                    idx = np.arange(a, b + 1)
                    tt = (idx - a) / max(b - a, 1)
                    xs_out[idx] = ax + tt * (bx - ax)
                    ys_out[idx] = ay + tt * (by - ay)
            else:
                next_segments.append((lo, int(mid)))
                next_segments.append((int(mid), hi))
        segments = next_segments
    # any segment still open after max_depth: exact-fill (loud would
    # break warp streaming; the reference interpolates regardless —
    # exact-fill is strictly more accurate)
    for lo, hi in segments:
        if hi - lo > 1:
            idx = np.arange(lo, hi + 1)
            X, Y = tf(idx.astype(np.float64) + x0)
            xs_out[idx] = X
            ys_out[idx] = Y
        else:
            for k in (lo, hi):
                if k in exact_at:
                    xs_out[k], ys_out[k] = exact_at[k]
    return xs_out, ys_out
