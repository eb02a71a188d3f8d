"""Histogram equalization — the reference's gdalenhance app.

Semantics re-derived from /root/reference/apps/gdalenhance.cpp
(ComputeEqualizationLUTs + EnhancerCallback), Byte default
histogram (256 bins over [-0.5, 255.5], so bin == value):

- the FIRST and LAST histogram bins are zeroed before anything else
  ("zero out extremes (nodata, etc)");
- cumulative histogram: cum[i] = total_so_far + hist[i] / 2
  (integer division);
- LUT[i] = clamp((cum[i] * nLUTBins) / nTotal, 0, nLUTBins - 1),
  all integer divisions (nTotal forced to >= 1);
- output pixel = LUT[value].

Everything is integer, so the DuckDB twin matches bit-for-bit.
"""

from __future__ import annotations

import numpy as np

__all__ = ["equalize_lut", "equalize_u8"]


def equalize_lut(hist: np.ndarray, n_lut_bins: int = 256) -> np.ndarray:
    hist = np.asarray(hist, dtype=np.int64).copy()
    n = len(hist)
    hist[0] = 0
    hist[-1] = 0
    total = max(int(hist.sum()), 1)
    cum = np.concatenate([[0], np.cumsum(hist)[:-1]]) + hist // 2
    idx = (np.arange(n_lut_bins, dtype=np.int64) * n) // n_lut_bins
    lut = (cum[idx] * n_lut_bins) // total
    return np.clip(lut, 0, n_lut_bins - 1).astype(np.int64)


def equalize_u8(arr: np.ndarray) -> np.ndarray:
    """(H,W) uint8 -> equalized (H,W) int64 via the 256-bin LUT."""
    arr = np.asarray(arr)
    hist = np.bincount(arr.ravel(), minlength=256)
    return equalize_lut(hist)[arr]
