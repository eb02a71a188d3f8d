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


def match_lut(src_hist: np.ndarray, ref_hist: np.ndarray) -> np.ndarray:
    """Histogram MATCHING (radiometric normalization of a mosaic /
    training corpus to a reference frame — the classic CDF-matching
    rule): LUT[v] = the smallest u whose reference CDF reaches the
    source CDF at v,

        LUT[v] = min { u : cdf_ref[u] * n_src >= cdf_src[v] * n_ref }

    cross-multiplied so everything stays EXACT integer (no float
    quantiles); falls back to the last bin when the reference CDF
    never reaches (only possible at v with cdf_src[v] = n_src and
    trailing zero reference bins — still covered since
    cdf_ref[-1] = n_ref)."""
    s = np.asarray(src_hist, dtype=np.int64)
    r = np.asarray(ref_hist, dtype=np.int64)
    if len(s) != len(r):
        raise ValueError("match_lut: histogram sizes differ")
    cs = np.cumsum(s)
    cr = np.cumsum(r)
    n_src = int(cs[-1])
    n_ref = int(cr[-1])
    # smallest u with cr[u] * n_src >= cs[v] * n_ref
    lut = np.searchsorted(cr * n_src, cs * n_ref, side="left")
    return np.minimum(lut, len(r) - 1).astype(np.int64)


def match_u8(src: np.ndarray, ref: np.ndarray) -> np.ndarray:
    """(H,W) uint8 source matched to a reference image's histogram."""
    src = np.asarray(src)
    lut = match_lut(
        np.bincount(src.ravel(), minlength=256),
        np.bincount(np.asarray(ref).ravel(), minlength=256),
    )
    return lut[src]
