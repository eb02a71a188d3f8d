"""RGB -> palette: median-cut palette + error-diffusion dither.

- median_cut_palette: alg/gdalmediancut.cpp structure — build the
  5-bit-per-channel RGB histogram, then recursively split the
  occupied color box with the most pixels along its longest axis at
  the pixel-count median, until `n_colors` boxes remain; each box
  emits its pixel-weighted mean color.
- dither_rgb2pct: alg/gdaldither.cpp:395-548 error diffusion,
  replicated quirk-for-quirk: per channel, error = value -
  palette[idx], sixth = C-TRUNCATED error/6; next-row slots get
  [i-1] += sixth, [i] += error - 5*sixth, [i+1] = sixth (ASSIGNED,
  overwriting accumulation — the reference does exactly this), and
  the same-row carry to the next pixel is 2*sixth. Nearest color =
  min squared RGB distance, FIRST index winning ties
  (FindNearestColor's strict < update).

Sequential per image (error diffusion is order-dependent), so this
op is pytest-verified rather than SQL-oracled — the one operator
class where a declarative twin cannot exist.
"""

from __future__ import annotations

import numpy as np

__all__ = ["median_cut_palette", "dither_rgb2pct"]


def median_cut_palette(rgb: np.ndarray, n_colors: int = 256) -> np.ndarray:
    """rgb: (h, w, 3) uint8 -> (n, 3) uint8 palette (n <= n_colors)."""
    q = (rgb.astype(np.int64) >> 3).reshape(-1, 3)  # 5-bit histogram
    codes = (q[:, 0] << 10) | (q[:, 1] << 5) | q[:, 2]
    uniq, counts = np.unique(codes, return_counts=True)
    cols = np.stack([(uniq >> 10) & 31, (uniq >> 5) & 31, uniq & 31], axis=1)
    boxes = [(cols, counts)]
    while len(boxes) < n_colors:
        # split the box with the most pixels that still has >1 color
        sizes = [c.sum() if len(cl) > 1 else -1 for cl, c in boxes]
        bi = int(np.argmax(sizes))
        if sizes[bi] <= 0:
            break
        cl, c = boxes.pop(bi)
        axis = int(np.argmax(cl.max(axis=0) - cl.min(axis=0)))
        order = np.argsort(cl[:, axis], kind="stable")
        cl, c = cl[order], c[order]
        cum = np.cumsum(c)
        half = cum[-1] / 2.0
        cut = int(np.searchsorted(cum, half)) + 1
        cut = min(max(cut, 1), len(cl) - 1)
        boxes.append((cl[:cut], c[:cut]))
        boxes.append((cl[cut:], c[cut:]))
    pal = []
    for cl, c in boxes:
        w = c.astype(np.float64)
        mean = (cl * w[:, None]).sum(axis=0) / w.sum()
        pal.append(np.minimum(255, (mean * 8 + 4)).astype(np.uint8))
    return np.asarray(pal, dtype=np.uint8)


def _c_div6(e: int) -> int:
    """C-truncated integer division by 6 (toward zero)."""
    return -((-e) // 6) if e < 0 else e // 6


def dither_rgb2pct(rgb: np.ndarray, palette: np.ndarray) -> np.ndarray:
    """-> (h, w) uint8 palette indices (GDALDitherRGB2PCT kernel)."""
    h, w, _ = rgb.shape
    pal = palette.astype(np.int64)
    out = np.zeros((h, w), dtype=np.uint8)
    err = np.zeros((w + 2, 3), dtype=np.int64)  # +3-offset analog
    nearest: dict[tuple, int] = {}
    for y in range(h):
        row_err = err
        err = np.zeros((w + 2, 3), dtype=np.int64)
        last = [0, 0, 0]
        for i in range(w):
            # reference order: the scanline pre-pass stores
            # clamp(raw + accumulated-line error) as a byte
            # (gdaldither.cpp:383-389), then the pixel loop clamps
            # AGAIN after adding the 2*sixth same-row carry (:407).
            # Two separate clamps — saturated pixels with
            # opposite-sign carries differ if combined into one.
            vals = []
            for c in range(3):
                v1 = max(0, min(255, int(rgb[y, i, c]) + int(row_err[i + 1, c])))
                vals.append(max(0, min(255, v1 + last[c])))
            key = tuple(vals)
            idx = nearest.get(key)
            if idx is None:
                d = ((pal - np.asarray(vals)) ** 2).sum(axis=1)
                idx = int(np.argmin(d))  # argmin: first min wins
                nearest[key] = idx
            out[y, i] = idx
            for c in range(3):
                e = vals[c] - int(pal[idx, c])
                sixth = _c_div6(e)
                err[i, c] += sixth              # next row, col i-1
                err[i + 2, c] = sixth           # next row, col i+1 (ASSIGN)
                err[i + 1, c] += e - 5 * sixth  # next row, col i
                last[c] = 2 * sixth
    return out
