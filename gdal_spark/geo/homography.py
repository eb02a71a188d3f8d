"""Homography transformer (alg/gdal_homography.cpp): projective
pixel->world map fit from >= 4 point correspondences by normalized
DLT, applied as x' = (h0 x + h1 y + h2) / (h6 x + h7 y + h8).

fit_homography returns the 3x3 matrix up to scale (h8-normalized
when h8 != 0); apply_homography evaluates it vectorized.
"""

from __future__ import annotations

import numpy as np

__all__ = ["fit_homography", "apply_homography"]


def fit_homography(
    src_x: np.ndarray, src_y: np.ndarray, dst_x: np.ndarray, dst_y: np.ndarray
) -> np.ndarray:
    """DLT least-squares homography from correspondences (N >= 4)."""
    sx = np.asarray(src_x, dtype=np.float64)
    sy = np.asarray(src_y, dtype=np.float64)
    dx = np.asarray(dst_x, dtype=np.float64)
    dy = np.asarray(dst_y, dtype=np.float64)
    n = len(sx)
    if n < 4:
        raise ValueError("homography fit needs >= 4 points")
    A = np.zeros((2 * n, 9))
    A[0::2, 0] = sx
    A[0::2, 1] = sy
    A[0::2, 2] = 1.0
    A[0::2, 6] = -dx * sx
    A[0::2, 7] = -dx * sy
    A[0::2, 8] = -dx
    A[1::2, 3] = sx
    A[1::2, 4] = sy
    A[1::2, 5] = 1.0
    A[1::2, 6] = -dy * sx
    A[1::2, 7] = -dy * sy
    A[1::2, 8] = -dy
    _, _, vt = np.linalg.svd(A)
    h = vt[-1].reshape(3, 3)
    if h[2, 2] != 0.0:
        h = h / h[2, 2]
    return h


def apply_homography(
    h: np.ndarray, x: np.ndarray, y: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    den = h[2, 0] * x + h[2, 1] * y + h[2, 2]
    return (
        (h[0, 0] * x + h[0, 1] * y + h[0, 2]) / den,
        (h[1, 0] * x + h[1, 1] * y + h[1, 2]) / den,
    )
