"""GCP polynomial transformers (alg/gdal_crs.cpp semantics).

The reference fits order-1/2/3 polynomial pixel->world maps from
ground control points by least squares (CRS_georef /
GDALCreateGCPTransformer) and applies them in the warp transformer
chain. Re-derived here as numpy normal-equation fits:

  order 1:  X = a0 + a1 px + a2 py            (6 coefficients)
  order 2:  X = a0 + a1 px + a2 py + a3 px^2 + a4 px py + a5 py^2
  order 3:  adds the 4 cubic terms per axis   (20 coefficients)

fit_gcp_polynomial returns per-axis coefficient vectors in that
monomial order; apply_gcp_polynomial evaluates them vectorized.
The inverse transform (world->pixel) is fitted the same way with
the roles swapped, exactly as CRS_compute_georef_equations fits
both directions from the same GCP set.
"""

from __future__ import annotations

import numpy as np

__all__ = ["poly_terms", "fit_gcp_polynomial", "apply_gcp_polynomial"]

_N_TERMS = {1: 3, 2: 6, 3: 10}


def poly_terms(px: np.ndarray, py: np.ndarray, order: int) -> np.ndarray:
    """Design matrix columns for the monomial basis of `order`."""
    cols = [np.ones_like(px), px, py]
    if order >= 2:
        cols += [px * px, px * py, py * py]
    if order >= 3:
        cols += [px**3, px * px * py, px * py * py, py**3]
    return np.stack(cols, axis=-1)


def fit_gcp_polynomial(
    gcp_px: np.ndarray,
    gcp_py: np.ndarray,
    gcp_x: np.ndarray,
    gcp_y: np.ndarray,
    order: int = 1,
) -> tuple[np.ndarray, np.ndarray]:
    """Least-squares fit of the order-N pixel->world polynomial from
    GCPs; -> (coef_x, coef_y), each of len N_TERMS. Needs at least
    N_TERMS control points (CRS_georef returns MNPTERR otherwise)."""
    n = _N_TERMS[order]
    if len(gcp_px) < n:
        raise ValueError(f"order-{order} fit needs >= {n} GCPs")
    A = poly_terms(
        np.asarray(gcp_px, dtype=np.float64),
        np.asarray(gcp_py, dtype=np.float64),
        order,
    )
    cx, *_ = np.linalg.lstsq(A, np.asarray(gcp_x, dtype=np.float64), rcond=None)
    cy, *_ = np.linalg.lstsq(A, np.asarray(gcp_y, dtype=np.float64), rcond=None)
    return cx, cy


def apply_gcp_polynomial(
    coef_x: np.ndarray,
    coef_y: np.ndarray,
    px: np.ndarray,
    py: np.ndarray,
) -> tuple[np.ndarray, np.ndarray]:
    order = {3: 1, 6: 2, 10: 3}[len(coef_x)]
    A = poly_terms(
        np.asarray(px, dtype=np.float64), np.asarray(py, dtype=np.float64), order
    )
    return A @ np.asarray(coef_x), A @ np.asarray(coef_y)
