"""Thin-plate spline transformer (alg/thinplatespline.cpp
VizGeorefSpline2D semantics).

Fit: solve the classic TPS linear system for each output dimension —

    [ K  P ] [w]   [v]        K_ij = U(|p_i - p_j|),  U(r) = r^2 ln(r^2)
    [ P' 0 ] [a] = [0]        P_i  = (1, x_i, y_i)

(the reference's radial basis is u = r^2 * log(r^2),
thinplatespline.cpp base_func) — then evaluate

    f(x, y) = a0 + a1 x + a2 y + sum_i w_i U(|p_i - (x, y)|).

TPS interpolates the control points exactly and reproduces any
affine field exactly (the warp weights solve to zero), which is the
closed-form anchor the oracle uses.
"""

from __future__ import annotations

import numpy as np

__all__ = ["fit_tps", "apply_tps"]


def _u(r2: np.ndarray) -> np.ndarray:
    with np.errstate(divide="ignore", invalid="ignore"):
        out = r2 * np.log(r2)
    return np.where(r2 == 0.0, 0.0, out)


def fit_tps(
    px: np.ndarray, py: np.ndarray, values: np.ndarray
) -> dict[str, np.ndarray]:
    """Fit one TPS surface through (px, py) -> values."""
    px = np.asarray(px, dtype=np.float64)
    py = np.asarray(py, dtype=np.float64)
    v = np.asarray(values, dtype=np.float64)
    n = len(px)
    dx = px[:, None] - px[None, :]
    dy = py[:, None] - py[None, :]
    K = _u(dx * dx + dy * dy)
    P = np.column_stack([np.ones(n), px, py])
    A = np.zeros((n + 3, n + 3))
    A[:n, :n] = K
    A[:n, n:] = P
    A[n:, :n] = P.T
    b = np.concatenate([v, np.zeros(3)])
    sol = np.linalg.solve(A, b)
    return {"px": px, "py": py, "w": sol[:n], "a": sol[n:]}


def apply_tps(model: dict, x: np.ndarray, y: np.ndarray) -> np.ndarray:
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    dx = x[:, None] - model["px"][None, :]
    dy = y[:, None] - model["py"][None, :]
    rad = _u(dx * dx + dy * dy) @ model["w"]
    a = model["a"]
    return a[0] + a[1] * x + a[2] * y + rad
