"""RPC (rational polynomial coefficient) transformer
(alg/gdal_rpc.cpp RPCTransformPoint semantics).

Forward map (geo -> image): normalize (long, lat, height) by the
RPC offsets/scales, evaluate the four 20-term cubic polynomials in
the EXACT term order of RPCComputeTerms (gdal_rpc.cpp:
1, L, P, H, LP, LH, PH, L2, P2, H2, LPH, L3, LP2, LH2, L2P, P3,
PH2, L2H, P2H, H3 with L=long, P=lat, H=height), then

    pixel = (samp_num/samp_den) * samp_scale + samp_off
    line  = (line_num/line_den) * line_scale + line_off

The inverse (image -> geo) is the reference's iterative refinement:
start from the offset center and Newton-update with a numerically
differenced Jacobian (GDALRPCTransform bDstToSrc path).
"""

from __future__ import annotations

import numpy as np

__all__ = ["rpc_terms", "rpc_forward", "rpc_inverse"]


def rpc_terms(lon: np.ndarray, lat: np.ndarray, h: np.ndarray) -> np.ndarray:
    """(N, 20) monomials in RPCComputeTerms order (inputs already
    normalized)."""
    L, P, H = lon, lat, h
    return np.stack(
        [
            np.ones_like(L), L, P, H, L * P, L * H, P * H, L * L, P * P,
            H * H, L * P * H, L**3, L * P * P, L * H * H, L * L * P, P**3,
            P * H * H, L * L * H, P * P * H, H**3,
        ],
        axis=-1,
    )


def rpc_forward(
    coefs: dict[str, np.ndarray | float],
    lon: np.ndarray,
    lat: np.ndarray,
    height: np.ndarray | float = 0.0,
) -> tuple[np.ndarray, np.ndarray]:
    """(pixel, line) for geodetic inputs. `coefs` carries the RPC00B
    fields: {long,lat,height,samp,line}_{off,scale} scalars and
    {samp,line}_{num,den}_coeff 20-vectors."""
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    height = np.broadcast_to(np.asarray(height, dtype=np.float64), lon.shape)
    L = (lon - coefs["long_off"]) / coefs["long_scale"]
    P = (lat - coefs["lat_off"]) / coefs["lat_scale"]
    H = (height - coefs["height_off"]) / coefs["height_scale"]
    t = rpc_terms(L, P, H)
    samp = (t @ np.asarray(coefs["samp_num_coeff"])) / (
        t @ np.asarray(coefs["samp_den_coeff"])
    )
    line = (t @ np.asarray(coefs["line_num_coeff"])) / (
        t @ np.asarray(coefs["line_den_coeff"])
    )
    return (
        samp * coefs["samp_scale"] + coefs["samp_off"],
        line * coefs["line_scale"] + coefs["line_off"],
    )


def rpc_inverse(
    coefs: dict,
    pixel: np.ndarray,
    line: np.ndarray,
    height: np.ndarray | float = 0.0,
    n_iter: int = 10,
) -> tuple[np.ndarray, np.ndarray]:
    """Iterative image->geo inversion (gdal_rpc.cpp dst-to-src):
    Newton steps with a finite-difference Jacobian from the center."""
    pixel = np.asarray(pixel, dtype=np.float64)
    line = np.asarray(line, dtype=np.float64)
    lon = np.full_like(pixel, float(coefs["long_off"]))
    lat = np.full_like(pixel, float(coefs["lat_off"]))
    eps_l = float(coefs["long_scale"]) * 1e-7
    eps_p = float(coefs["lat_scale"]) * 1e-7
    for _ in range(n_iter):
        px0, ln0 = rpc_forward(coefs, lon, lat, height)
        dpx = pixel - px0
        dln = line - ln0
        pxl, lnl = rpc_forward(coefs, lon + eps_l, lat, height)
        pxp, lnp = rpc_forward(coefs, lon, lat + eps_p, height)
        j00 = (pxl - px0) / eps_l
        j01 = (pxp - px0) / eps_p
        j10 = (lnl - ln0) / eps_l
        j11 = (lnp - ln0) / eps_p
        det = j00 * j11 - j01 * j10
        det = np.where(det == 0, 1.0, det)
        lon = lon + (j11 * dpx - j01 * dln) / det
        lat = lat + (-j10 * dpx + j00 * dln) / det
    return lon, lat
