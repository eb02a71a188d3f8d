"""DEM 3x3 window operators (gdaldem semantics, vectorized numpy).

Window layout afWin[0..8] row-major, 0=NW, 4=center, 8=SE
(apps/gdaldem_lib.cpp). Formulas re-derived from:

- slope (Horn, degrees): dx = ((a+2d+g)-(c+2f+i))/ewres,
  dy = ((g+2h+i)-(a+2b+c))/nsres, atan(sqrt(dx^2+dy^2)/8) in degrees
  (gdaldem_lib.cpp:1345-1364)
- aspect (azimuth): dx2 = ((c+2f+i)-(a+2d+g)),
  dy2 = ((g+2h+i)-(a+2b+c)), atan2(dy2,-dx2) deg; flat -> nodata
  -9999; azimuth remap; 360 -> 0 (gdaldem_lib.cpp:1414-1449)
- TRI (Wilson): mean |neighbor - center|     (:2352)
- TPI: center - mean(8 neighbors)            (:2384)
- roughness: max - min over the 9 cells      (:2399)
- hillshade (Horn gradient, z=1, scale=1): byte
  1 + 254*max(0, (sin(alt) + y*cos(az)*cos(alt) - x*sin(az)*cos(alt))
  / sqrt(1 + x^2 + y^2)) with x=dx/8, y=dy/8 (:1001-1025; we use the
  exact a/sqrt(b), not the reference's fast-approx, so hillshade is
  test-verified rather than oracle-matched)
"""

from __future__ import annotations

import math

import numpy as np

ASPECT_NODATA = -9999.0


def _win(p: np.ndarray):
    """The 9 shifted views of a padded (H+2, W+2) array."""
    h, w = p.shape[0] - 2, p.shape[1] - 2
    return [p[dy : dy + h, dx : dx + w] for dy in range(3) for dx in range(3)]


def slope_horn(padded: np.ndarray, ewres: float = 1.0, nsres: float = 1.0) -> np.ndarray:
    a, b, c, d, _, f, g, hh, i = _win(padded)
    dx = ((a + 2 * d + g) - (c + 2 * f + i)) / ewres
    dy = ((g + 2 * hh + i) - (a + 2 * b + c)) / nsres
    return np.degrees(np.arctan(np.sqrt(dx * dx + dy * dy) / 8.0))


def aspect(padded: np.ndarray, azimuth: bool = True) -> np.ndarray:
    a, b, c, d, _, f, g, hh, i = _win(padded)
    dx = (c + 2 * f + i) - (a + 2 * d + g)
    dy = (g + 2 * hh + i) - (a + 2 * b + c)
    asp = np.degrees(np.arctan2(dy, -dx))
    if azimuth:
        asp = np.where(asp > 90.0, 450.0 - asp, 90.0 - asp)
    else:
        asp = np.where(asp < 0, asp + 360.0, asp)
    asp = np.where(asp == 360.0, 0.0, asp)
    return np.where((dx == 0) & (dy == 0), ASPECT_NODATA, asp)


def tri_wilson(padded: np.ndarray) -> np.ndarray:
    wins = _win(padded)
    center = wins[4]
    total = np.zeros_like(center, dtype=np.float64)
    for k in range(9):
        if k != 4:
            total += np.abs(wins[k] - center)
    return total / 8.0


def tpi(padded: np.ndarray) -> np.ndarray:
    wins = _win(padded)
    center = wins[4]
    s = sum(wins[k] for k in range(9) if k != 4)
    return center - s * 0.125


def roughness(padded: np.ndarray) -> np.ndarray:
    wins = np.stack(_win(padded))
    return wins.max(axis=0) - wins.min(axis=0)


def hillshade(
    padded: np.ndarray,
    azimuth_deg: float = 315.0,
    altitude_deg: float = 45.0,
    z_factor: float = 1.0,
    ewres: float = 1.0,
    nsres: float = 1.0,
) -> np.ndarray:
    a, b, c, d, _, f, g, hh, i = _win(padded)
    x = z_factor * ((a + 2 * d + g) - (c + 2 * f + i)) / (8.0 * ewres)
    y = z_factor * ((g + 2 * hh + i) - (a + 2 * b + c)) / (8.0 * nsres)
    az = math.radians(azimuth_deg)
    alt = math.radians(altitude_deg)
    cang = (
        math.sin(alt)
        - (y * math.cos(az) * math.cos(alt) - x * math.sin(az) * math.cos(alt))
    ) / np.sqrt(1.0 + x * x + y * y)
    out = np.where(cang <= 0.0, 1.0, 1.0 + 254.0 * cang)
    return np.clip(out, 1, 255).astype(np.uint8)


DEFAULT_RAMP = [
    (0.0, (0, 0, 255)),
    (100.0, (0, 255, 0)),
    (200.0, (255, 255, 0)),
    (255.0, (255, 0, 0)),
]


def color_relief(vals: np.ndarray, ramp=None) -> np.ndarray:
    """gdaldem color-relief linear interpolation
    (apps/gdaldem_lib.cpp:1756-1773): ratio between surrounding ramp
    entries, per-channel clamp(int(0.5 + lo + ratio*(hi-lo)), 0, 255);
    values outside the ramp clamp to the end entries."""
    ramp = ramp or DEFAULT_RAMP
    v = np.asarray(vals, dtype=np.float64)
    out = np.zeros(v.shape + (3,), dtype=np.uint8)
    lows = np.array([e[0] for e in ramp])
    for c in range(3):
        cols = np.array([e[1][c] for e in ramp], dtype=np.float64)
        res = np.empty(v.shape, dtype=np.float64)
        res[v <= lows[0]] = cols[0]
        res[v >= lows[-1]] = cols[-1]
        for i in range(1, len(ramp)):
            sel = (v > lows[i - 1]) & (v < lows[i])
            ratio = (v[sel] - lows[i - 1]) / (lows[i] - lows[i - 1])
            res[sel] = cols[i - 1] + ratio * (cols[i] - cols[i - 1])
        # exact-entry values take the entry color
        for i, lo in enumerate(lows):
            res[v == lo] = cols[i]
        out[..., c] = np.clip(np.floor(0.5 + res), 0, 255).astype(np.uint8)
    return out


KERNELS = {
    "slope": slope_horn,
    "aspect": aspect,
    "tri": tri_wilson,
    "tpi": tpi,
    "roughness": roughness,
    "hillshade": hillshade,
}
