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


def hillshade_combined(
    padded: np.ndarray,
    azimuth_deg: float = 315.0,
    altitude_deg: float = 45.0,
    z_factor: float = 1.0,
    ewres: float = 1.0,
    nsres: float = 1.0,
) -> np.ndarray:
    """gdaldem hillshade -combined (GDALHillshadeCombinedAlg,
    apps/gdaldem_lib.cpp:1140-1169): modulate the acos of the standard
    shade by slope, cang = 1 - acos(shade)*atan(|grad|)*4/pi^2.

    Returns FLOAT byte values (1 + 254*cang, or 1 where cang<=0);
    the checksum primitive applies GDAL's float->int +0.5 rounding.
    acos argument is clamped to [-1,1] (the reference feeds raw
    values to C acos; 1+1e-16 overshoots are measure-zero).
    """
    a, b, c, d, _, f, g, hh, i = _win(padded)
    x = z_factor * ((a + 2 * d + g) - (c + 2 * f + i)) / (8.0 * ewres)
    y = z_factor * ((g + 2 * hh + i) - (a + 2 * b + c)) / (8.0 * nsres)
    az = math.radians(azimuth_deg)
    alt = math.radians(altitude_deg)
    xx_plus_yy = x * x + y * y
    arg = (
        math.sin(alt)
        - (y * math.cos(az) * math.cos(alt) - x * math.sin(az) * math.cos(alt))
    ) / np.sqrt(1.0 + xx_plus_yy)
    cang = np.arccos(np.clip(arg, -1.0, 1.0))
    cang = 1.0 - cang * np.arctan(np.sqrt(xx_plus_yy)) * (4.0 / (math.pi * math.pi))
    return np.where(cang <= 0.0, 1.0, 1.0 + 254.0 * cang)


def hillshade_multidirectional(
    padded: np.ndarray,
    altitude_deg: float = 45.0,
    z_factor: float = 1.0,
    ewres: float = 1.0,
    nsres: float = 1.0,
) -> np.ndarray:
    """gdaldem hillshade -multidirectional (USGS OF 92-422;
    GDALHillshadeMultiDirectionalAlg, apps/gdaldem_lib.cpp:1235-1297):
    shade from az 225/270/315/360 weighted by sin^2(aspect - az); the
    USGS 0.5 factor is folded into the 127 (not 254) scale. Flat
    cells return 1 + 254*sin(alt) (the reference's quirk — full
    two-fold scale). Azimuth is fixed by the algorithm; alt only.
    """
    a, b, c, d, _, f, g, hh, i = _win(padded)
    x = z_factor * ((a + 2 * d + g) - (c + 2 * f + i)) / (8.0 * ewres)
    y = z_factor * ((g + 2 * hh + i) - (a + 2 * b + c)) / (8.0 * nsres)
    alt = math.radians(altitude_deg)
    sin_alt = math.sin(alt)
    cos_alt = math.cos(alt)
    cos225 = math.cos(math.radians(225.0))
    xx = x * x
    yy = y * y
    xx_plus_yy = xx + yy
    val225 = np.maximum(0.0, sin_alt + (x - y) * cos225 * cos_alt)
    val270 = np.maximum(0.0, sin_alt - x * cos_alt)
    val315 = np.maximum(0.0, sin_alt + (x + y) * cos225 * cos_alt)
    val360 = np.maximum(0.0, sin_alt - y * cos_alt)
    w225 = 0.5 * xx_plus_yy - x * y
    w270 = xx
    w315 = xx_plus_yy - w225
    w360 = yy
    denom = np.where(xx_plus_yy == 0.0, 1.0, xx_plus_yy)
    cang = 1.0 + 127.0 * (
        (w225 * val225 + w270 * val270 + w315 * val315 + w360 * val360) / denom
    ) / np.sqrt(1.0 + xx_plus_yy)
    return np.where(xx_plus_yy == 0.0, 1.0 + 254.0 * sin_alt, cang)


def _diff_angles(a1: np.ndarray, a2: float, normalizer: float) -> np.ndarray:
    """DifferenceBetweenAngles (apps/gdaldem_lib.cpp:930-940): C-fmod
    normalize both into [0, norm), |difference|, fold > norm/2."""
    n1 = np.fmod(a1, normalizer)
    n1 = np.where(n1 < 0, normalizer + n1, n1)
    n2 = math.fmod(a2, normalizer)
    if n2 < 0:
        n2 = normalizer + n2
    diff = np.abs(n1 - n2)
    return np.where(diff > normalizer / 2.0, normalizer - diff, diff)


def hillshade_igor(
    padded: np.ndarray,
    azimuth_deg: float = 315.0,
    z_factor: float = 1.0,
    ewres: float = 1.0,
    nsres: float = 1.0,
) -> np.ndarray:
    """gdaldem hillshade -igor (GDALHillshadeIgorAlg,
    apps/gdaldem_lib.cpp:943-1005): shadowness = 1 -
    (slope_deg/90) * (1 - angle_diff(aspect, 3pi/2 - az)/pi),
    scaled by 255. Altitude is ignored (the reference rejects -alt
    with -igor); aspect uses the UNSCALED Horn sums (no res, no z —
    the reference's quirk, kept).
    """
    a, b, c, d, _, f, g, hh, i = _win(padded)
    dx_raw = (a + 2 * d + g) - (c + 2 * f + i)
    dy_raw = (g + 2 * hh + i) - (a + 2 * b + c)
    x = z_factor * dx_raw / (8.0 * ewres)
    y = z_factor * dy_raw / (8.0 * nsres)
    slope_deg = np.degrees(np.arctan(np.sqrt(x * x + y * y)))
    aspect = np.arctan2(dy_raw, dx_raw)  # atan2(dy2, -dx2) with dx2 = -dx_raw
    az = math.radians(azimuth_deg)
    slope_strength = slope_deg / 90.0
    aspect_strength = 1.0 - _diff_angles(
        aspect, math.pi * 3.0 / 2.0 - az, math.pi * 2.0
    ) / math.pi
    return 255.0 * (1.0 - slope_strength * aspect_strength)


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
    "hillshade_combined": hillshade_combined,
    "hillshade_multidir": hillshade_multidirectional,
    "hillshade_igor": hillshade_igor,
}
