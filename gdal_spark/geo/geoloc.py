"""Geolocation-array transformer (the missing transformer-zoo member).

Semantics re-derived from /root/reference/alg/gdalgeoloc.cpp
(GDALCreateGeoLocTransformer; conformance surface
/root/reference/autotest/alg/transformgeoloc.py):

- GEOLOCATION metadata binds two 2-D arrays GEOLOC_LON / GEOLOC_LAT
  to the source pixel grid through PIXEL_OFFSET / LINE_OFFSET /
  PIXEL_STEP / LINE_STEP: geoloc-grid coords are
  gx = (pixel - PIXEL_OFFSET) / PIXEL_STEP (gdalgeoloc.cpp
  PixelLineToXY).
- FORWARD (pixel/line -> lon/lat): bilinear interpolation of the
  four surrounding geoloc nodes (clamped at the grid edge).
- INVERSE (lon/lat -> pixel/line): gdalgeoloc builds a BACKMAP —
  a regular target-space grid (oversampled ~1.3x) into which every
  geoloc node scatters its (pixel, line), averaged per cell, holes
  filled from neighbors — then bilinear-samples it
  (GDALGeoLoc*::GenerateBackMap).  Same algorithm here; the backmap
  is metadata-sized (ny*nx nodes), so both directions broadcast to
  executors as plain numpy arrays and run as narrow maps (the
  ntv2_shift pattern — no shuffle).

The forward path is bit-reproducible (fixtures/geolocfix.py builds
the node arrays from a closed form with a DuckDB twin); the backmap
inverse is approximate by construction (the reference's is too) and
is pinned by pytest roundtrip bounds instead of a SQL oracle.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T


@dataclass(frozen=True)
class GeolocArrays:
    lon: np.ndarray  # (ny, nx)
    lat: np.ndarray  # (ny, nx)
    pixel_offset: float = 0.0
    line_offset: float = 0.0
    pixel_step: float = 1.0
    line_step: float = 1.0


def _bilinear(arr: np.ndarray, gx: np.ndarray, gy: np.ndarray) -> np.ndarray:
    ny, nx = arr.shape
    i0 = np.clip(np.floor(gx).astype(np.int64), 0, nx - 2)
    j0 = np.clip(np.floor(gy).astype(np.int64), 0, ny - 2)
    fx = gx - i0
    fy = gy - j0
    n00 = arr[j0, i0]
    n10 = arr[j0, i0 + 1]
    n01 = arr[j0 + 1, i0]
    n11 = arr[j0 + 1, i0 + 1]
    # weight form, left-to-right — mirrored by the SQL twin
    return (
        n00 * (1.0 - fx) * (1.0 - fy)
        + n10 * fx * (1.0 - fy)
        + n01 * (1.0 - fx) * fy
        + n11 * fx * fy
    )


def geoloc_forward(g: GeolocArrays, pixel, line):
    """(pixel, line) -> (lon, lat) by bilinear sample of the arrays."""
    px = np.asarray(pixel, dtype=np.float64)
    ln = np.asarray(line, dtype=np.float64)
    gx = (px - g.pixel_offset) / g.pixel_step
    gy = (ln - g.line_offset) / g.line_step
    return _bilinear(g.lon, gx, gy), _bilinear(g.lat, gx, gy)


# ---------------------------------------------------------------------------
# backmap inverse (gdalgeoloc.cpp GenerateBackMap)
# ---------------------------------------------------------------------------

def build_backmap(g: GeolocArrays, oversample: float = 1.3):
    """-> (bm_px, bm_ln, lon0, lat0, dlon, dlat): regular lon/lat grid
    holding source pixel/line, nodes scattered + averaged, holes
    filled by iterated 3x3 neighbor means."""
    ny, nx = g.lon.shape
    bw = max(4, int(nx * oversample))
    bh = max(4, int(ny * oversample))
    lon0, lon1 = float(g.lon.min()), float(g.lon.max())
    lat0, lat1 = float(g.lat.min()), float(g.lat.max())
    dlon = (lon1 - lon0) / (bw - 1)
    dlat = (lat1 - lat0) / (bh - 1)
    acc_px = np.zeros((bh, bw), dtype=np.float64)
    acc_ln = np.zeros((bh, bw), dtype=np.float64)
    cnt = np.zeros((bh, bw), dtype=np.int64)
    jj, ii = np.meshgrid(np.arange(ny), np.arange(nx), indexing="ij")
    # node and midpoint scatter (the reference also densifies)
    for sub in (1, 2):
        t = np.linspace(0, 1, sub + 1)[:-1] if sub > 1 else np.array([0.0])
        for dy in t:
            for dx in t:
                gj = np.clip(jj + dy, 0, ny - 1.0)
                gi = np.clip(ii + dx, 0, nx - 1.0)
                lo = _bilinear(g.lon, gi.ravel(), gj.ravel())
                la = _bilinear(g.lat, gi.ravel(), gj.ravel())
                px = g.pixel_offset + gi.ravel() * g.pixel_step
                ln = g.line_offset + gj.ravel() * g.line_step
                bx = np.clip(np.rint((lo - lon0) / dlon).astype(np.int64), 0, bw - 1)
                by = np.clip(np.rint((la - lat0) / dlat).astype(np.int64), 0, bh - 1)
                np.add.at(acc_px, (by, bx), px)
                np.add.at(acc_ln, (by, bx), ln)
                np.add.at(cnt, (by, bx), 1)
    filled = cnt > 0
    bm_px = np.where(filled, acc_px / np.maximum(cnt, 1), np.nan)
    bm_ln = np.where(filled, acc_ln / np.maximum(cnt, 1), np.nan)
    # hole fill: iterated neighbor means (gdalgeoloc's loop)
    for _ in range(bw + bh):
        holes = np.isnan(bm_px)
        if not holes.any():
            break
        for bm in (bm_px, bm_ln):
            padded = np.pad(bm, 1, constant_values=np.nan)
            stacks = [
                padded[1 + dy : 1 + dy + bh, 1 + dx : 1 + dx + bw]
                for dy in (-1, 0, 1) for dx in (-1, 0, 1)
                if (dy, dx) != (0, 0)
            ]
            st = np.stack(stacks)
            ok = ~np.isnan(st)
            cnt2 = ok.sum(axis=0)
            tot = np.where(ok, st, 0.0).sum(axis=0)
            mean = np.where(cnt2 > 0, tot / np.maximum(cnt2, 1), np.nan)
            bm[holes] = mean[holes]
    return bm_px, bm_ln, lon0, lat0, dlon, dlat


def geoloc_inverse(g: GeolocArrays, lon, lat, backmap=None, refine: int = 3):
    """(lon, lat) -> (pixel, line): bilinear backmap seed, then
    Newton refinement through the forward transform (the reference's
    backmap update/refinement loop) — sub-pixel for smooth warps."""
    if backmap is None:
        backmap = build_backmap(g)
    bm_px, bm_ln, lon0, lat0, dlon, dlat = backmap
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    gx = (lon - lon0) / dlon
    gy = (lat - lat0) / dlat
    px = _bilinear(bm_px, gx, gy)
    ln = _bilinear(bm_ln, gx, gy)
    eps = 0.5
    for _ in range(refine):
        lo, la = geoloc_forward(g, px, ln)
        lo_p, la_p = geoloc_forward(g, px + eps, ln)
        lo_l, la_l = geoloc_forward(g, px, ln + eps)
        a = (lo_p - lo) / eps
        b = (lo_l - lo) / eps
        c = (la_p - la) / eps
        d = (la_l - la) / eps
        det = a * d - b * c
        safe = np.abs(det) > 1e-30
        inv_det = np.where(safe, 1.0 / np.where(safe, det, 1.0), 0.0)
        px = px + (d * (lon - lo) - b * (lat - la)) * inv_det
        ln = ln + (-c * (lon - lo) + a * (lat - la)) * inv_det
    return px, ln


def apply_geoloc(
    pts: DataFrame,
    g: GeolocArrays,
    px_col: str = "px",
    ln_col: str = "ln",
) -> DataFrame:
    """DataFrame forward transform: broadcast the metadata-sized
    arrays in the task closure, narrow mapInPandas — no shuffle."""
    lon_arr = g.lon
    lat_arr = g.lat
    po, lo_, ps, ls = (g.pixel_offset, g.line_offset,
                       g.pixel_step, g.line_step)
    out_schema = T.StructType(
        pts.schema.fields
        + [T.StructField("lon", T.DoubleType()),
           T.StructField("lat", T.DoubleType())]
    )
    gg = GeolocArrays(lon_arr, lat_arr, po, lo_, ps, ls)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            lon, lat = geoloc_forward(
                gg, pdf[px_col].to_numpy(np.float64),
                pdf[ln_col].to_numpy(np.float64),
            )
            out = pdf.copy()
            out["lon"] = lon
            out["lat"] = lat
            yield out

    return pts.mapInPandas(kernel, out_schema)
