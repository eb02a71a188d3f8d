"""NTv2 grid-based datum shift — the PROJ hgridshift analog over the
.gsb grids that `gdal_spark/raster/ntv2.py` reads.

Semantics re-derived from the reference's NTv2 surface
(/root/reference/frmts/raw/ntv2dataset.cpp): shift values are
arc-seconds with longitude POSITIVE WEST (:492 positive_value=west),
node (0,0) at the grid's south-east corner (:64-67).  Application
semantics follow PROJ's hgridshift pipeline step (the engine GDAL
delegates to through OGRCoordinateTransformation, ogr/ogrct.cpp):

- forward:  lat' = lat + dlat/3600 ; lon' = lon - dlon_west/3600
- inverse:  fixed-point iteration s_{k+1} = t -/+ shift(s_k), 4
  rounds starting at the target point (PROJ gridshift inverse).
- bilinear interpolation inside the containing cell.
- subgrid selection: the FINEST (smallest lat_inc) subgrid whose
  bounds contain the point — child grids refine their parent.
- points outside every subgrid pass through unshifted and are
  flagged (`shifted` = false).

Scale shape: grid files are kilobyte-to-megabyte metadata (even the
full NTv2 France grid is ~4 MB) — they are broadcast once into the
Arrow-batched kernel closure; the per-row work is vectorized numpy
gathers, a narrow map with zero shuffle.
"""

from __future__ import annotations

from typing import Iterator, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from gdal_spark.raster.ntv2 import SubGrid


def _interp(g: SubGrid, lat: np.ndarray, lon: np.ndarray, inside: np.ndarray):
    """Bilinear shift sample (dlat_sec, dlon_west_sec) at east-positive
    degree coordinates; caller guarantees `inside` rows are in bounds."""
    la = np.where(inside, lat, 0.0)
    lo = np.where(inside, lon, 0.0)
    fy = (la * 3600.0 - g.s_lat) / g.lat_inc
    fx = (lo * 3600.0 - g.w_long) / g.long_inc
    a0 = np.clip(np.floor(fy).astype(np.int64), 0, g.ny - 2)
    b0 = np.clip(np.floor(fx).astype(np.int64), 0, g.nx - 2)
    wy = fy - a0
    wx = fx - b0
    def bil(arr):
        v00 = arr[a0, b0].astype(np.float64)
        v01 = arr[a0, b0 + 1].astype(np.float64)
        v10 = arr[a0 + 1, b0].astype(np.float64)
        v11 = arr[a0 + 1, b0 + 1].astype(np.float64)
        return (v00 * (1.0 - wx) + v01 * wx) * (1.0 - wy) + (
            v10 * (1.0 - wx) + v11 * wx
        ) * wy
    return bil(g.lat_shift), bil(g.lon_shift)


def _shift_once(grids: Sequence[SubGrid], lat, lon):
    """One forward shift sample against the finest containing subgrid.
    Returns (dlat_deg, dlon_east_deg, shifted_mask)."""
    order = sorted(range(len(grids)), key=lambda k: -grids[k].lat_inc)
    dlat = np.zeros_like(lat)
    dlon = np.zeros_like(lon)
    hit = np.zeros(lat.shape, dtype=bool)
    for k in order:  # coarse first; finer grids overwrite
        g = grids[k]
        inside = (
            (lat * 3600.0 >= g.s_lat)
            & (lat * 3600.0 <= g.n_lat)
            & (lon * 3600.0 >= g.w_long)
            & (lon * 3600.0 <= g.e_long)
        )
        if not inside.any():
            continue
        sla, slo = _interp(g, lat, lon, inside)
        dlat = np.where(inside, sla / 3600.0, dlat)
        dlon = np.where(inside, -slo / 3600.0, dlon)  # west-positive
        hit |= inside
    return dlat, dlon, hit


def apply_ntv2(
    df: DataFrame,
    grids: Sequence[SubGrid],
    lat_col: str = "lat",
    lon_col: str = "lon",
    inverse: bool = False,
    iterations: int = 4,
) -> DataFrame:
    """Apply the grid shift to every row; appends `lat_out`, `lon_out`
    (double) and `shifted` (boolean).  Arrow-batched narrow map."""
    glist = list(grids)
    fields = df.schema.fields + [
        T.StructField("lat_out", T.DoubleType()),
        T.StructField("lon_out", T.DoubleType()),
        T.StructField("shifted", T.BooleanType()),
    ]
    schema = T.StructType(fields)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            lat = pdf[lat_col].to_numpy(dtype=np.float64)
            lon = pdf[lon_col].to_numpy(dtype=np.float64)
            if not inverse:
                dlat, dlon, hit = _shift_once(glist, lat, lon)
                lat_o, lon_o = lat + dlat, lon + dlon
            else:
                # fixed-point: s_{k+1} = t - d(s_k), s_0 = t
                lat_o, lon_o = lat.copy(), lon.copy()
                hit = np.zeros(lat.shape, dtype=bool)
                for _ in range(iterations):
                    dlat, dlon, hit = _shift_once(glist, lat_o, lon_o)
                    lat_o = lat - dlat
                    lon_o = lon - dlon
                lat_o = np.where(hit, lat_o, lat)
                lon_o = np.where(hit, lon_o, lon)
            out = pdf.copy()
            out["lat_out"] = np.where(hit, lat_o, lat)
            out["lon_out"] = np.where(hit, lon_o, lon)
            out["shifted"] = hit
            yield out

    return df.mapInPandas(kernel, schema=schema)
