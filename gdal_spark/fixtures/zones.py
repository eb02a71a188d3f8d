"""Materialize the zones polygon table (analog of the reference's
poly.shp + eas_id SQL fixture, autotest/ogr/ogr_sql_test.py).

Scalar zone parameters are Column math (SQL-oracle-able); the WKB
geometry column is built in a vectorized pandas UDF from those
parameters. Envelope columns are first-class (the bbox-prefilter
ladder, ogrlayer.cpp:2253-2325) so Parquet min/max pruning and the
cell join never touch WKB.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from gdal_spark.fixtures import georef
from gdal_spark.geo.wkb import wkb_polygon


def zone_rings(fid: int) -> list[np.ndarray]:
    """Closed-form ring coordinates for zone `fid` (degrees)."""
    j = fid + georef.ZONE_OFFSET
    v1 = (j * georef.LCG_A + georef.LCG_C) % georef.LCG_M
    v2 = (v1 * georef.LCG_A + georef.LCG_C) % georef.LCG_M
    lon0 = -150.0 + 300.0 * v1 / georef.LCG_M
    lat0 = -70.0 + 140.0 * v2 / georef.LCG_M
    k = 5 + fid % 4
    r = 0.5 + (fid % 7) * 0.3
    theta = 2.0 * math.pi * np.arange(k + 1) / k  # closed, CCW
    outer = np.column_stack([lon0 + r * np.cos(theta), lat0 + r * np.sin(theta)])
    rings = [outer]
    if fid % 10 == 0:
        hr = 0.4 * r
        # hole wound CW (reverse order)
        inner = np.column_stack(
            [lon0 + hr * np.cos(theta[::-1]), lat0 + hr * np.sin(theta[::-1])]
        )
        rings.append(inner)
    return rings


@F.pandas_udf(T.BinaryType())
def _zone_wkb(fid: pd.Series) -> pd.Series:
    return fid.map(lambda f: wkb_polygon(zone_rings(int(f))))


def build_zones(spark: SparkSession, n: int | None = None, ids_df: DataFrame | None = None) -> DataFrame:
    if ids_df is None:
        assert n is not None
        ids_df = spark.range(n).withColumnRenamed("id", "fid")
    df = georef.with_zone_geo(ids_df, "fid")
    return df.withColumn("geometry", _zone_wkb(F.col("fid")))
