"""Materialize the sites point table (kNN query side)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from gdal_spark.fixtures import georef


def build_sites(spark: SparkSession, n: int | None = None, ids_df: DataFrame | None = None) -> DataFrame:
    if ids_df is None:
        assert n is not None
        ids_df = spark.range(n).withColumnRenamed("id", "i")
    return georef.with_site_geo(ids_df, "i")
