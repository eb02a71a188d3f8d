"""CSV-with-geometry source/sink — the reference's CSV driver in its
WKT-column mode (ogr/ogrsf_frmts/csv/ogrcsvlayer.cpp: a column named
WKT, or any column matched by GEOM_POSSIBLE_NAMES, parses as WKT
geometry; everything else is typed per the autodetect/declared
schema).

- write: single .csv funnel (header + quoted rows via the stdlib csv
  writer), STREAMING df.toLocalIterator() — driver memory stays
  O(one Spark partition). WKT text is repr-exact, so float64
  coordinates round-trip bit-for-bit.
- read: fully DISTRIBUTED — Spark's native CSV scan (splittable,
  predicate/column pruning apply to the attribute columns) followed
  by an Arrow-batched WKT -> WKB parse.
"""

from __future__ import annotations

import csv

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["write_csv_wkt", "read_csv_wkt"]


def write_csv_wkt(
    df: DataFrame, path: str, geom_col: str = "geometry"
) -> None:
    """Write (…attrs, geometry WKB) to one CSV file with a WKT
    geometry column (header row included)."""
    from gdal_spark.geo.wkb import parse_wkb
    from gdal_spark.geo.wkt import to_wkt

    attrs = [f.name for f in df.schema.fields if f.name != geom_col]
    with open(path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(attrs + ["WKT"])
        for row in df.toLocalIterator():
            w.writerow(
                [row[a] for a in attrs]
                + [to_wkt(parse_wkb(bytes(row[geom_col])))]
            )


def read_csv_wkt(
    spark: SparkSession,
    path: str,
    attr_schema: str,
    wkt_col: str = "WKT",
) -> DataFrame:
    """Distributed CSV scan; the WKT column parses to WKB `geometry`.
    `attr_schema` is a DDL string for the attribute columns."""
    attrs = T._parse_datatype_string(attr_schema)
    full = T.StructType(
        list(attrs.fields) + [T.StructField(wkt_col, T.StringType())]
    )
    raw = spark.read.csv(path, header=True, schema=full)

    @F.pandas_udf(T.BinaryType())
    def wkt_to_wkb(s: pd.Series) -> pd.Series:
        from gdal_spark.geo.wkb import geometry_to_wkb
        from gdal_spark.geo.wkt import from_wkt

        return s.map(lambda t: geometry_to_wkb(from_wkt(t)))

    return raw.select(
        *[F.col(f.name) for f in attrs.fields],
        wkt_to_wkb(F.col(wkt_col)).alias("geometry"),
    )
