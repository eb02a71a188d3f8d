"""gdaltindex — build a raster tile-index layer from an images table.

Re-derives apps/gdaltindex_lib.cpp semantics Spark-first:

- one feature per source raster: ``location`` field + footprint
  polygon from the four geotransform corners
  (gdaltindex_lib.cpp:1060-1083), envelope = min/max over them
  (:1120-1126);
- representative pixel size ``res = sqrt(extent_area / (w*h))``
  (:1128) with ``-min_pixel_size`` / ``-max_pixel_size`` skip rules
  (:1130-1144, strict inequalities);
- already-indexed locations are skipped (the reference pre-loads the
  existing index into ``existingFilenames`` and `continue`s on match)
  — distributed here as a ``dropDuplicates`` on the location key;
- ``src_srs_name`` field under FORMAT_AUTO: ``AUTH:CODE`` when the
  SRS carries an authority (:1153-1161) — always EPSG:3857 for the
  synthetic fleet.

Scale shape: everything is Column math over the catalog (metadata
only — no pixel bytes are touched, exactly like the reference which
only calls GetGeoTransform/GetRasterXSize); the single shuffle is the
duplicate-location drop, keyed on ``location`` (uniformly distributed
ids — no skew). At 10^12 images this is one exchange over a
string-keyed dedup, the minimum the semantics allow.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["build_tile_index", "build_vector_tile_index"]


def build_tile_index(
    images: DataFrame,
    *,
    min_pixel_size: float | None = None,
    max_pixel_size: float | None = None,
    overview_factors: tuple[int, ...] = (),
    drop_duplicate_locations: bool = True,
) -> DataFrame:
    """images: needs columns (image_id, w, h, xmin, ymin, xmax, ymax).

    ``overview_factors`` additionally indexes externally-materialized
    overview files (``<id>_ovr<f>.tif``, ceil-decimated dimensions,
    same extent — the reference's ``.ovr``-as-separate-file layout
    that gdaltindex happily walks when globbed).
    """
    base = images.select(
        F.concat(F.col("image_id"), F.lit(".tif")).alias("location"),
        F.col("w").cast("long").alias("rx"),
        F.col("h").cast("long").alias("ry"),
        "xmin", "ymin", "xmax", "ymax",
    )
    parts = [base]
    for fac in overview_factors:
        parts.append(
            images.select(
                F.concat(
                    F.col("image_id"), F.lit(f"_ovr{fac}.tif")
                ).alias("location"),
                F.ceil(F.col("w") / F.lit(fac)).cast("long").alias("rx"),
                F.ceil(F.col("h") / F.lit(fac)).cast("long").alias("ry"),
                "xmin", "ymin", "xmax", "ymax",
            )
        )
    df = parts[0]
    for p in parts[1:]:
        df = df.unionByName(p)
    if drop_duplicate_locations:
        df = df.dropDuplicates(["location"])
    res = F.sqrt(
        (F.col("xmax") - F.col("xmin"))
        * (F.col("ymax") - F.col("ymin"))
        / F.col("rx")
        / F.col("ry")
    )
    df = df.withColumn("res", res)
    if min_pixel_size is not None:
        df = df.where(F.col("res") >= F.lit(float(min_pixel_size)))
    if max_pixel_size is not None:
        df = df.where(F.col("res") <= F.lit(float(max_pixel_size)))
    return df.select(
        "location",
        F.lit("EPSG:3857").alias("src_srs"),
        "rx", "ry", "xmin", "ymin", "xmax", "ymax", "res",
    )


def build_vector_tile_index(
    features: DataFrame,
    shard_col: str,
    *,
    geom_col: str = "geometry",
    location_fmt: str = "{}.gpkg,0",
    src_srs: str = "EPSG:4326",
) -> DataFrame:
    """ogrtindex / `gdal vector index` (apps/gdalalg_vector_index.cpp):
    one feature per (datasource, layer) whose geometry is the layer's
    exact extent envelope (`GetExtent(..., TRUE)`, :706 →
    `OGRPolygon oExtentGeom(sExtents)` :715) and whose location field
    is ``"<filename>,<layer index>"`` (:524).

    ``shard_col`` names the column assigning each feature to its
    source datasource.  Scale shape: per-feature bounds come from one
    Arrow-batched WKB pass (narrow), then a single partial-aggregated
    min/max groupBy on the shard key — map-side combine reduces every
    task to one row per shard before the exchange.
    """
    from pyspark.sql import types as T

    part_schema = T.StructType(
        [
            T.StructField("_shard", T.StringType()),
            T.StructField("minx", T.DoubleType()),
            T.StructField("miny", T.DoubleType()),
            T.StructField("maxx", T.DoubleType()),
            T.StructField("maxy", T.DoubleType()),
        ]
    )

    def bounds(batches):
        import pandas as pd

        from gdal_spark.geo.wkb import parse_wkb

        for pdf in batches:
            recs = []
            for shard, wkb in zip(pdf["_shard"], pdf[geom_col]):
                bx = parse_wkb(bytes(wkb)).bounds()
                recs.append(
                    {"_shard": shard, "minx": bx[0], "miny": bx[1],
                     "maxx": bx[2], "maxy": bx[3]}
                )
            yield pd.DataFrame(
                recs, columns=[f.name for f in part_schema.fields]
            )

    parts = features.select(
        F.col(shard_col).cast("string").alias("_shard"), geom_col
    ).mapInPandas(bounds, part_schema)
    pre, post = location_fmt.split("{}")
    return (
        parts.groupBy("_shard")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_features"),
            F.min("minx").alias("minx"),
            F.min("miny").alias("miny"),
            F.max("maxx").alias("maxx"),
            F.max("maxy").alias("maxy"),
        )
        .select(
            F.concat(F.lit(pre), F.col("_shard"), F.lit(post))
            .alias("location"),
            F.lit(src_srs).alias("src_srs"),
            "n_features", "minx", "miny", "maxx", "maxy",
        )
    )
