"""Tile assignment — the north-star operator family (SURVEY.md §2.10).

Maps every image footprint (EPSG:3857 bbox) to the WebMercator tiles
it covers at zoom z, per the reference's GetTileIndices semantics
(apps/gdalalg_raster_tile.cpp:274-342: floor + 1e-3 inward snap +
clamp to the matrix) and XYZ/TMS y conventions (:348-352).

Plan shape at scale: a narrow map (pure Column math) + one explode —
no UDF, no shuffle until the consumer aggregates. The per-image tile
list is tiny (images are O(1) tiles at native zoom), so explode
amplification is bounded; `max_tiles_per_image` guards against
degenerate inputs producing runaway fan-out.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gdal_spark.tiles import tilemath as tm


def assign_tiles(
    df: DataFrame,
    z: int,
    xmin: str = "xmin",
    ymin: str = "ymin",
    xmax: str = "xmax",
    ymax: str = "ymax",
    convention: str = "xyz",
    max_tiles_per_image: int = 4096,
) -> DataFrame:
    """Explode each row into its covering (z, x, y) tiles at zoom z.

    Keeps all input columns; adds tile_z, tile_x, tile_y.
    """
    min_tx, min_ty, max_tx, max_ty = tm.tile_range_cols(
        F.col(xmin), F.col(ymin), F.col(xmax), F.col(ymax), z
    )
    df = (
        df.withColumn("_min_tx", min_tx)
        .withColumn("_max_tx", max_tx)
        .withColumn("_min_ty", min_ty)
        .withColumn("_max_ty", max_ty)
    )
    n_tiles = (F.col("_max_tx") - F.col("_min_tx") + 1) * (
        F.col("_max_ty") - F.col("_min_ty") + 1
    )
    df = df.where(n_tiles <= F.lit(max_tiles_per_image))
    df = df.withColumn(
        "tile_x", F.explode(F.sequence(F.col("_min_tx"), F.col("_max_tx")))
    ).withColumn(
        "tile_y_raw", F.explode(F.sequence(F.col("_min_ty"), F.col("_max_ty")))
    )
    df = (
        df.withColumn("tile_z", F.lit(z))
        .withColumn("tile_y", tm.file_y(F.col("tile_y_raw"), z, convention))
        .drop("_min_tx", "_max_tx", "_min_ty", "_max_ty", "tile_y_raw")
    )
    return df


def tile_counts(assigned: DataFrame) -> DataFrame:
    """Images per tile — the flagship aggregation. Partial (map-side)
    aggregation is automatic; the shuffle key (z,x,y) is the natural
    layout key of the output tiles table."""
    return assigned.groupBy("tile_z", "tile_x", "tile_y").agg(
        F.count("*").alias("n_images")
    )


def with_quadkey(assigned: DataFrame, z: int) -> DataFrame:
    return assigned.withColumn(
        "quadkey", tm.quadkey_col(F.col("tile_x"), F.col("tile_y"), z)
    )
