"""Spatial table layout: Z-order (Morton) clustering keys.

Mirrors the packed-Hilbert R-tree layout of the reference's
FlatGeobuf driver (ogr/ogrsf_frmts/flatgeobuf/packedrtree.h:78-121)
as a TABLE layout rule: sorting rows by an interleaved cell key makes
parquet/Iceberg row-group min/max stats act like a coarse spatial
index — range scans prune files exactly the way the packed R-tree
prunes nodes (SURVEY.md §4 'spatial predicate pushdown').

The Morton key is pure Column math (bit interleave via the shift-or
cascade), so writes stay JVM-side.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from gdal_spark.tiles import tilemath as tm


def _spread_bits16(v: Column) -> Column:
    """Interleave-ready bit spread of a 16-bit value (x -> x with a
    zero between every bit) via the standard mask cascade."""
    x = v.cast("long")
    x = x.bitwiseOR(F.shiftleft(x, 8)).bitwiseAND(F.lit(0x00FF00FF))
    x = x.bitwiseOR(F.shiftleft(x, 4)).bitwiseAND(F.lit(0x0F0F0F0F))
    x = x.bitwiseOR(F.shiftleft(x, 2)).bitwiseAND(F.lit(0x33333333))
    x = x.bitwiseOR(F.shiftleft(x, 1)).bitwiseAND(F.lit(0x55555555))
    return x


def morton_key(tx: Column, ty: Column) -> Column:
    """Morton/Z-order key of a tile/cell coordinate pair (<= 16 bits
    each)."""
    return _spread_bits16(tx).bitwiseOR(F.shiftleft(_spread_bits16(ty), 1))


def zorder_cell_key(lon: Column, lat: Column, zoom: int) -> Column:
    """Morton key of the WebMercator cell containing a point."""
    mx = tm.merc_x(lon)
    my = tm.merc_y(F.greatest(F.lit(-tm.MAX_LAT), F.least(F.lit(tm.MAX_LAT), lat)))
    cx, cy = tm.tile_xy_cols(mx, my, zoom)
    return morton_key(cx, cy)


def write_spatially_clustered(
    df: DataFrame, path: str, lon: str, lat: str, zoom: int = 10,
    partitions: int | None = None,
) -> None:
    """Write parquet ordered by the Morton key: rows near in space
    land near in the file, so min/max stats prune bbox scans
    (the engine-side analog of `ALTER TABLE ... WRITE ORDERED BY`)."""
    keyed = df.withColumn("_zkey", zorder_cell_key(F.col(lon), F.col(lat), zoom))
    if partitions:
        keyed = keyed.repartitionByRange(partitions, "_zkey")
    keyed.sortWithinPartitions("_zkey").write.mode("overwrite").parquet(path)
