"""Distributed stencil (halo-exchange) computation over tile rasters.

The pattern: every 3x3-window op needs 1 pixel of neighbor context at
tile borders. Each tile EMITS the slivers its 8 neighbors need (8
small messages + its own body), one shuffle groups them by receiving
tile, and the kernel then runs on a (T+2)^2 padded buffer — the
classic distributed stencil exchange; shuffle volume is
O(perimeter), not O(area).

The reference's equivalent is gdaldem's per-scanline window walk
(apps/gdaldem_lib.cpp GDALGeneric3x3Processing) — single-process,
pull-based; here the same per-pixel semantics run tile-parallel.

Demo surface: d(x, y) = ((3x + 5y) % 512) / 2 on the global zoom-z
pixel grid (SQL-expressible so the whole stencil pipeline has a
value-level oracle, border pixels included — which is exactly what
proves the halo exchange is correct).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from gdal_spark.raster import dem
from gdal_spark.raster.checksum import gdal_checksum

TILE = 256


def surface_value(gx: np.ndarray, gy: np.ndarray) -> np.ndarray:
    """The demo DEM: ((3x + 5y) % 512) / 2."""
    return ((3 * gx + 5 * gy) % 512) / 2.0


def diamond_value(gx: np.ndarray, gy: np.ndarray, cx: int, cy: int) -> np.ndarray:
    """L1-cone surface |x-cx| + |y-cy| with the apex ON the lattice:
    the fold lines x=cx / y=cy coincide with cell boundaries, so the
    surface is exactly linear inside every marching cell and
    edge-interpolated contour geometry is exact (quarter-offset
    levels give dyadic crossings). Iso-lines are diamonds; contour
    POLYGON bands are diamond annuli with closed-form areas
    2*(hi^2 - lo^2)."""
    return np.abs(gx - cx) + np.abs(gy - cy).astype(np.float64)


def diamond_tiles(
    spark: SparkSession, tiles: list[tuple[int, int]], cx: int, cy: int
) -> DataFrame:
    """Materialize float64 tile buffers of the L1-cone surface."""
    schema = T.StructType(
        [
            T.StructField("tile_x", T.IntegerType()),
            T.StructField("tile_y", T.IntegerType()),
            T.StructField("data", T.BinaryType()),
        ]
    )

    def build(batches):
        for pdf in batches:
            recs = []
            for tx, ty in zip(pdf["tile_x"], pdf["tile_y"]):
                gx = np.arange(TILE) + int(tx) * TILE
                gy = (np.arange(TILE) + int(ty) * TILE)[:, None]
                arr = diamond_value(gx[None, :], gy, cx, cy)
                recs.append(
                    {"tile_x": int(tx), "tile_y": int(ty),
                     "data": arr.astype("<f8").tobytes()}
                )
            yield pd.DataFrame(recs, columns=["tile_x", "tile_y", "data"])

    df = spark.createDataFrame(tiles, "tile_x int, tile_y int")
    return df.mapInPandas(build, schema)


def surface_tiles(spark: SparkSession, tiles: list[tuple[int, int]]) -> DataFrame:
    """Materialize float64 tile buffers of the demo surface."""
    schema = T.StructType(
        [
            T.StructField("tile_x", T.IntegerType()),
            T.StructField("tile_y", T.IntegerType()),
            T.StructField("data", T.BinaryType()),
        ]
    )

    def build(batches):
        for pdf in batches:
            recs = []
            for tx, ty in zip(pdf["tile_x"], pdf["tile_y"]):
                gx = np.arange(TILE) + int(tx) * TILE
                gy = (np.arange(TILE) + int(ty) * TILE)[:, None]
                arr = surface_value(gx[None, :], gy)
                recs.append(
                    {"tile_x": int(tx), "tile_y": int(ty), "data": arr.astype("<f8").tobytes()}
                )
            yield pd.DataFrame(recs, columns=["tile_x", "tile_y", "data"])

    df = spark.createDataFrame(tiles, "tile_x int, tile_y int")
    return df.mapInPandas(build, schema)


_EXCHANGE_SCHEMA = T.StructType(
    [
        T.StructField("to_x", T.IntegerType()),
        T.StructField("to_y", T.IntegerType()),
        T.StructField("dx", T.IntegerType()),
        T.StructField("dy", T.IntegerType()),
        T.StructField("sliver", T.BinaryType()),
    ]
)


def _emit_slivers(batches):
    """For each tile: its body to itself plus 8 border slivers to its
    neighbors (receiver coordinates)."""
    for pdf in batches:
        recs = []
        for tx, ty, data in zip(pdf["tile_x"], pdf["tile_y"], pdf["data"]):
            arr = np.frombuffer(data, dtype="<f8").reshape(TILE, TILE)
            tx, ty = int(tx), int(ty)
            for dy in (-1, 0, 1):
                for dx in (-1, 0, 1):
                    if dx == 0 and dy == 0:
                        piece = arr
                    else:
                        # receiver at (+dy) needs MY far edge in that
                        # direction: send bottom row when dy=+1, etc.
                        ys = slice(TILE - 1, TILE) if dy == 1 else (slice(0, 1) if dy == -1 else slice(None))
                        xs = slice(TILE - 1, TILE) if dx == 1 else (slice(0, 1) if dx == -1 else slice(None))
                        piece = arr[ys, xs]
                    recs.append(
                        {
                            "to_x": tx + dx,
                            "to_y": ty + dy,
                            "dx": -dx,  # where the piece lands in the receiver's frame
                            "dy": -dy,
                            "sliver": piece.astype("<f8").tobytes(),
                        }
                    )
        yield pd.DataFrame(recs, columns=["to_x", "to_y", "dx", "dy", "sliver"])


def stencil_metrics(tiles: DataFrame, metrics: list[str]) -> DataFrame:
    """Halo-exchange then run 3x3 DEM kernels; one row per
    (tile, metric) with the GDAL checksum of the 256x256 result.
    Only tiles receiving all 8 neighbor slivers are emitted (interior
    of the tile window)."""
    out_schema = T.StructType(
        [
            T.StructField("tile_x", T.IntegerType()),
            T.StructField("tile_y", T.IntegerType()),
            T.StructField("metric", T.StringType()),
            T.StructField("checksum", T.IntegerType()),
        ]
    )

    def assemble(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        tx, ty = int(key[0]), int(key[1])
        if len(pdf) < 9:  # missing neighbors -> border tile, skip
            return pd.DataFrame(columns=["tile_x", "tile_y", "metric", "checksum"])
        padded = np.zeros((TILE + 2, TILE + 2), dtype=np.float64)
        for _, row in pdf.iterrows():
            dx, dy = int(row["dx"]), int(row["dy"])
            piece = np.frombuffer(row["sliver"], dtype="<f8")
            if dx == 0 and dy == 0:
                padded[1 : TILE + 1, 1 : TILE + 1] = piece.reshape(TILE, TILE)
            else:
                h = 1 if dy != 0 else TILE
                w = 1 if dx != 0 else TILE
                ys = 0 if dy == -1 else (TILE + 1 if dy == 1 else slice(1, TILE + 1))
                xs = 0 if dx == -1 else (TILE + 1 if dx == 1 else slice(1, TILE + 1))
                padded[ys, xs] = piece.reshape(h, w).squeeze()
        recs = []
        for m in metrics:
            arr = dem.KERNELS[m](padded)
            recs.append(
                {"tile_x": tx, "tile_y": ty, "metric": m, "checksum": gdal_checksum(arr)}
            )
        return pd.DataFrame(recs, columns=["tile_x", "tile_y", "metric", "checksum"])

    slivers = tiles.mapInPandas(_emit_slivers, _EXCHANGE_SCHEMA)
    return slivers.groupBy(
        F.col("to_x").alias("tile_x"), F.col("to_y").alias("tile_y")
    ).applyInPandas(
        lambda key, pdf: assemble(key, pdf), out_schema
    )
