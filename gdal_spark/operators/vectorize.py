"""Raster -> vector operators: polygonize (component counting) and
footprint extraction.

- polygonize_tiles: per-tile connected-component labeling of equal
  pixel values (alg/polygonize.cpp semantics, 4-connectivity) over
  the quantized demo surface v = ((3x+5y) % 512) // 128; emits
  (tile, value, n_components, n_px). The diagonal-strip structure of
  the demo surface makes component counts SQL-derivable (distinct
  strip index per value), giving the union-find labeler a value-level
  oracle.
- footprint: apps/gdal_footprint_lib.cpp — valid-mask geometry per
  image. Emits the valid-pixel count, the valid bbox (oracle-checked)
  and a convex-hull WKB of valid pixel centers (test-checked).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from gdal_spark.geo.ops import convex_hull
from gdal_spark.geo.wkb import wkb_polygon
from gdal_spark.raster.codecs import decode_image
from gdal_spark.raster.components import label_components

POLY_SCHEMA = T.StructType(
    [
        T.StructField("tile_x", T.IntegerType()),
        T.StructField("tile_y", T.IntegerType()),
        T.StructField("value", T.IntegerType()),
        T.StructField("n_components", T.LongType()),
        T.StructField("n_px", T.LongType()),
    ]
)


def polygonize_tiles(tiles_df: DataFrame, tile_size: int, quant: int = 128,
                     mod: int = 512, connectivity: int = 4) -> DataFrame:
    """Label equal-value components of the quantized surface per tile."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            recs = []
            for tx, ty, data in zip(pdf["tile_x"], pdf["tile_y"], pdf["data"]):
                arr = np.frombuffer(data, dtype="<f8").reshape(tile_size, tile_size)
                q = ((arr * 2).astype(np.int64) % mod) // quant
                labels = label_components(q, connectivity)
                flat_q = q.ravel()
                flat_l = labels.ravel()
                for v in np.unique(flat_q):
                    sel = flat_q == v
                    recs.append(
                        {
                            "tile_x": int(tx),
                            "tile_y": int(ty),
                            "value": int(v),
                            "n_components": int(len(np.unique(flat_l[sel]))),
                            "n_px": int(sel.sum()),
                        }
                    )
            yield pd.DataFrame(
                recs, columns=["tile_x", "tile_y", "value", "n_components", "n_px"]
            )

    return tiles_df.mapInPandas(run, POLY_SCHEMA)


FOOTPRINT_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType()),
        T.StructField("n_valid", T.LongType()),
        T.StructField("vxmin", T.IntegerType()),
        T.StructField("vymin", T.IntegerType()),
        T.StructField("vxmax", T.IntegerType()),
        T.StructField("vymax", T.IntegerType()),
        T.StructField("hull", T.BinaryType()),
    ]
)


def footprint(images: DataFrame, nodata: int = 0, band: int = 0) -> DataFrame:
    """Valid-mask footprint per image from the decoded payload:
    count + pixel bbox + convex hull (pixel centers) of band != nodata."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            recs = []
            for _, row in pdf.iterrows():
                arr = decode_image(bytes(row["bytes"]), row["fmt"])
                if arr.ndim == 3:
                    arr = arr[:, :, band]
                ys, xs = np.nonzero(arr != nodata)
                if len(xs) == 0:
                    recs.append(
                        {
                            "image_id": row["image_id"], "n_valid": 0,
                            "vxmin": -1, "vymin": -1, "vxmax": -1, "vymax": -1,
                            "hull": None,
                        }
                    )
                    continue
                # hull vertices can only be per-row x extremes --
                # prefilter 260k pixels to <= 2h candidate points
                order = np.lexsort((xs, ys))
                oy, ox = ys[order], xs[order]
                row_start = np.searchsorted(oy, np.unique(oy), side="left")
                row_end = np.searchsorted(oy, np.unique(oy), side="right") - 1
                cand = np.unique(np.concatenate([order[row_start], order[row_end]]))
                pts = np.column_stack([xs[cand] + 0.5, ys[cand] + 0.5])
                recs.append(
                    {
                        "image_id": row["image_id"],
                        "n_valid": int(len(xs)),
                        "vxmin": int(xs.min()), "vymin": int(ys.min()),
                        "vxmax": int(xs.max()), "vymax": int(ys.max()),
                        "hull": wkb_polygon([convex_hull(pts)]),
                    }
                )
            yield pd.DataFrame(recs, columns=[f.name for f in FOOTPRINT_SCHEMA])

    return images.select("image_id", "bytes", "fmt").mapInPandas(
        run, FOOTPRINT_SCHEMA
    )
