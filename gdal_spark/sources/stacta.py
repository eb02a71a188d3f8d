"""STACTA — STAC Tiled Assets items (frmts/stacta/stactadataset.cpp).

A STACTA item is a STAC Item JSON whose raster payload is a tile
tree referenced by template:

- ``asset_templates[<name>]["href"]`` carries the
  ``{TileMatrixSet}/{TileMatrix}/{TileRow}/{TileCol}`` URL template
  (:735-846, template placeholders substituted per tile);
- ``properties["tiles:tile_matrix_sets"]`` embeds the OGC
  TileMatrixSet definition (WebMercatorQuad here, :750-834);
- ``properties["tiles:tile_matrix_links"][tms]["limits"]`` bounds
  each zoom's tile_col/tile_row ranges (:867-890) — the reference
  sizes the dataset from them.

Scale shape: the writer computes per-zoom limits with ONE
aggregation and emits the tree through the executor-side tile-tree
sink; the reader expands the template over the limits and scans the
files with binaryFile — file-level parallelism, no driver funnel.
"""

from __future__ import annotations

import json
import os

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["write_stacta", "read_stacta"]


def _tms_json(zooms: list[int], tile_size: int = 256) -> dict:
    from gdal_spark.tiles import tilemath as tm

    # OGC TileMatrixSet (WebMercatorQuad): scaleDenominator =
    # resolution / 0.28e-3 (the OGC standardized rendering pixel size)
    matrices = [
        {
            "identifier": str(z),
            "scaleDenominator": tm.resolution(z, tile_size) / 0.28e-3,
            "topLeftCorner": [-tm.ORIGIN, tm.ORIGIN],
            "tileWidth": tile_size,
            "tileHeight": tile_size,
            "matrixWidth": 1 << z,
            "matrixHeight": 1 << z,
        }
        for z in zooms
    ]
    return {
        "type": "TileMatrixSetType",
        "identifier": "WebMercatorQuad",
        "supportedCRS": "http://www.opengis.net/def/crs/EPSG/0/3857",
        "tileMatrix": matrices,
    }


def write_stacta(tiles: DataFrame, out_dir: str, fmt: str = "png",
                 asset: str = "bands") -> str:
    """(tile_z, tile_x, tile_y XYZ, payload) -> item.json + tile
    tree; returns the item.json path."""
    from gdal_spark.operators.render import write_tile_tree

    limits_rows = list(
        tiles.groupBy("tile_z")
        .agg(
            F.min("tile_x").alias("min_tile_col"),
            F.max("tile_x").alias("max_tile_col"),
            F.min("tile_y").alias("min_tile_row"),
            F.max("tile_y").alias("max_tile_row"),
        )
        .toLocalIterator()  # one row per zoom — metadata-sized
    )
    limits = {
        str(r["tile_z"]): {
            "min_tile_col": r["min_tile_col"],
            "max_tile_col": r["max_tile_col"],
            "min_tile_row": r["min_tile_row"],
            "max_tile_row": r["max_tile_row"],
        }
        for r in limits_rows
    }
    entries = tiles.select(
        F.concat_ws(
            "/",
            F.lit("WebMercatorQuad"),
            F.col("tile_z").cast("string"),
            F.col("tile_y").cast("string"),
            F.concat(F.col("tile_x").cast("string"), F.lit(f".{fmt}")),
        ).alias("path"),
        "payload",
    )
    write_tile_tree(entries, out_dir)
    item = {
        "type": "Feature",
        "stac_version": "1.0.0",
        "stac_extensions": [
            "https://stac-extensions.github.io/tiled-assets/v1.0.0/schema.json"
        ],
        "id": "stacta",
        "properties": {
            "datetime": "2026-01-01T00:00:00Z",
            "tiles:tile_matrix_sets": {
                "WebMercatorQuad": _tms_json(
                    sorted(int(z) for z in limits)
                )
            },
            "tiles:tile_matrix_links": {
                "WebMercatorQuad": {"limits": limits}
            },
        },
        "asset_templates": {
            asset: {
                "href": "{TileMatrixSet}/{TileMatrix}/{TileRow}/"
                        f"{{TileCol}}.{fmt}",
                "type": f"image/{fmt}",
            }
        },
        "assets": {},
    }
    path = os.path.join(out_dir, "item.json")
    with open(path, "w") as fh:
        json.dump(item, fh, indent=1, sort_keys=True)
    return path


_READ_SCHEMA = T.StructType(
    [
        T.StructField("tile_z", T.IntegerType()),
        T.StructField("tile_x", T.IntegerType()),
        T.StructField("tile_y", T.IntegerType()),
        T.StructField("payload", T.BinaryType()),
    ]
)


def read_stacta(spark: SparkSession, item_path: str,
                asset: str = "bands") -> DataFrame:
    """Scan the template's tile tree with binaryFile (one task per
    file) and keep only tiles inside the tile-matrix limits.  The
    limits bound a RECTANGLE that can dwarf the sparse tiles actually
    present (a zoom-12 mosaic's box is millions of cells), so
    materializing the rectangle is the classic scale trap — the scan
    enumerates FILES and the limits act as a filter, exactly how the
    reference sizes the dataset from limits but only fetches tiles
    the IRasterIO window touches."""
    import re

    with open(item_path) as fh:
        item = json.load(fh)
    tmpl = item["asset_templates"][asset]["href"]
    props = item["properties"]
    tms_name = next(iter(props["tiles:tile_matrix_sets"]))
    limits = props["tiles:tile_matrix_links"][tms_name]["limits"]
    base = os.path.dirname(item_path)
    ext = tmpl.rsplit(".", 1)[-1]
    pattern = os.path.join(base, tms_name, "*", "*", f"*.{ext}")
    rx = re.compile(r"/(\d+)/(\d+)/(\d+)\.\w+$")
    blim = spark.sparkContext.broadcast(
        {int(z): (v["min_tile_col"], v["max_tile_col"],
                  v["min_tile_row"], v["max_tile_row"])
         for z, v in limits.items()}
    )

    def parse(batches):
        for pdf in batches:
            recs = []
            for path, content in zip(pdf["path"], pdf["content"]):
                m = rx.search(str(path))
                if m is None:
                    continue
                z, row, col = (int(g) for g in m.groups())
                lim = blim.value.get(z)
                if lim is None or not (
                    lim[0] <= col <= lim[1] and lim[2] <= row <= lim[3]
                ):
                    continue
                recs.append(
                    {"tile_z": z, "tile_x": col, "tile_y": row,
                     "payload": bytes(content)}
                )
            yield pd.DataFrame(
                recs, columns=[f.name for f in _READ_SCHEMA.fields]
            )

    raw = spark.read.format("binaryFile").load(pattern).select(
        "path", "content"
    )
    return raw.mapInPandas(parse, _READ_SCHEMA)
