"""Cross-tile component dissolve: global connected components over
tiled rasters.

Completes polygonize (alg/polygonize.cpp semantics) across tile
boundaries, fully distributed:

1. per-tile union-find labeling runs in mapInPandas; each label row
   carries its border cells as (edge, offset) pairs — O(tile_edge)
   metadata per label, never pixels;
2. border cells explode to rows and S->N / E->W adjacencies resolve
   with a plain equi-join on (tile, edge, offset, value) — the
   distributed form of the reference polygonizer's cross-chunk
   equivalence map (alg/polygonize_polygonizer.cpp);
3. the resulting label-graph edge list (components, not pixels) goes
   through iterative min-label propagation (operators/graph.py) — no
   driver-side collection anywhere, at any scale.

component_id is assigned densely over the component list (a window
over component-level rows, metadata-sized by construction).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from gdal_spark.operators.graph import connected_components
from gdal_spark.raster.components import label_components

_LBL_SCHEMA = T.StructType(
    [
        T.StructField("tile_x", T.IntegerType()),
        T.StructField("tile_y", T.IntegerType()),
        T.StructField("label", T.IntegerType()),
        T.StructField("value", T.IntegerType()),
        T.StructField("n_px", T.LongType()),
        # border pixels of this label on each edge, encoded as
        # (edge, offset) pairs -- edge 0=N,1=S,2=W,3=E
        T.StructField("border", T.ArrayType(T.ArrayType(T.IntegerType()))),
    ]
)

# (tile_x, tile_y, label) -> one long key; 2^21 headroom per field
_KEY_BITS = 21


def _tile_labels(tile_size: int, quant: int, mod: int):
    def run(batches):
        for pdf in batches:
            recs = []
            for tx, ty, data in zip(pdf["tile_x"], pdf["tile_y"], pdf["data"]):
                arr = np.frombuffer(data, dtype="<f8").reshape(tile_size, tile_size)
                q = ((arr * 2).astype(np.int64) % mod) // quant
                labels = label_components(q, 4)
                for lbl in np.unique(labels):
                    mask = labels == lbl
                    border = []
                    for edge, line in (
                        (0, mask[0, :]), (1, mask[-1, :]),
                        (2, mask[:, 0]), (3, mask[:, -1]),
                    ):
                        for off in np.nonzero(line)[0]:
                            border.append([edge, int(off)])
                    recs.append(
                        {
                            "tile_x": int(tx), "tile_y": int(ty),
                            "label": int(lbl),
                            "value": int(q[mask][0]),
                            "n_px": int(mask.sum()),
                            "border": border,
                        }
                    )
            yield pd.DataFrame(
                recs,
                columns=["tile_x", "tile_y", "label", "value", "n_px", "border"],
            )

    return run


def _label_key() -> F.Column:
    shift = F.lit(1 << _KEY_BITS)
    return (
        (F.col("tile_x").cast("long") * shift + F.col("tile_y").cast("long"))
        * shift
        + F.col("label").cast("long")
    )


def global_components(
    tiles_df: DataFrame, tile_size: int, quant: int = 128, mod: int = 512
) -> DataFrame:
    """-> (value, component_id, n_px, n_tiles): globally dissolved
    components across all tiles in tiles_df (tile_x, tile_y, data).
    n_tiles counts contributing per-tile label rows (a tile with two
    disjoint parts of one global component contributes twice)."""
    labeled = (
        tiles_df.mapInPandas(_tile_labels(tile_size, quant, mod), _LBL_SCHEMA)
        .withColumn("key", _label_key())
        .localCheckpoint()  # decode once; reused for borders + final agg
    )

    # border cells as rows: (tile_x, tile_y, edge, off, value, key)
    cells = labeled.select(
        "tile_x", "tile_y", "value", "key", F.explode("border").alias("eo")
    ).select(
        "tile_x", "tile_y", "value", "key",
        F.col("eo")[0].alias("edge"), F.col("eo")[1].alias("off"),
    )
    # S row of (tx,ty) meets N row of (tx,ty+1); E col meets W col of
    # (tx+1,ty). Probe rows are re-keyed to the neighbor's address so
    # adjacency is a plain equi-join (cell-key discipline; no driver).
    probes = cells.where(F.col("edge") == 1).select(
        F.col("tile_x"), (F.col("tile_y") + 1).alias("tile_y"),
        F.lit(0).alias("edge"), "off", "value", F.col("key").alias("key_a"),
    ).unionByName(
        cells.where(F.col("edge") == 3).select(
            (F.col("tile_x") + 1).alias("tile_x"), F.col("tile_y"),
            F.lit(2).alias("edge"), "off", "value", F.col("key").alias("key_a"),
        )
    )
    edges = probes.join(
        cells.select(
            "tile_x", "tile_y", "edge", "off", "value",
            F.col("key").alias("key_b"),
        ),
        ["tile_x", "tile_y", "edge", "off", "value"],
    ).select(F.col("key_a").alias("src"), F.col("key_b").alias("dst"))

    roots = connected_components(edges)
    comp = (
        labeled.join(roots, labeled["key"] == roots["id"], "left")
        .withColumn("root", F.coalesce("root", "key"))
        .groupBy("root")
        .agg(
            F.first("value").alias("value"),
            F.sum("n_px").alias("n_px"),
            F.count("*").alias("n_tiles"),
        )
    )
    # dense ids over component-level rows only (metadata-sized)
    w = Window.orderBy("root")
    return comp.select(
        F.col("value").cast("int"),
        (F.row_number().over(w) - 1).cast("int").alias("component_id"),
        F.col("n_px").cast("long"),
        F.col("n_tiles").cast("int"),
    )
