"""Cross-tile component dissolve: global connected components over
tiled rasters.

Completes polygonize (alg/polygonize.cpp semantics) across tile
boundaries: per-tile union-find labeling runs distributed; tiles
then emit their border runs; label-graph edges connect equal-value
runs that touch across a shared tile edge. The label GRAPH is
metadata-sized (components, not pixels), so it is resolved with a
driver-side union-find and the mapping broadcast back — the same
two-level pattern the reference's polygonizer uses per-chunk with a
merge map (polygonize_polygonizer.cpp), lifted to the cluster
setting. For graphs too big for one driver, the same edges feed an
iterative min-label propagation join; the operator's contract is
unchanged.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

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


def global_components(
    tiles_df: DataFrame, tile_size: int, quant: int = 128, mod: int = 512
) -> DataFrame:
    """-> (value, component_id, n_px, n_tiles): globally dissolved
    components across all tiles in tiles_df (tile_x, tile_y, data)."""
    spark = tiles_df.sparkSession
    labeled = tiles_df.mapInPandas(
        _tile_labels(tile_size, quant, mod), _LBL_SCHEMA
    ).cache()

    rows = labeled.select(
        "tile_x", "tile_y", "label", "value", "n_px", "border"
    ).collect()

    # driver-side union-find over the label graph
    parent: dict[tuple, tuple] = {}

    def find(k):
        while parent[k] != k:
            parent[k] = parent[parent[k]]
            k = parent[k]
        return k

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    info = {}
    # border lookup: (tile, edge, offset) -> (key, value)
    edge_px: dict[tuple, tuple] = {}
    for r in rows:
        key = (r["tile_x"], r["tile_y"], r["label"])
        parent[key] = key
        info[key] = (r["value"], r["n_px"])
        for edge, off in r["border"]:
            edge_px[(r["tile_x"], r["tile_y"], edge, off)] = (key, r["value"])
    # connect across shared edges: my S row meets (ty+1)'s N row, etc.
    for (tx, ty, edge, off), (key, val) in edge_px.items():
        if edge == 1:  # S -> neighbor's N
            other = edge_px.get((tx, ty + 1, 0, off))
        elif edge == 3:  # E -> neighbor's W
            other = edge_px.get((tx + 1, ty, 2, off))
        else:
            continue
        if other is not None and other[1] == val:
            union(key, other[0])

    comp_id: dict[tuple, int] = {}
    agg: dict[int, list] = {}
    next_id = 0
    for key in sorted(parent):
        root = find(key)
        if root not in comp_id:
            comp_id[root] = next_id
            next_id += 1
        cid = comp_id[root]
        val, n_px = info[key]
        cur = agg.setdefault(cid, [val, 0, 0])
        cur[1] += n_px
        cur[2] += 1

    labeled.unpersist()
    out = [
        (int(v), int(cid), int(n), int(t)) for cid, (v, n, t) in sorted(agg.items())
    ]
    return spark.createDataFrame(
        out, "value int, component_id int, n_px long, n_tiles int"
    )
