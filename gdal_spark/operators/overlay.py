"""Layer x layer spatial overlay join (Intersection / Clip / Erase /
Union measures).

Semantics from the reference's layer overlay family
(ogr/ogrsf_frmts/generic/ogrlayer.cpp:3345 Intersection, :5497 Clip,
:5806 Erase, :3763 Union): nested loop with the method layer's
spatial index pruning candidates, then exact pairwise geometry.
Distributed shape: both polygon sides explode to covering index
cells (Column math), the candidate step is a cell equi-join +
bbox-overlap reject, and only surviving pairs pay the exact
convex-clip kernel in an Arrow-batched pass.

Output per intersecting pair: intersection area plus the derived
Clip (== intersection), Erase (A minus B = area_a - inter) and
Union (area_a + area_b - inter) measures — one pass serves all four
reference verbs.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from gdal_spark.geo.clip import clip_convex
from gdal_spark.geo.geom import ring_area
from gdal_spark.geo.wkb import parse_wkb
from gdal_spark.operators.spatial_join import DEFAULT_INDEX_ZOOM, with_bbox_cells

OVERLAY_SCHEMA = T.StructType(
    [
        T.StructField("fid_a", T.LongType()),
        T.StructField("fid_b", T.LongType()),
        T.StructField("inter_e4", T.LongType()),
        T.StructField("a_only_e4", T.LongType()),
        T.StructField("b_only_e4", T.LongType()),
        T.StructField("sym_diff_e4", T.LongType()),
        T.StructField("union_e4", T.LongType()),
    ]
)


def overlay_join(
    zones_a: DataFrame,
    zones_b: DataFrame,
    index_zoom: int = DEFAULT_INDEX_ZOOM,
) -> DataFrame:
    """Pairs of intersecting polygons (convex outer rings) with
    intersection / A-only / union areas (degrees^2, floor * 1e4).

    Inputs need (fid, geometry, zxmin..zymax). Pairs with zero
    intersection area are dropped (the reference emits no feature
    when the GEOS op returns empty).
    """
    a = with_bbox_cells(
        zones_a.select(
            F.col("fid").alias("fid_a"), F.col("geometry").alias("geom_a"),
            F.col("zxmin").alias("axmin"), F.col("zymin").alias("aymin"),
            F.col("zxmax").alias("axmax"), F.col("zymax").alias("aymax"),
        ),
        "axmin", "aymin", "axmax", "aymax", index_zoom,
    )
    b = with_bbox_cells(
        zones_b.select(
            F.col("fid").alias("fid_b"), F.col("geometry").alias("geom_b"),
            F.col("zxmin").alias("bxmin"), F.col("zymin").alias("bymin"),
            F.col("zxmax").alias("bxmax"), F.col("zymax").alias("bymax"),
        ),
        "bxmin", "bymin", "bxmax", "bymax", index_zoom,
    )
    cand = (
        a.join(b, "cell")
        .where(
            (F.col("axmin") <= F.col("bxmax")) & (F.col("axmax") >= F.col("bxmin"))
            & (F.col("aymin") <= F.col("bymax")) & (F.col("aymax") >= F.col("bymin"))
        )
        .select("fid_a", "geom_a", "fid_b", "geom_b")
        .dropDuplicates(["fid_a", "fid_b"])
    )

    def refine(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cache: dict[tuple, np.ndarray] = {}

        def outer_ring(key, wkb) -> np.ndarray:
            ring = cache.get(key)
            if ring is None:
                g = parse_wkb(bytes(wkb))
                ring = g.all_rings()[0][0]
                if len(cache) < 65536:
                    cache[key] = ring
            return ring

        for pdf in batches:
            recs = []
            for _, row in pdf.iterrows():
                ra = outer_ring(("a", row["fid_a"]), row["geom_a"])
                rb = outer_ring(("b", row["fid_b"]), row["geom_b"])
                inter = clip_convex(ra, rb)
                if len(inter) == 0:
                    continue
                ai = abs(ring_area(inter))
                if ai <= 0.0:
                    continue
                aa = abs(ring_area(ra))
                ab = abs(ring_area(rb))
                recs.append(
                    {
                        "fid_a": int(row["fid_a"]),
                        "fid_b": int(row["fid_b"]),
                        "inter_e4": int(np.floor(ai * 1e4)),
                        # clamp: identical polygons make aa - ai an
                        # exact 0 where float noise flips the floor
                        "a_only_e4": max(0, int(np.floor((aa - ai) * 1e4))),
                        "b_only_e4": max(0, int(np.floor((ab - ai) * 1e4))),
                        "sym_diff_e4": max(0, int(np.floor((aa + ab - 2 * ai) * 1e4))),
                        "union_e4": int(np.floor((aa + ab - ai) * 1e4)),
                    }
                )
            yield pd.DataFrame(
                recs,
                columns=["fid_a", "fid_b", "inter_e4", "a_only_e4",
                         "b_only_e4", "sym_diff_e4", "union_e4"]
            )

    return cand.mapInPandas(refine, OVERLAY_SCHEMA)
