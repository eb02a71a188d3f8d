"""Exact distributed kNN via cell-ring candidates + window re-rank.

The reference has no generic kNN operator; its nearest-neighbor
machinery is gdalgrid's quadtree radius search
(alg/gdalgrid.cpp:241-341, port/cpl_quad_tree.h). We generalize that
to the distributed setting with the guaranteed-exact two-pass scheme:

  pass 1: join each query to the 3x3 cell ring around it at an index
          zoom chosen from global density; provisional top-k by a
          window re-rank.
  guarantee: any point outside ring r is at mercator distance
          >= r * cell_span from the query. Queries whose provisional
          k-th distance exceeds that bound (or that found < k
          candidates) are UNRESOLVED.
  pass 2: re-join only unresolved queries with a per-query radius
          (their provisional k-th distance, or an escalating global
          radius), then re-rank. Exact by construction.

Distance metric: Euclidean meters in EPSG:3857 (documented engine
metric — monotone with ground distance at equal latitude; closed
form, fully Column-side). Ties broken by point key for determinism
(the first-match discipline of ogr_gensql.cpp:1497-1527 made
explicit).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from gdal_spark.tiles import tilemath as tm


def _auto_zoom(n_points: int, k: int) -> int:
    """Index zoom so a 3x3 ring holds ~4k expected candidates under a
    uniform spread: 9 * n / 4^z >= 4k."""
    if n_points <= 0:
        return 1
    target_cells = max(1.0, 9.0 * n_points / (4.0 * max(k, 1)))
    z = int(math.floor(math.log(target_cells, 4)))
    return max(1, min(14, z))


def _with_merc(df: DataFrame, lon: str, lat: str, x: str, y: str) -> DataFrame:
    return df.withColumn(x, tm.merc_x(F.col(lon))).withColumn(
        y, tm.merc_y(F.col(lat))
    )


def _cells(df: DataFrame, x: str, y: str, z: int, cx: str, cy: str) -> DataFrame:
    tx, ty = tm.tile_xy_cols(F.col(x), F.col(y), z)
    return df.withColumn(cx, tx).withColumn(cy, ty)


def knn_join(
    queries_df: DataFrame,
    points_df: DataFrame,
    k: int,
    query_key: str = "site_id",
    query_lon: str = "slon",
    query_lat: str = "slat",
    point_key: str = "image_id",
    point_lon: str = "lon_c",
    point_lat: str = "lat_c",
    index_zoom: int | None = None,
    n_points_hint: int | None = None,
) -> DataFrame:
    """-> DataFrame(query_key, rank, point_key, dist_m) with rank 1..k."""
    if index_zoom is None:
        # fallback when neither a zoom nor a size hint is given: ONE
        # scalar count() action (a columnless parquet scan — cheap,
        # but still a job). At catalog scale pass n_points_hint from
        # table metadata (Iceberg snapshot stats) or pin index_zoom;
        # _auto_zoom only needs the order of magnitude.
        n = n_points_hint if n_points_hint is not None else points_df.count()
        index_zoom = _auto_zoom(n, k)
    span = tm.resolution(index_zoom) * tm.TILE_SIZE

    pts = _with_merc(
        points_df.select(point_key, point_lon, point_lat), point_lon, point_lat, "pmx", "pmy"
    )
    pts = _cells(pts, "pmx", "pmy", index_zoom, "pcx", "pcy").select(
        point_key, "pmx", "pmy", "pcx", "pcy"
    )
    qs = _with_merc(
        queries_df.select(query_key, query_lon, query_lat), query_lon, query_lat, "qmx", "qmy"
    )
    qs = _cells(qs, "qmx", "qmy", index_zoom, "qcx", "qcy").select(
        query_key, "qmx", "qmy", "qcx", "qcy"
    )

    dist = F.sqrt(
        (F.col("qmx") - F.col("pmx")) ** 2 + (F.col("qmy") - F.col("pmy")) ** 2
    )
    w = Window.partitionBy(query_key).orderBy(F.col("dist_m").asc(), F.col(point_key).asc())

    def ring_join(queries: DataFrame, r: int) -> DataFrame:
        ring = queries.withColumn(
            "jcx", F.explode(F.sequence(F.col("qcx") - r, F.col("qcx") + r))
        ).withColumn(
            "jcy", F.explode(F.sequence(F.col("qcy") - r, F.col("qcy") + r))
        )
        n_side = 1 << index_zoom
        ring = ring.where(
            (F.col("jcx") >= 0) & (F.col("jcx") < n_side)
            & (F.col("jcy") >= 0) & (F.col("jcy") < n_side)
        )
        cand = ring.join(
            pts, (F.col("jcx") == F.col("pcx")) & (F.col("jcy") == F.col("pcy"))
        )
        return cand.withColumn("dist_m", dist).select(
            query_key, point_key, "dist_m"
        )

    def rank_topk(cand: DataFrame) -> DataFrame:
        return (
            cand.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
        )

    # ---- pass 1: ring r=1 -------------------------------------------------
    top1 = rank_topk(ring_join(qs, 1)).cache()
    stats = top1.groupBy(query_key).agg(
        F.count("*").alias("_cnt"), F.max("dist_m").alias("_dk")
    )
    guarantee = float(span)  # points outside ring 1 are >= span away
    unresolved = stats.where(
        (F.col("_cnt") < k) | (F.col("_dk") > F.lit(guarantee))
    ).select(query_key, "_cnt", "_dk")

    resolved_rows = top1.join(
        unresolved.select(query_key), query_key, "left_anti"
    ).select(query_key, "rank", point_key, "dist_m")

    un = unresolved.join(qs, query_key)
    if un.isEmpty():
        top1.unpersist()
        return resolved_rows

    # ---- pass 2: per-query radius ------------------------------------------
    # radius: known k-th distance if we had k candidates, else escalate by
    # density-free doubling (64 cells) — still exact because pass 3 below
    # cross-checks the remainder.
    radius = F.when(F.col("_cnt") >= k, F.col("_dk")).otherwise(
        F.lit(8.0 * span)
    )
    un2 = un.withColumn("_r", F.ceil(radius / F.lit(span)).cast("int"))
    ring2 = un2.withColumn(
        "jcx", F.explode(F.sequence(F.col("qcx") - F.col("_r"), F.col("qcx") + F.col("_r")))
    ).withColumn(
        "jcy", F.explode(F.sequence(F.col("qcy") - F.col("_r"), F.col("qcy") + F.col("_r")))
    )
    n_side = 1 << index_zoom
    ring2 = ring2.where(
        (F.col("jcx") >= 0) & (F.col("jcx") < n_side)
        & (F.col("jcy") >= 0) & (F.col("jcy") < n_side)
    )
    cand2 = ring2.join(
        pts, (F.col("jcx") == F.col("pcx")) & (F.col("jcy") == F.col("pcy"))
    ).withColumn("dist_m", dist)
    top2 = rank_topk(cand2.select(query_key, point_key, "dist_m")).cache()

    # queries that had < k in pass 1 might STILL be short or unguaranteed —
    # finish them brute-force (tiny remainder by construction: broadcast).
    stats2 = top2.groupBy(query_key).agg(
        F.count("*").alias("_cnt2"), F.max("dist_m").alias("_dk2")
    )
    still = stats2.join(un2.select(query_key, "_cnt", "_r"), query_key).where(
        (F.col("_cnt") < k)
        & ((F.col("_cnt2") < k) | (F.col("_dk2") > F.col("_r") * F.lit(span)))
    ).select(query_key)

    top2_ok = top2.join(still, query_key, "left_anti").select(
        query_key, "rank", point_key, "dist_m"
    )

    out = resolved_rows.unionByName(top2_ok)

    if not still.isEmpty():
        brute = (
            F.broadcast(still.join(qs, query_key))
            .crossJoin(pts.select(point_key, "pmx", "pmy"))
            .withColumn("dist_m", dist)
        )
        top3 = rank_topk(brute.select(query_key, point_key, "dist_m")).select(
            query_key, "rank", point_key, "dist_m"
        )
        out = out.unionByName(top3)
    return out
