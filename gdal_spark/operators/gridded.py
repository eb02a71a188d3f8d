"""Points->raster gridding, proximity rasters, and contour-cell
marching squares.

- grid_interpolate: alg/gdalgrid.cpp algorithm family — invdist
  (power 2: sum(v/d^2)/sum(1/d^2) over points within radius,
  gdalgrid.cpp GDALGridInverseDistanceToAPower), nearest (value of
  the closest point in radius), average, and the data-metrics family
  (count/min/max, gdal_alg.h:402-416). Implemented as PURE COLUMN
  MATH: pixel grid x broadcast points -> radius filter -> one
  aggregation. At 10^12 points the broadcast flips to a cell-ring
  candidate join (same shape as knn.py); semantics unchanged.
- proximity: alg/gdalproximity.cpp — per-pixel euclidean distance to
  the nearest target pixel, capped at max_dist (nodata beyond);
  per-tile numpy against the broadcast global target set, so
  cross-tile distances are exact.
- contour_cells: marching-squares case analysis per 2x2 pixel cell
  (alg/contour.cpp + alg/marching_squares/): counts iso-segments per
  (tile, level); saddle cases (5, 10) contribute 2 segments.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def grid_interpolate(
    spark: SparkSession,
    points: DataFrame,
    grid_w: int,
    grid_h: int,
    bounds: tuple[float, float, float, float],
    radius: float,
    point_x: str = "px",
    point_y: str = "py",
    point_v: str = "pv",
) -> DataFrame:
    """One row per grid pixel with >= 1 point in radius:
    (gx, gy, cnt, vmin, vmax, nearest_v, invdist_e4, avg_e4)."""
    x0, y0, x1, y1 = bounds
    resx = (x1 - x0) / grid_w
    resy = (y1 - y0) / grid_h
    grid = spark.range(grid_w * grid_h).select(
        (F.col("id") % grid_w).cast("int").alias("gx"),
        (F.col("id") / grid_w).cast("int").alias("gy"),
    )
    cx = F.lit(x0) + (F.col("gx") + F.lit(0.5)) * F.lit(resx)
    cy = F.lit(y1) - (F.col("gy") + F.lit(0.5)) * F.lit(resy)
    grid = grid.withColumn("cx", cx).withColumn("cy", cy)
    joined = grid.join(F.broadcast(points))
    d2 = (F.col("cx") - F.col(point_x)) ** 2 + (F.col("cy") - F.col(point_y)) ** 2
    joined = joined.withColumn("d2", d2).where(F.col("d2") <= F.lit(radius * radius))
    v = F.col(point_v).cast("double")
    return (
        joined.groupBy("gx", "gy")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.min(point_v).cast("long").alias("vmin"),
            F.max(point_v).cast("long").alias("vmax"),
            F.min(F.struct(F.col("d2"), F.col(point_v).cast("long").alias("pv"))).alias("_near"),
            (F.sum(v / F.col("d2")) / F.sum(F.lit(1.0) / F.col("d2"))).alias("_inv"),
            F.avg(v).alias("_avg"),
        )
        .select(
            "gx", "gy", F.col("cnt").cast("long").alias("cnt"), "vmin", "vmax",
            F.col("_near.pv").alias("nearest_v"),
            F.floor(F.col("_inv") * 1e4).cast("long").alias("invdist_e4"),
            F.floor(F.col("_avg") * 1e4).cast("long").alias("avg_e4"),
        )
    )


def grid_invdistnn(
    spark: SparkSession,
    points: DataFrame,
    grid_w: int,
    grid_h: int,
    bounds: tuple[float, float, float, float],
    radius: float,
    n_nearest: int = 8,
    point_x: str = "px",
    point_y: str = "py",
    point_v: str = "pv",
) -> DataFrame:
    """GGA_InverseDistanceToAPowerNearestNeighbor (alg/gdalgrid.cpp
    :241-341): inverse-distance power-2 restricted to the n_nearest
    points within radius (the reference finds them with a quadtree;
    here a window rank over the radius-filtered candidates — at scale
    the candidate set comes from the cell-ring join, same as kNN).
    -> (gx, gy, cnt_used, invdistnn_e4)."""
    from pyspark.sql.window import Window

    x0, y0, x1, y1 = bounds
    resx = (x1 - x0) / grid_w
    resy = (y1 - y0) / grid_h
    grid = spark.range(grid_w * grid_h).select(
        (F.col("id") % grid_w).cast("int").alias("gx"),
        (F.col("id") / grid_w).cast("int").alias("gy"),
    )
    cx = F.lit(x0) + (F.col("gx") + F.lit(0.5)) * F.lit(resx)
    cy = F.lit(y1) - (F.col("gy") + F.lit(0.5)) * F.lit(resy)
    grid = grid.withColumn("cx", cx).withColumn("cy", cy)
    joined = grid.join(F.broadcast(points))
    d2 = (F.col("cx") - F.col(point_x)) ** 2 + (F.col("cy") - F.col(point_y)) ** 2
    joined = joined.withColumn("d2", d2).where(F.col("d2") <= F.lit(radius * radius))
    w = Window.partitionBy("gx", "gy").orderBy(F.col("d2").asc(), F.col(point_v).asc())
    ranked = joined.withColumn("_rk", F.row_number().over(w)).where(
        F.col("_rk") <= n_nearest
    )
    v = F.col(point_v).cast("double")
    return (
        ranked.groupBy("gx", "gy")
        .agg(
            F.count(F.lit(1)).alias("cnt_used"),
            (F.sum(v / F.col("d2")) / F.sum(F.lit(1.0) / F.col("d2"))).alias("_inv"),
        )
        .select(
            "gx", "gy", F.col("cnt_used").cast("long"),
            F.floor(F.col("_inv") * 1e4).cast("long").alias("invdistnn_e4"),
        )
    )


# ---------------------------------------------------------------------------
# proximity
# ---------------------------------------------------------------------------

PROX_SCHEMA = T.StructType(
    [
        T.StructField("tile_x", T.IntegerType()),
        T.StructField("tile_y", T.IntegerType()),
        T.StructField("n_valid", T.LongType()),
        T.StructField("dist_sum_e2", T.LongType()),
        T.StructField("checksum", T.IntegerType()),
    ]
)


def proximity_tiles(
    spark: SparkSession,
    tiles: list[tuple[int, int]],
    tile_size: int,
    targets: np.ndarray,
    max_dist: float,
    nodata: float = 65535.0,
) -> DataFrame:
    """Distance-to-nearest-target raster per tile; targets are global
    (gx, gy) pixel coords broadcast to every task."""
    from gdal_spark.raster.checksum import gdal_checksum

    tgt = targets.astype(np.float64)
    bc = spark.sparkContext.broadcast(tgt)

    def build(batches):
        t = bc.value
        for pdf in batches:
            recs = []
            for tx, ty in zip(pdf["tile_x"], pdf["tile_y"]):
                gx = np.arange(tile_size) + int(tx) * tile_size
                gy = np.arange(tile_size) + int(ty) * tile_size
                # (h, w) min distance via chunked broadcast
                xx = gx[None, :]
                yy = gy[:, None]
                best = np.full((tile_size, tile_size), np.inf)
                for k in range(0, len(t), 512):
                    chunk = t[k : k + 512]
                    d2 = (xx[..., None] - chunk[:, 0]) ** 2 + (
                        yy[..., None] - chunk[:, 1]
                    ) ** 2
                    best = np.minimum(best, d2.min(axis=2))
                dist = np.sqrt(best)
                out = np.where(dist <= max_dist, dist, nodata)
                valid = dist <= max_dist
                recs.append(
                    {
                        "tile_x": int(tx),
                        "tile_y": int(ty),
                        "n_valid": int(valid.sum()),
                        "dist_sum_e2": int(np.floor(dist[valid] * 100).sum()),
                        "checksum": gdal_checksum(out),
                    }
                )
            yield pd.DataFrame(
                recs, columns=["tile_x", "tile_y", "n_valid", "dist_sum_e2", "checksum"]
            )

    df = spark.createDataFrame(tiles, "tile_x int, tile_y int")
    return df.mapInPandas(build, PROX_SCHEMA)


# ---------------------------------------------------------------------------
# marching squares segment counts
# ---------------------------------------------------------------------------

# segments per case index (bit0=NW, bit1=NE, bit2=SE, bit3=SW >= level)
_SEGMENTS = np.array([0, 1, 1, 1, 1, 2, 1, 1, 1, 1, 2, 1, 1, 1, 1, 0])

# per-case edge pairs (T=top, R=right, B=bottom, L=left); saddle
# cases 5/10 use the fixed two-segment resolution
_CASE_EDGES = {
    1: [("T", "L")], 2: [("T", "R")], 4: [("R", "B")], 8: [("B", "L")],
    3: [("L", "R")], 6: [("T", "B")], 12: [("L", "R")], 9: [("T", "B")],
    7: [("B", "L")], 11: [("R", "B")], 13: [("T", "R")], 14: [("T", "L")],
    5: [("T", "L"), ("R", "B")], 10: [("T", "R"), ("B", "L")],
}

CONTOUR_SCHEMA = T.StructType(
    [
        T.StructField("tile_x", T.IntegerType()),
        T.StructField("tile_y", T.IntegerType()),
        T.StructField("level", T.IntegerType()),
        T.StructField("n_segments", T.LongType()),
        T.StructField("total_len_e4", T.LongType()),
    ]
)


def chain_segments(
    segments: list[tuple[tuple[float, float], tuple[float, float]]],
    snap: float = 1e-9,
) -> list[list[tuple[float, float]]]:
    """Chain marching-squares segments into polylines by endpoint
    coincidence (the reference's contour writer joins segments the
    same way, alg/contour.cpp polyline assembly). Returns polylines
    as point lists; closed rings have first == last."""

    def key(p):
        return (round(p[0] / snap), round(p[1] / snap))

    # adjacency: endpoint -> list of (segment index, end)
    adj: dict[tuple, list[tuple[int, int]]] = {}
    for si, (a, b) in enumerate(segments):
        adj.setdefault(key(a), []).append((si, 0))
        adj.setdefault(key(b), []).append((si, 1))
    used = [False] * len(segments)
    lines: list[list[tuple[float, float]]] = []
    for start in range(len(segments)):
        if used[start]:
            continue
        used[start] = True
        a, b = segments[start]
        line = [a, b]
        # extend forward from line tail, then backward from head
        for head in (False, True):
            while True:
                p = line[0] if head else line[-1]
                nxt = None
                for si, end in adj.get(key(p), []):
                    if not used[si]:
                        nxt = (si, end)
                        break
                if nxt is None:
                    break
                si, end = nxt
                used[si] = True
                sa, sb = segments[si]
                q = sb if end == 0 else sa
                if head:
                    line.insert(0, q)
                else:
                    line.append(q)
        lines.append(line)
    return lines


CONTOUR_LINES_SCHEMA = T.StructType(
    [
        T.StructField("tile_x", T.IntegerType()),
        T.StructField("tile_y", T.IntegerType()),
        T.StructField("level", T.IntegerType()),
        T.StructField("n_polylines", T.LongType()),
        T.StructField("n_closed", T.LongType()),
        T.StructField("n_points", T.LongType()),
    ]
)


def contour_polylines(
    tiles_df: DataFrame, levels: list[float], tile_size: int
) -> DataFrame:
    """Full contour extraction per (tile, level): marching-squares
    segments chained into polylines; reports polyline/ring counts."""

    def run(batches):
        for pdf in batches:
            recs = []
            for tx, ty, data in zip(pdf["tile_x"], pdf["tile_y"], pdf["data"]):
                arr = np.frombuffer(data, dtype="<f8").reshape(tile_size, tile_size)
                a = arr[:-1, :-1]; b = arr[:-1, 1:]
                c2 = arr[1:, 1:]; d = arr[1:, :-1]
                for lvl in levels:
                    case = (
                        (a >= lvl).astype(np.int8)
                        | ((b >= lvl).astype(np.int8) << 1)
                        | ((c2 >= lvl).astype(np.int8) << 2)
                        | ((d >= lvl).astype(np.int8) << 3)
                    )
                    with np.errstate(divide="ignore", invalid="ignore"):
                        tT = (lvl - a) / (b - a)
                        tR = (lvl - b) / (c2 - b)
                        tB = (lvl - d) / (c2 - d)
                        tL = (lvl - a) / (d - a)
                    segs = []
                    ys, xs = np.nonzero((case > 0) & (case < 15))
                    for y, x in zip(ys, xs):
                        pts = {
                            "T": (x + tT[y, x], float(y)),
                            "R": (x + 1.0, y + tR[y, x]),
                            "B": (x + tB[y, x], y + 1.0),
                            "L": (float(x), y + tL[y, x]),
                        }
                        for e1, e2 in _CASE_EDGES[int(case[y, x])]:
                            p, q = pts[e1], pts[e2]
                            # contours through exact cell corners emit
                            # zero-length segments — drop them (the
                            # reference's writer skips them too)
                            if abs(p[0] - q[0]) > 1e-12 or abs(p[1] - q[1]) > 1e-12:
                                segs.append((p, q))
                    lines = chain_segments(segs)
                    n_closed = sum(
                        1 for ln in lines
                        if abs(ln[0][0] - ln[-1][0]) < 1e-9
                        and abs(ln[0][1] - ln[-1][1]) < 1e-9
                    )
                    recs.append(
                        {
                            "tile_x": int(tx), "tile_y": int(ty),
                            "level": int(lvl),
                            "n_polylines": len(lines),
                            "n_closed": n_closed,
                            "n_points": int(sum(len(ln) for ln in lines)),
                        }
                    )
            yield pd.DataFrame(
                recs,
                columns=["tile_x", "tile_y", "level", "n_polylines",
                         "n_closed", "n_points"],
            )

    return tiles_df.mapInPandas(run, CONTOUR_LINES_SCHEMA)


def contour_cell_counts(
    tiles_df: DataFrame, levels: list[float], tile_size: int
) -> DataFrame:
    """Marching squares per (tile, level) over the tile's interior
    2x2 cells: segment count AND total polyline length with
    edge-interpolated endpoints (alg/contour.cpp geometry; the
    reference interpolates crossings the same way)."""

    def count(batches):
        for pdf in batches:
            recs = []
            for tx, ty, data in zip(pdf["tile_x"], pdf["tile_y"], pdf["data"]):
                arr = np.frombuffer(data, dtype="<f8").reshape(tile_size, tile_size)
                a = arr[:-1, :-1]   # NW
                b = arr[:-1, 1:]    # NE
                c2 = arr[1:, 1:]    # SE
                d = arr[1:, :-1]    # SW
                for lvl in levels:
                    case = (
                        (a >= lvl).astype(np.int8)
                        | ((b >= lvl).astype(np.int8) << 1)
                        | ((c2 >= lvl).astype(np.int8) << 2)
                        | ((d >= lvl).astype(np.int8) << 3)
                    )
                    with np.errstate(divide="ignore", invalid="ignore"):
                        pts = {
                            "T": ((lvl - a) / (b - a), np.zeros_like(a)),
                            "R": (np.ones_like(a), (lvl - b) / (c2 - b)),
                            "B": ((lvl - d) / (c2 - d), np.ones_like(a)),
                            "L": (np.zeros_like(a), (lvl - a) / (d - a)),
                        }
                    total = 0.0
                    nseg = 0
                    for cs, pairs in _CASE_EDGES.items():
                        sel = case == cs
                        if not sel.any():
                            continue
                        for e1, e2 in pairs:
                            dx = pts[e1][0][sel] - pts[e2][0][sel]
                            dy = pts[e1][1][sel] - pts[e2][1][sel]
                            total += float(np.hypot(dx, dy).sum())
                            nseg += int(sel.sum())
                    recs.append(
                        {
                            "tile_x": int(tx),
                            "tile_y": int(ty),
                            "level": int(lvl),
                            "n_segments": nseg,
                            "total_len_e4": int(np.floor(total * 1e4)),
                        }
                    )
            yield pd.DataFrame(
                recs,
                columns=["tile_x", "tile_y", "level", "n_segments", "total_len_e4"],
            )

    return tiles_df.mapInPandas(count, CONTOUR_SCHEMA)


# ---------------------------------------------------------------------------
# cross-tile contour chaining (global polylines)
# ---------------------------------------------------------------------------

_PIECE_SCHEMA = T.StructType(
    [
        T.StructField("level_i", T.IntegerType()),
        T.StructField("piece_id", T.LongType()),
        T.StructField("closed", T.IntegerType()),
        T.StructField("n_segments", T.LongType()),
        T.StructField("len_e4", T.LongType()),
        T.StructField("key1", T.LongType()),
        T.StructField("key2", T.LongType()),
    ]
)

_KEY_SCALE = 1 << 20


def _endpoint_key(x: float, y: float) -> int:
    kx = int(np.floor(x * _KEY_SCALE + 0.5))
    ky = int(np.floor(y * _KEY_SCALE + 0.5))
    return kx * (1 << 30) + ky


def contour_lines_global(
    tiles_df: DataFrame, levels: list[float], tile_size: int
) -> DataFrame:
    """GLOBAL contour polylines across tile borders (the cross-tile
    completion of contour_polylines; reference: alg/contour.cpp's
    whole-raster polyline assembly, here distributed with the same
    label-graph pattern as operators/dissolve.py).

    1. 1-px south/east halo exchange so the global CELL grid
       partitions exactly across tiles (each 2x2 pixel cell is
       marched by exactly one tile);
    2. per tile: marching squares -> chain_segments; closed rings
       finish locally, open pieces emit endpoint keys (interpolated
       crossing coords are bit-identical across neighbouring tiles,
       so keys join exactly);
    3. pieces sharing an endpoint key become graph edges; iterative
       min-label propagation (operators/graph.py) resolves global
       polylines; a component is a closed ring iff its distinct
       endpoint-key count equals its piece count.

    -> (level, n_polylines, n_closed, n_segments, total_len_e4),
    with total_len_e4 = SUM over segments of floor(seg_len * 1e4)
    (per-segment flooring keeps the sum an exact integer in any
    engine). Input tiles: (tile_x, tile_y, data) float64 buffers.
    """
    from gdal_spark.operators.graph import connected_components

    n = tile_size

    halo_schema = T.StructType(
        [
            T.StructField("to_x", T.IntegerType()),
            T.StructField("to_y", T.IntegerType()),
            T.StructField("dx", T.IntegerType()),
            T.StructField("dy", T.IntegerType()),
            T.StructField("sliver", T.BinaryType()),
        ]
    )

    def emit(batches):
        for pdf in batches:
            recs = []
            for tx, ty, data in zip(pdf["tile_x"], pdf["tile_y"], pdf["data"]):
                arr = np.frombuffer(data, dtype="<f8").reshape(n, n)
                tx, ty = int(tx), int(ty)
                pieces = (
                    (tx, ty, 0, 0, arr),           # body
                    (tx, ty - 1, 0, 1, arr[:1, :]),  # my top row = N's S halo
                    (tx - 1, ty, 1, 0, arr[:, :1]),  # my left col = W's E halo
                    (tx - 1, ty - 1, 1, 1, arr[:1, :1]),
                )
                for to_x, to_y, dx, dy, piece in pieces:
                    recs.append(
                        {
                            "to_x": to_x, "to_y": to_y, "dx": dx, "dy": dy,
                            "sliver": piece.astype("<f8").tobytes(),
                        }
                    )
            yield pd.DataFrame(recs, columns=["to_x", "to_y", "dx", "dy", "sliver"])

    def march(key, pdf: pd.DataFrame) -> pd.DataFrame:
        tx, ty = int(key[0]), int(key[1])
        body = None
        srow = None
        ecol = None
        secorner = None
        for _, row in pdf.iterrows():
            dx, dy = int(row["dx"]), int(row["dy"])
            piece = np.frombuffer(row["sliver"], dtype="<f8")
            if dx == 0 and dy == 0:
                body = piece.reshape(n, n)
            elif dx == 0 and dy == 1:
                srow = piece.reshape(1, n)
            elif dx == 1 and dy == 0:
                ecol = piece.reshape(n, 1)
            else:
                secorner = piece.reshape(1, 1)
        if body is None:
            return pd.DataFrame(columns=[f.name for f in _PIECE_SCHEMA])
        hh = n + (1 if srow is not None else 0)
        ww = n + (1 if ecol is not None else 0)
        arr = np.zeros((hh, ww), dtype=np.float64)
        arr[:n, :n] = body
        if srow is not None:
            arr[n, :n] = srow[0]
        if ecol is not None:
            arr[:n, n] = ecol[:, 0]
        if srow is not None and ecol is not None:
            arr[n, n] = secorner[0, 0] if secorner is not None else 0.0
        ox, oy = tx * n, ty * n
        recs = []
        a = arr[:-1, :-1]; b = arr[:-1, 1:]
        c2 = arr[1:, 1:]; d = arr[1:, :-1]
        for li, lvl in enumerate(levels):
            case = (
                (a >= lvl).astype(np.int8)
                | ((b >= lvl).astype(np.int8) << 1)
                | ((c2 >= lvl).astype(np.int8) << 2)
                | ((d >= lvl).astype(np.int8) << 3)
            )
            with np.errstate(divide="ignore", invalid="ignore"):
                tT = (lvl - a) / (b - a)
                tR = (lvl - b) / (c2 - b)
                tB = (lvl - d) / (c2 - d)
                tL = (lvl - a) / (d - a)
            segs = []
            ys, xs = np.nonzero((case > 0) & (case < 15))
            for y, x in zip(ys, xs):
                pts = {
                    "T": (ox + x + tT[y, x], float(oy + y)),
                    "R": (ox + x + 1.0, oy + y + tR[y, x]),
                    "B": (ox + x + tB[y, x], float(oy + y + 1.0)),
                    "L": (float(ox + x), oy + y + tL[y, x]),
                }
                for e1, e2 in _CASE_EDGES[int(case[y, x])]:
                    p, q = pts[e1], pts[e2]
                    if abs(p[0] - q[0]) > 1e-12 or abs(p[1] - q[1]) > 1e-12:
                        segs.append((p, q))
            for idx, line in enumerate(chain_segments(segs)):
                pts_a = np.asarray(line)
                dxy = np.diff(pts_a, axis=0)
                seglens = np.sqrt(dxy[:, 0] ** 2 + dxy[:, 1] ** 2)
                len_e4 = int(np.floor(seglens * 1e4).astype(np.int64).sum())
                is_closed = (
                    abs(line[0][0] - line[-1][0]) < 1e-12
                    and abs(line[0][1] - line[-1][1]) < 1e-12
                )
                pid = (((tx << 12) | ty) << 28 | (li << 24) | idx)
                recs.append(
                    {
                        "level_i": li,
                        "piece_id": pid,
                        "closed": int(is_closed),
                        "n_segments": len(line) - 1,
                        "len_e4": len_e4,
                        "key1": _endpoint_key(*line[0]),
                        "key2": _endpoint_key(*line[-1]),
                    }
                )
        return pd.DataFrame(recs, columns=[f.name for f in _PIECE_SCHEMA])

    slivers = tiles_df.mapInPandas(emit, halo_schema)
    pieces = (
        slivers.groupBy(
            F.col("to_x").alias("tile_x"), F.col("to_y").alias("tile_y")
        )
        .applyInPandas(march, _PIECE_SCHEMA)
        .localCheckpoint()
    )

    finished = pieces.where(F.col("closed") == 1)
    open_pieces = pieces.where(F.col("closed") == 0)
    # endpoint table: (level, key, piece_id); keys pair pieces into edges
    ends = open_pieces.select(
        "level_i", F.col("key1").alias("key"), "piece_id"
    ).unionByName(
        open_pieces.select("level_i", F.col("key2").alias("key"), "piece_id")
    )
    matched = (
        ends.groupBy("level_i", "key")
        .agg(F.collect_list("piece_id").alias("ids"), F.count("*").alias("deg"))
    )
    edges = matched.where(F.col("deg") == 2).select(
        F.col("ids")[0].alias("src"), F.col("ids")[1].alias("dst")
    ).where(F.col("src") != F.col("dst"))
    roots = connected_components(edges)
    labeled = open_pieces.join(
        roots, open_pieces["piece_id"] == roots["id"], "left"
    ).withColumn("root", F.coalesce("root", "piece_id"))
    comp = labeled.groupBy("level_i", "root").agg(
        F.count("*").alias("n_pieces"),
        F.sum("n_segments").alias("segs"),
        F.sum("len_e4").alias("len_e4"),
    )
    # closed iff every endpoint key is shared: distinct keys == pieces
    keyed = (
        ends.join(
            labeled.select("piece_id", "root"), "piece_id"
        )
        .groupBy("level_i", "root")
        .agg(F.countDistinct("key").alias("n_keys"))
    )
    comp = comp.join(keyed, ["level_i", "root"]).withColumn(
        "is_closed", (F.col("n_keys") == F.col("n_pieces")).cast("int")
    )
    comp_tot = comp.groupBy("level_i").agg(
        F.count("*").alias("n_polylines"),
        F.sum("is_closed").alias("n_closed"),
        F.sum("segs").alias("n_segments"),
        F.sum("len_e4").alias("total_len_e4"),
    )
    fin_tot = finished.groupBy("level_i").agg(
        F.count("*").alias("n_polylines"),
        F.count("*").alias("n_closed"),
        F.sum("n_segments").alias("n_segments"),
        F.sum("len_e4").alias("total_len_e4"),
    )
    lvl_map = F.array(*[F.lit(v) for v in levels])
    return (
        comp_tot.unionByName(fin_tot)
        .groupBy("level_i")
        .agg(
            F.sum("n_polylines").alias("n_polylines"),
            F.sum("n_closed").alias("n_closed"),
            F.sum("n_segments").alias("n_segments"),
            F.sum("total_len_e4").alias("total_len_e4"),
        )
        .select(
            F.element_at(lvl_map, F.col("level_i") + 1).alias("level"),
            F.col("n_polylines").cast("long"),
            F.col("n_closed").cast("long"),
            F.col("n_segments").cast("long"),
            F.col("total_len_e4").cast("long"),
        )
    )


def tin_grid_points(
    points: DataFrame,
    grid_w: int,
    grid_h: int,
    bounds: tuple[float, float, float, float],
    cell_px: int = 16,
    halo_cells: int = 1,
    x_col: str = "px",
    y_col: str = "py",
    v_col: str = "v",
) -> DataFrame:
    """TIN 'linear' gridding (GGA_Linear, alg/gdalgrid.cpp) with the
    point set as a DATAFRAME — nothing is ever collected to the
    driver, so the operator scales with the cluster in both the point
    count and the pixel count (the round-2 tin_grid shipped the whole
    point set in every task closure; this replaces it as the scale
    path).

    Shape: the pixel grid is partitioned into cell_px x cell_px
    tiles; each point EXPLODES to the cells whose halo-expanded
    bounds contain it (Column math, one shuffle on (cx, cy)); each
    cell group triangulates its local neighborhood and rasterizes its
    own pixel window. Every pixel belongs to exactly one cell, so no
    dedup pass is needed.

    Exactness contract: the per-cell triangulation agrees with the
    global one wherever every triangle overlapping the cell has its
    circumcircle inside the halo window. halo_cells=1 is sufficient
    when typical point spacing is below the cell size (the gdalgrid
    fixture regime); for a LINEAR field any valid triangulation
    reproduces values exactly, so only hull coverage at the fringe
    depends on the halo. Sparse domains want a larger halo_cells.
    """
    x0, y0b, x1, y1b = bounds
    resx = (x1 - x0) / grid_w
    resy = (y1b - y0b) / grid_h
    ncx = (grid_w + cell_px - 1) // cell_px
    ncy = (grid_h + cell_px - 1) // cell_px
    cellw = cell_px * resx
    cellh = cell_px * resy
    halox = halo_cells * cellw
    haloy = halo_cells * cellh

    pts = points.select(
        F.col(x_col).cast("double").alias("px"),
        F.col(y_col).cast("double").alias("py"),
        F.col(v_col).cast("double").alias("v"),
    )
    exploded = (
        pts.withColumn(
            "cx",
            F.explode(
                F.sequence(
                    F.greatest(
                        F.lit(0),
                        F.floor((F.col("px") - x0 - halox) / cellw).cast("int"),
                    ),
                    F.least(
                        F.lit(ncx - 1),
                        F.floor((F.col("px") - x0 + halox) / cellw).cast("int"),
                    ),
                )
            ),
        )
        .withColumn(
            "cy",
            F.explode(
                F.sequence(
                    F.greatest(
                        F.lit(0),
                        F.floor((F.col("py") - y0b - haloy) / cellh).cast("int"),
                    ),
                    F.least(
                        F.lit(ncy - 1),
                        F.floor((F.col("py") - y0b + haloy) / cellh).cast("int"),
                    ),
                )
            ),
        )
    )
    schema = T.StructType(
        [
            T.StructField("gx", T.IntegerType()),
            T.StructField("gy", T.IntegerType()),
            T.StructField("v", T.DoubleType()),
        ]
    )

    def run(key, pdf: pd.DataFrame) -> pd.DataFrame:
        from gdal_spark.raster.tin import tin_interpolate_grid

        cx, cy = int(key[0]), int(key[1])
        px0 = cx * cell_px
        py0 = cy * cell_px
        w = min(cell_px, grid_w - px0)
        h = min(cell_px, grid_h - py0)
        local = np.unique(
            np.c_[pdf["px"].to_numpy(), pdf["py"].to_numpy(),
                  pdf["v"].to_numpy()],
            axis=0,
        )
        if len(local) < 3:
            return pd.DataFrame(columns=["gx", "gy", "v"])
        cb = (
            x0 + px0 * resx, y0b + py0 * resy,
            x0 + (px0 + w) * resx, y0b + (py0 + h) * resy,
        )
        vals, mask = tin_interpolate_grid(
            np.ascontiguousarray(local[:, :2]),
            np.ascontiguousarray(local[:, 2]),
            w, h, cb,
        )
        ys, xs = np.nonzero(mask)
        return pd.DataFrame(
            {
                "gx": (xs + px0).astype(np.int32),
                "gy": (ys + py0).astype(np.int32),
                "v": vals[ys, xs],
            },
            columns=["gx", "gy", "v"],
        )

    return exploded.groupBy("cx", "cy").applyInPandas(run, schema)


_BAND_SEG_SCHEMA = T.StructType(
    [
        T.StructField("band", T.IntegerType()),
        T.StructField("x1", T.DoubleType()),
        T.StructField("y1", T.DoubleType()),
        T.StructField("x2", T.DoubleType()),
        T.StructField("y2", T.DoubleType()),
    ]
)

_BAND_SCHEMA = T.StructType(
    [
        T.StructField("band", T.IntegerType()),
        T.StructField("n_polys", T.IntegerType()),
        T.StructField("n_rings", T.IntegerType()),
        T.StructField("area_q16", T.LongType()),
    ]
)


def contour_polygons(
    tiles_df: DataFrame,
    levels: list[float],
    tile_size: int,
    raster_w: int,
    raster_h: int,
) -> DataFrame:
    """Contour POLYGON bands — the reference's `-p` mode
    (alg/contour.cpp polygon path feeding
    alg/marching_squares/polygon_ring_appender.h): for every interval
    [levels[i], levels[i+1]) assemble the banded region's polygons
    and report (band, n_polys, n_rings, area_q16).

    Distribution shape:
    1. (distributed, pixel-sized) the same 1-px south/east halo
       exchange as contour_lines_global, then per tile the band
       BOUNDARY segments: marching-squares iso-chords at both
       bounding levels plus raster-border runs where the band meets
       the domain edge. Boundary output is O(iso-line length), never
       pixels.
    2. (band-partitioned) groupBy(band) -> endpoint-chain the
       segments into closed rings (chain_segments), orient/nest them
       (rings_to_polygons) and measure. A band's boundary is
       perimeter-sized, so the per-band assembly group matches the
       reference's sequential ring appender while bands fan out in
       parallel.

    Values at lattice points must never equal a level (pick
    quarter-offset levels) so every crossing is transversal and
    endpoint keys are bit-identical across tiles.
    """
    n = tile_size
    n_bands = len(levels) - 1
    if n_bands < 1:
        raise ValueError("contour_polygons needs >= 2 levels")

    halo_schema = T.StructType(
        [
            T.StructField("to_x", T.IntegerType()),
            T.StructField("to_y", T.IntegerType()),
            T.StructField("dx", T.IntegerType()),
            T.StructField("dy", T.IntegerType()),
            T.StructField("sliver", T.BinaryType()),
        ]
    )

    def emit(batches):
        for pdf in batches:
            recs = []
            for tx, ty, data in zip(pdf["tile_x"], pdf["tile_y"], pdf["data"]):
                arr = np.frombuffer(data, dtype="<f8").reshape(n, n)
                tx, ty = int(tx), int(ty)
                for to_x, to_y, dx, dy, piece in (
                    (tx, ty, 0, 0, arr),
                    (tx, ty - 1, 0, 1, arr[:1, :]),
                    (tx - 1, ty, 1, 0, arr[:, :1]),
                    (tx - 1, ty - 1, 1, 1, arr[:1, :1]),
                ):
                    recs.append(
                        {
                            "to_x": to_x, "to_y": to_y, "dx": dx, "dy": dy,
                            "sliver": piece.astype("<f8").tobytes(),
                        }
                    )
            yield pd.DataFrame(recs, columns=["to_x", "to_y", "dx", "dy", "sliver"])

    def _border_runs(p_v, q_v, p_xy, q_xy, recs):
        """Emit sub-segments of lattice border edge (p,q) where the
        interpolated value lies in each band."""
        cuts = [0.0, 1.0]
        for lvl in levels:
            if (p_v < lvl) != (q_v < lvl):
                cuts.append((lvl - p_v) / (q_v - p_v))
        cuts = sorted(set(cuts))
        for lo_t, hi_t in zip(cuts[:-1], cuts[1:]):
            if hi_t <= lo_t:
                continue
            vm = p_v + 0.5 * (lo_t + hi_t) * (q_v - p_v)
            for bi in range(n_bands):
                if levels[bi] <= vm < levels[bi + 1]:
                    x1 = p_xy[0] + lo_t * (q_xy[0] - p_xy[0])
                    y1 = p_xy[1] + lo_t * (q_xy[1] - p_xy[1])
                    x2 = p_xy[0] + hi_t * (q_xy[0] - p_xy[0])
                    y2 = p_xy[1] + hi_t * (q_xy[1] - p_xy[1])
                    recs.append(
                        {"band": bi, "x1": x1, "y1": y1, "x2": x2, "y2": y2}
                    )
                    break

    def march(key, pdf: pd.DataFrame) -> pd.DataFrame:
        tx, ty = int(key[0]), int(key[1])
        body = srow = ecol = secorner = None
        for _, row in pdf.iterrows():
            dx, dy = int(row["dx"]), int(row["dy"])
            piece = np.frombuffer(row["sliver"], dtype="<f8")
            if dx == 0 and dy == 0:
                body = piece.reshape(n, n)
            elif dx == 0 and dy == 1:
                srow = piece.reshape(1, n)
            elif dx == 1 and dy == 0:
                ecol = piece.reshape(n, 1)
            else:
                secorner = piece.reshape(1, 1)
        if body is None:
            return pd.DataFrame(columns=[f.name for f in _BAND_SEG_SCHEMA])
        hh = n + (1 if srow is not None else 0)
        ww = n + (1 if ecol is not None else 0)
        arr = np.zeros((hh, ww), dtype=np.float64)
        arr[:n, :n] = body
        if srow is not None:
            arr[n, :n] = srow[0]
        if ecol is not None:
            arr[:n, n] = ecol[:, 0]
        if srow is not None and ecol is not None:
            arr[n, n] = secorner[0, 0] if secorner is not None else 0.0
        ox, oy = tx * n, ty * n
        recs: list[dict] = []
        a = arr[:-1, :-1]; b = arr[:-1, 1:]
        c2 = arr[1:, 1:]; d = arr[1:, :-1]
        # iso-chords: level i bounds band i (below) and band i-1 (above)
        for li, lvl in enumerate(levels):
            case = (
                (a >= lvl).astype(np.int8)
                | ((b >= lvl).astype(np.int8) << 1)
                | ((c2 >= lvl).astype(np.int8) << 2)
                | ((d >= lvl).astype(np.int8) << 3)
            )
            with np.errstate(divide="ignore", invalid="ignore"):
                tT = (lvl - a) / (b - a)
                tR = (lvl - b) / (c2 - b)
                tB = (lvl - d) / (c2 - d)
                tL = (lvl - a) / (d - a)
            ys, xs = np.nonzero((case > 0) & (case < 15))
            for y, x in zip(ys, xs):
                pts = {
                    "T": (ox + x + tT[y, x], float(oy + y)),
                    "R": (ox + x + 1.0, oy + y + tR[y, x]),
                    "B": (ox + x + tB[y, x], float(oy + y + 1.0)),
                    "L": (float(ox + x), oy + y + tL[y, x]),
                }
                for e1, e2 in _CASE_EDGES[int(case[y, x])]:
                    p, q = pts[e1], pts[e2]
                    if abs(p[0] - q[0]) <= 1e-12 and abs(p[1] - q[1]) <= 1e-12:
                        continue
                    for bi in (li, li - 1):
                        if 0 <= bi < n_bands:
                            recs.append(
                                {
                                    "band": bi, "x1": p[0], "y1": p[1],
                                    "x2": q[0], "y2": q[1],
                                }
                            )
        # raster-border runs (only tiles touching the domain edge)
        gy0, gx0 = oy, ox
        rows_here = arr.shape[0]
        cols_here = arr.shape[1]
        for yy in range(rows_here - 1):
            gy = gy0 + yy
            if gx0 == 0:
                _border_runs(
                    arr[yy, 0], arr[yy + 1, 0],
                    (0.0, float(gy)), (0.0, float(gy + 1)), recs,
                )
            if gx0 + cols_here - 1 == raster_w - 1:
                gx_r = float(raster_w - 1)
                _border_runs(
                    arr[yy, cols_here - 1], arr[yy + 1, cols_here - 1],
                    (gx_r, float(gy)), (gx_r, float(gy + 1)), recs,
                )
        for xx in range(cols_here - 1):
            gx = gx0 + xx
            if gy0 == 0:
                _border_runs(
                    arr[0, xx], arr[0, xx + 1],
                    (float(gx), 0.0), (float(gx + 1), 0.0), recs,
                )
            if gy0 + rows_here - 1 == raster_h - 1:
                gy_b = float(raster_h - 1)
                _border_runs(
                    arr[rows_here - 1, xx], arr[rows_here - 1, xx + 1],
                    (float(gx), gy_b), (float(gx + 1), gy_b), recs,
                )
        return pd.DataFrame(recs, columns=[f.name for f in _BAND_SEG_SCHEMA])

    slivers = tiles_df.mapInPandas(emit, halo_schema)
    segs = slivers.groupBy(
        F.col("to_x").alias("tile_x"), F.col("to_y").alias("tile_y")
    ).applyInPandas(march, _BAND_SEG_SCHEMA)

    def assemble(key, pdf: pd.DataFrame) -> pd.DataFrame:
        from gdal_spark.geo.boolean import rings_to_polygons
        from gdal_spark.geo.geom import ring_area

        band = int(key[0])
        segments = [
            ((x1, y1), (x2, y2))
            for x1, y1, x2, y2 in zip(
                pdf["x1"], pdf["y1"], pdf["x2"], pdf["y2"]
            )
        ]
        rings = []
        for line in chain_segments(segments, snap=1.0 / _KEY_SCALE):
            if (
                abs(line[0][0] - line[-1][0]) < 1e-9
                and abs(line[0][1] - line[-1][1]) < 1e-9
                and len(line) >= 4
            ):
                rings.append(np.asarray(line, dtype=np.float64))
        polys = rings_to_polygons(rings)
        area = 0.0
        n_rings = 0
        for p in polys:
            area += abs(ring_area(p[0]))
            for hole in p[1:]:
                area -= abs(ring_area(hole))
            n_rings += len(p)
        return pd.DataFrame(
            [
                {
                    "band": band, "n_polys": len(polys),
                    "n_rings": n_rings,
                    "area_q16": int(np.rint(area * 16)),
                }
            ],
            columns=[f.name for f in _BAND_SCHEMA],
        )

    return segs.groupBy("band").applyInPandas(assemble, _BAND_SCHEMA)
