"""Coverage-preserving polygon simplification — `gdal vector
simplify_coverage` (apps/gdalalg_vector_simplify_coverage.cpp, which
delegates to GEOSCoverageSimplifyVW_r at :129).

Semantics re-derived from the GEOS CoverageSimplifier model:

- the coverage's polygon boundaries decompose into EDGE CHAINS:
  maximal vertex paths whose segments are shared by the same set of
  owners (an interior chain belongs to exactly two polygons; an outer
  chain to one);
- chain ENDPOINTS are nodes where ownership changes (three-way
  corners, coverage boundary joins) and are never moved;
- each chain is simplified INDEPENDENTLY with Visvalingam-Whyatt:
  repeatedly drop the interior vertex whose effective triangle area
  is smallest, while that area is below tolerance^2 (the distance
  tolerance squared — the VW area dual of a distance tolerance);
- both owners of a chain receive the SAME simplified vertex path, so
  the result remains a valid coverage: no slivers or gaps appear
  (the property per-feature Simplify cannot give);
- `preserve_boundary=True` leaves single-owner (exterior) chains
  untouched, matching the reference's --preserve-boundary flag.

Distributed shape: rings explode to segments (narrow); one groupBy
on the canonical segment key discovers sharing; one groupBy per
chain-group runs the VW kernel (applyInPandas — a chain group is one
polygon-pair boundary, bounded by feature complexity, never corpus-
sized); one final groupBy per (fid, ring) reassembles rings.  Three
bounded shuffles, no driver collection, no cross join.
"""

from __future__ import annotations

import heapq
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from gdal_spark.geo import wkb as wkbmod


def vw_simplify(coords: np.ndarray, tolerance: float) -> np.ndarray:
    """Visvalingam-Whyatt on an open chain; endpoints fixed.  Drops
    interior vertices while the smallest effective triangle area is
    < tolerance**2, recomputing neighbor areas after each removal
    (the sequential VW process — order matters and is deterministic).
    """
    pts = np.asarray(coords, dtype=np.float64)
    n = len(pts)
    if n <= 2:
        return pts
    area_tol = float(tolerance) * float(tolerance)
    prev = np.arange(-1, n - 1)
    nxt = np.arange(1, n + 1)
    alive = np.ones(n, dtype=bool)

    def tri_area(i: int) -> float:
        a, b, c = pts[prev[i]], pts[i], pts[nxt[i]]
        return abs(
            (b[0] - a[0]) * (c[1] - a[1]) - (c[0] - a[0]) * (b[1] - a[1])
        ) / 2.0

    heap = [(tri_area(i), i) for i in range(1, n - 1)]
    heapq.heapify(heap)
    n_alive = n
    while heap:
        area, i = heapq.heappop(heap)
        if not alive[i]:
            continue
        if tri_area(i) != area:  # stale entry after a neighbor removal
            heapq.heappush(heap, (tri_area(i), i))
            continue
        if area >= area_tol or n_alive <= 2:
            break  # an open chain keeps at least its two endpoints
        alive[i] = False
        n_alive -= 1
        p, q = prev[i], nxt[i]
        nxt[p], prev[q] = q, p
        for j in (p, q):
            if 0 < j < n - 1 and alive[j]:
                heapq.heappush(heap, (tri_area(j), j))
    return pts[alive]


def vw_simplify_ring(coords: np.ndarray, tolerance: float) -> np.ndarray:
    """Circular Visvalingam-Whyatt: every vertex is a candidate (no
    pinned endpoints), at least 3 survive.  `coords` is an open ring
    vertex list (first point NOT repeated)."""
    pts = np.asarray(coords, dtype=np.float64)
    n = len(pts)
    if n <= 3:
        return pts
    area_tol = float(tolerance) * float(tolerance)
    prev = np.roll(np.arange(n), 1)
    nxt = np.roll(np.arange(n), -1)
    alive = np.ones(n, dtype=bool)

    def tri_area(i: int) -> float:
        a, b, c = pts[prev[i]], pts[i], pts[nxt[i]]
        return abs(
            (b[0] - a[0]) * (c[1] - a[1]) - (c[0] - a[0]) * (b[1] - a[1])
        ) / 2.0

    heap = [(tri_area(i), i) for i in range(n)]
    heapq.heapify(heap)
    n_alive = n
    while heap:
        area, i = heapq.heappop(heap)
        if not alive[i]:
            continue
        if tri_area(i) != area:
            heapq.heappush(heap, (tri_area(i), i))
            continue
        if area >= area_tol or n_alive <= 3:
            break
        alive[i] = False
        n_alive -= 1
        p, q = prev[i], nxt[i]
        nxt[p], prev[q] = q, p
        for j in (p, q):
            if alive[j]:
                heapq.heappush(heap, (tri_area(j), j))
    return pts[alive]


def _seg_key(x1, y1, x2, y2):
    """Canonical (direction-free) segment key columns."""
    lo_first = (F.col(x1) < F.col(x2)) | (
        (F.col(x1) == F.col(x2)) & (F.col(y1) <= F.col(y2))
    )
    return (
        F.when(lo_first, F.col(x1)).otherwise(F.col(x2)).alias("kx1"),
        F.when(lo_first, F.col(y1)).otherwise(F.col(y2)).alias("ky1"),
        F.when(lo_first, F.col(x2)).otherwise(F.col(x1)).alias("kx2"),
        F.when(lo_first, F.col(y2)).otherwise(F.col(y1)).alias("ky2"),
    )


_SEG_SCHEMA = T.StructType(
    [
        T.StructField("fid", T.LongType()),
        T.StructField("ring", T.IntegerType()),
        T.StructField("seg", T.IntegerType()),
        T.StructField("x1", T.DoubleType()),
        T.StructField("y1", T.DoubleType()),
        T.StructField("x2", T.DoubleType()),
        T.StructField("y2", T.DoubleType()),
    ]
)

_RING_SCHEMA = T.StructType(
    [
        T.StructField("fid", T.LongType()),
        T.StructField("ring", T.IntegerType()),
        T.StructField("n_pts", T.IntegerType()),
        T.StructField("area2", T.DoubleType()),  # signed 2*area
        T.StructField("wkt_ring", T.StringType()),
    ]
)


def _explode_segments(polys: DataFrame, geom_col: str) -> DataFrame:
    def segs(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            recs = []
            for fid, blob in zip(pdf["fid"], pdf[geom_col]):
                g = wkbmod.parse_wkb(bytes(blob))
                # rings of EVERY polygon part (MultiPolygon members
                # get distinct ring ids: part * 4096 + ring)
                all_rings = [
                    (pi * 4096 + k, ring)
                    for pi, rings in enumerate(g.all_rings())
                    for k, ring in enumerate(rings)
                ]
                for ri, ring in all_rings:
                    ring = np.asarray(ring, dtype=np.float64)
                    if np.array_equal(ring[0], ring[-1]):
                        ring = ring[:-1]
                    m = len(ring)
                    for si in range(m):
                        x1, y1 = ring[si]
                        x2, y2 = ring[(si + 1) % m]
                        recs.append(
                            {
                                "fid": int(fid), "ring": ri, "seg": si,
                                "x1": float(x1), "y1": float(y1),
                                "x2": float(x2), "y2": float(y2),
                            }
                        )
            yield pd.DataFrame(
                recs, columns=[f.name for f in _SEG_SCHEMA]
            )

    return polys.mapInPandas(segs, _SEG_SCHEMA)


def simplify_coverage(
    polys: DataFrame,
    tolerance: float,
    geom_col: str = "geometry",
    preserve_boundary: bool = True,
) -> DataFrame:
    """-> DataFrame(fid, ring, n_pts, area2, wkt_ring): the simplified
    ring vertex paths (one row per ring), coverage-consistent across
    owners.  `polys` must carry (fid long, geometry WKB polygon)."""
    segs = _explode_segments(polys.select("fid", geom_col), geom_col)
    keyed = segs.select("*", *_seg_key("x1", "y1", "x2", "y2"))
    keys = ["kx1", "ky1", "kx2", "ky2"]
    # ownership per canonical segment: sorted owner fids define the
    # chain-group; single-owner segments are the coverage exterior.
    owners = keyed.groupBy(*keys).agg(
        F.sort_array(F.collect_list("fid")).alias("owner_fids")
    )
    own = keyed.join(owners, keys).withColumn(
        "grp", F.concat_ws("_", F.col("owner_fids").cast("array<string>"))
    )
    # chain-endpoint discovery: a vertex is a NODE (fixed point) when
    # it touches segments of more than one group, or an odd number of
    # segments of its own group (chain ends).  Degrees must count each
    # CANONICAL segment once — the per-owner rows in `own` would
    # double interior degrees.
    canon = owners.withColumn(
        "grp", F.concat_ws("_", F.col("owner_fids").cast("array<string>"))
    )
    v1 = canon.select(
        F.col("kx1").alias("vx"), F.col("ky1").alias("vy"), "grp"
    )
    v2 = canon.select(
        F.col("kx2").alias("vx"), F.col("ky2").alias("vy"), "grp"
    )
    vdeg = (
        v1.unionByName(v2)
        .groupBy("vx", "vy")
        .agg(
            F.countDistinct("grp").alias("n_grps"),
            F.count(F.lit(1)).alias("deg"),
        )
        .filter((F.col("n_grps") > 1) | (F.col("deg") != 2))
        .select("vx", "vy", F.lit(True).alias("is_node"))
    )

    def chain_simplify(key, pdf: pd.DataFrame) -> pd.DataFrame:
        """One polygon-pair (or exterior) group: walk its segments
        into chains between nodes, VW-simplify each, emit kept
        vertices per original segment owner so rings reassemble."""
        single_owner = "_" not in key[0]
        if preserve_boundary and single_owner:
            keep = pdf[["fid", "ring", "seg", "x1", "y1", "x2", "y2"]].copy()
            keep["drop_v2"] = False
            return keep[["fid", "ring", "seg", "drop_v2"]]
        nodes = {
            (x, y)
            for x, y, isn in zip(pdf["vx"], pdf["vy"], pdf["is_node"])
            if isn
        }
        # adjacency over canonical segments (dedup by key)
        segs_u = pdf.drop_duplicates(subset=["kx1", "ky1", "kx2", "ky2"])
        adj: dict = {}
        for r in segs_u.itertuples():
            a, b = (r.kx1, r.ky1), (r.kx2, r.ky2)
            adj.setdefault(a, []).append(b)
            adj.setdefault(b, []).append(a)
        # every vertex with degree != 2 is implicitly a node
        for v, nb in adj.items():
            if len(nb) != 2:
                nodes.add(v)
        ring_mode = False
        if not nodes:
            # closed loop entirely inside one group: no pinned
            # endpoints — simplify CIRCULARLY (an arbitrary anchor
            # would wrongly protect whichever vertex it landed on)
            ring_mode = True
            nodes = {min(adj)}
        # walk chains node -> node
        dropped: set = set()
        visited: set = set()

        def seg_id(a, b):
            return (a, b) if a <= b else (b, a)

        for start in sorted(nodes):
            for first in sorted(adj.get(start, [])):
                if seg_id(start, first) in visited:
                    continue
                chain = [start, first]
                visited.add(seg_id(start, first))
                while chain[-1] not in nodes:
                    cur, prev = chain[-1], chain[-2]
                    nb = [v for v in adj[cur] if v != prev]
                    if not nb:
                        break
                    chain.append(nb[0])
                    visited.add(seg_id(cur, nb[0]))
                if ring_mode and chain[0] == chain[-1]:
                    pts = np.array(chain[:-1], dtype=np.float64)
                    kept = vw_simplify_ring(pts, tolerance)
                    candidates = chain[:-1]
                else:
                    pts = np.array(chain, dtype=np.float64)
                    kept = vw_simplify(pts, tolerance)
                    candidates = chain[1:-1]
                kset = {(p[0], p[1]) for p in kept}
                for v in candidates:
                    if v not in kset:
                        dropped.add(v)
        out = pdf[["fid", "ring", "seg", "x2", "y2"]].copy()
        out["drop_v2"] = [
            (x, y) in dropped for x, y in zip(out["x2"], out["y2"])
        ]
        return out[["fid", "ring", "seg", "drop_v2"]]

    marked = (
        own.join(
            vdeg,
            (F.col("x2") == F.col("vx")) & (F.col("y2") == F.col("vy")),
            "left",
        )
        .withColumn("is_node", F.coalesce("is_node", F.lit(False)))
        .groupBy("grp")
        .applyInPandas(
            chain_simplify,
            "fid long, ring int, seg int, drop_v2 boolean",
        )
    )

    def rebuild(key, pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("seg")
        pts = [
            (x, y)
            for x, y, drop in zip(pdf["x2"], pdf["y2"], pdf["drop_v2"])
            if not drop
        ]
        arr = np.array(pts, dtype=np.float64)
        x = arr[:, 0]
        y = arr[:, 1]
        area2 = float(
            np.sum(x * np.roll(y, -1) - np.roll(x, -1) * y)
        )
        wkt = ", ".join(f"{repr(px)} {repr(py)}" for px, py in pts)
        return pd.DataFrame(
            [
                {
                    "fid": int(key[0]),
                    "ring": int(key[1]),
                    "n_pts": len(pts),
                    "area2": area2,
                    "wkt_ring": wkt,
                }
            ]
        )

    seg_coords = segs.select("fid", "ring", "seg", "x2", "y2")
    ring_rows = (
        marked.join(seg_coords, ["fid", "ring", "seg"])
        .groupBy("fid", "ring")
        .applyInPandas(rebuild, _RING_SCHEMA)
    )
    return ring_rows
