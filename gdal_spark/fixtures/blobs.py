"""Blob fixture family for the GENERAL overlay kernel: non-convex
outer rings (edge notch) with a rectangular hole, on a planar grid.

Two layers in general position by construction:

- layer A (input side): coordinates on the INTEGER lattice, one blob
  strictly inside each pitch-16 cell (col = fid % 10, row = fid //
  10), margins >= 2 so features of the layer are pairwise disjoint
  and share no coordinate lines;
- layer B (method side): same construction with different LCG
  multipliers, origin shifted by half a pitch (+8) AND half a unit
  (+0.5) per axis — every B coordinate is a half-integer, so A and B
  edges are never collinear and never share vertices (the boolean
  kernel's general-position contract holds for every A x B pair and
  for any chain of differences: within-layer features are disjoint).

Each blob = outer rect MINUS a notch rect cut into the top edge
(making the 8-vertex outer ring non-convex) MINUS an interior hole
rect (vertically separated from the notch). Because the three rects
have closed-form integer (half-unit) bounds derived from fid, every
pairwise overlay AREA is a +/- inclusion-exclusion over nine
rectangle intersections — exactly computable in DuckDB SQL in
half-unit integers (areas in quarter-cells, `_q4`).

All coordinates are dyadic (k/2), so numpy shoelace areas are exact
floats and `area*4` is an exact integer: the Spark kernel output and
the SQL closed form must match to the bit.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from gdal_spark.geo.wkb import wkb_polygon

PITCH = 16
GRID_COLS = 10

# per-layer LCG multipliers: (x0, y0, w, h, nx, nd, hx)
_A_MULT = (13, 17, 19, 23, 29, 31, 37)
_B_MULT = (11, 7, 41, 43, 47, 53, 59)


def blob_params(fid: int, layer: str) -> dict[str, float]:
    """Closed-form rect bounds (outer R, notch N, hole H) for a blob.
    Layer 'a': integer coords; layer 'b': half-integer coords with a
    half-pitch origin shift (general position vs 'a' guaranteed);
    layer 'c': layer-b multipliers on the INTEGER lattice with NO
    offsets — collocated with layer 'a' cells and sharing lattice
    lines: the DEGENERATE-overlay fixture (shared edges/vertices,
    collinear overlaps; for fid % 3 == 0 the 'a' and 'c' blobs are
    bit-identical)."""
    m = _A_MULT if layer == "a" else _B_MULT
    col = fid % GRID_COLS
    row = fid // GRID_COLS
    ox = col * PITCH + (PITCH // 2 if layer == "b" else 0)
    oy = row * PITCH + (PITCH // 2 if layer == "b" else 0)
    half = 0.5 if layer == "b" else 0.0
    x0 = ox + 2 + (fid * m[0]) % 3 + half
    y0 = oy + 2 + (fid * m[1]) % 3 + half
    x1 = x0 + 9 + (fid * m[2]) % 3
    y1 = y0 + 9 + (fid * m[3]) % 3
    nx0 = x0 + 2 + (fid * m[4]) % 2
    nx1 = nx0 + 2
    nd = 2 + (fid * m[5]) % 2
    hx0 = x0 + 1 + (fid * m[6]) % 2
    return {
        "x0": x0, "y0": y0, "x1": x1, "y1": y1,
        "nx0": nx0, "nx1": nx1, "ny0": y1 - nd, "ny1": y1,
        "hx0": hx0, "hx1": hx0 + 2, "hy0": y0 + 1, "hy1": y0 + 3,
    }


def blob_rings(fid: int, layer: str) -> list[np.ndarray]:
    """Rings: 8-vertex non-convex outer (CCW) + 4-vertex hole (CW)."""
    p = blob_params(fid, layer)
    outer = np.array(
        [
            [p["x0"], p["y0"]], [p["x1"], p["y0"]], [p["x1"], p["y1"]],
            [p["nx1"], p["y1"]], [p["nx1"], p["ny0"]], [p["nx0"], p["ny0"]],
            [p["nx0"], p["y1"]], [p["x0"], p["y1"]], [p["x0"], p["y0"]],
        ],
        dtype=np.float64,
    )
    hole = np.array(
        [
            [p["hx0"], p["hy0"]], [p["hx0"], p["hy1"]],
            [p["hx1"], p["hy1"]], [p["hx1"], p["hy0"]],
            [p["hx0"], p["hy0"]],
        ],
        dtype=np.float64,
    )
    return [outer, hole]


def _blob_wkb(layer: str):
    @F.pandas_udf(T.BinaryType())
    def make(fid: pd.Series) -> pd.Series:
        return fid.map(lambda f: wkb_polygon(blob_rings(int(f), layer)))

    return make


def build_blobs(
    spark: SparkSession,
    layer: str,
    n: int | None = None,
    ids_df: DataFrame | None = None,
    fid_col: str = "fid",
) -> DataFrame:
    """-> (fid, geometry, bxmin, bymin, bxmax, bymax): blob layer with
    bbox columns as Column math (SQL-twin-able; WKB never parsed for
    the candidate join)."""
    if ids_df is None:
        assert n is not None
        ids_df = spark.range(n).withColumnRenamed("id", "fid")
    df = ids_df.select(F.col(fid_col).cast("long").alias("fid"))
    m = _A_MULT if layer == "a" else _B_MULT
    shift = PITCH // 2 if layer == "b" else 0
    half = 0.5 if layer == "b" else 0.0
    col = F.col("fid") % GRID_COLS
    row = F.expr(f"fid div {GRID_COLS}")
    x0 = col * PITCH + shift + 2 + (F.col("fid") * m[0]) % 3 + half
    y0 = row * PITCH + shift + 2 + (F.col("fid") * m[1]) % 3 + half
    x1 = x0 + 9 + (F.col("fid") * m[2]) % 3
    y1 = y0 + 9 + (F.col("fid") * m[3]) % 3
    return (
        df.withColumn("bxmin", x0.cast("double"))
        .withColumn("bymin", y0.cast("double"))
        .withColumn("bxmax", x1.cast("double"))
        .withColumn("bymax", y1.cast("double"))
        .withColumn("geometry", _blob_wkb(layer)(F.col("fid")))
    )


# ---------------------------------------------------------------------------
# DuckDB twin: per-fid rect bounds in HALF-UNIT integers (x2 scale)
# ---------------------------------------------------------------------------

def sql_blob_cte(id_expr: str, src: str, layer: str) -> str:
    """CTE body: one row per fid with outer/notch/hole bounds in
    half-units (all BIGINT; layer b's +0.5 becomes +1)."""
    m = _A_MULT if layer == "a" else _B_MULT
    shift = PITCH // 2 if layer == "b" else 0
    halfu = 1 if layer == "b" else 0  # +0.5 in half-units
    p2 = 2 * PITCH
    return f"""
SELECT fid,
  x0, y0,
  x0 + 18 + 2 * ((fid * {m[2]}) % 3) AS x1,
  y0 + 18 + 2 * ((fid * {m[3]}) % 3) AS y1,
  x0 + 4 + 2 * ((fid * {m[4]}) % 2) AS nx0,
  x0 + 8 + 2 * ((fid * {m[4]}) % 2) AS nx1,
  y0 + 18 + 2 * ((fid * {m[3]}) % 3) - 4 - 2 * ((fid * {m[5]}) % 2) AS ny0,
  y0 + 18 + 2 * ((fid * {m[3]}) % 3) AS ny1,
  x0 + 2 + 2 * ((fid * {m[6]}) % 2) AS hx0,
  x0 + 6 + 2 * ((fid * {m[6]}) % 2) AS hx1,
  y0 + 2 AS hy0,
  y0 + 6 AS hy1
FROM (
  SELECT fid,
    (fid % {GRID_COLS}) * {p2} + {2 * shift} + 4 + 2 * ((fid * {m[0]}) % 3) + {halfu} AS x0,
    (fid // {GRID_COLS}) * {p2} + {2 * shift} + 4 + 2 * ((fid * {m[1]}) % 3) + {halfu} AS y0
  FROM (SELECT cast({id_expr} as bigint) AS fid FROM {src})
)"""


def sql_pair_inter_q4(a: str = "ba", b: str = "bb") -> str:
    """SQL expression: area(A intersect B) in quarter-cells via the
    9-term inclusion-exclusion over (R - N - H) x (R - N - H);
    operands are the half-unit CTE rows aliased `a`/`b`."""

    def rect(alias: str, part: str) -> tuple[str, str, str, str]:
        if part == "R":
            return (f"{alias}.x0", f"{alias}.y0", f"{alias}.x1", f"{alias}.y1")
        if part == "N":
            return (f"{alias}.nx0", f"{alias}.ny0", f"{alias}.nx1", f"{alias}.ny1")
        return (f"{alias}.hx0", f"{alias}.hy0", f"{alias}.hx1", f"{alias}.hy1")

    terms = []
    for pa, sa in (("R", 1), ("N", -1), ("H", -1)):
        for pb, sb in (("R", 1), ("N", -1), ("H", -1)):
            ax0, ay0, ax1, ay1 = rect(a, pa)
            bx0, by0, bx1, by1 = rect(b, pb)
            t = (
                f"greatest(0, least({ax1}, {bx1}) - greatest({ax0}, {bx0}))"
                f" * greatest(0, least({ay1}, {by1}) - greatest({ay0}, {by0}))"
            )
            terms.append(("+" if sa * sb > 0 else "-") + f" {t}")
    return "(" + " ".join(terms).lstrip("+ ") + ")"


def sql_blob_area_q4(alias: str) -> str:
    """Own area in quarter-cells: |R| - |N| - |H| (half-unit bounds)."""
    return (
        f"(({alias}.x1 - {alias}.x0) * ({alias}.y1 - {alias}.y0)"
        f" - ({alias}.nx1 - {alias}.nx0) * ({alias}.ny1 - {alias}.ny0)"
        f" - ({alias}.hx1 - {alias}.hx0) * ({alias}.hy1 - {alias}.hy0))"
    )
