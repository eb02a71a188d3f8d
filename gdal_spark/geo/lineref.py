"""Linear referencing: Project / Value / getSubLine over a path.

Semantics re-derived from the reference:

- /root/reference/ogr/ogrlinestring.cpp:2102 (``Value``): scan
  segments in order; the FIRST segment whose cumulative range covers
  the distance interpolates ``p_i*(1-r) + p_{i+1}*r``; negative ->
  start point, beyond length -> end point.
- :2167 (``Project``, GEOS ``GEOSProject``): distance from the line
  origin to the closest point on the line — per-segment clamped
  projection, argmin by squared distance with the FIRST minimal
  segment winning.
- :2221 (``getSubLine``): clamped [from, to]; interpolated start
  point (or vertex 0 when from == 0), the path vertices j with
  seg_from < j <= seg_to, then the interpolated end point —
  seg_from/seg_to are the FIRST segments covering each distance.
- /root/reference/apps/ogrlineref.cpp:440-640 (``-create``): parts
  between sorted milepost projections use exactly these primitives.

The path here is METADATA (a handful of vertices, like a cutline or
route): it embeds as literal constants into Column math and into the
DuckDB twin, so every engine-side float op is the same IEEE-exact
+-*/ tree on identical literals — cumulative lengths and segment
norms are PRE-computed in Python and shipped as repr-exact doubles
(tilemath.sql_double), never re-derived with engine sqrt.  The
data-scale side (millions of points/measures) stays a narrow
shuffle-free projection; nothing per-path ever shuffles.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from gdal_spark.fixtures.georef import LCG_A, LCG_C, LCG_M
from gdal_spark.tiles.tilemath import sql_double as _d

__all__ = [
    "demo_path", "np_project", "np_value", "np_subline",
    "locate_points", "subline_rows",
    "sql_locate_points", "sql_subline_rows",
]


# ---------------------------------------------------------------------------
# fixture path (dyadic LCG vertices — exact in float both engines)
# ---------------------------------------------------------------------------

def _lcg(j: int) -> int:
    return (LCG_A * j + LCG_C) % LCG_M


def demo_path(n_vert: int = 9) -> np.ndarray:
    """Deterministic general-position polyline: x strictly increasing
    (no zero-length segments), all coordinates half-integers."""
    pts = []
    for j in range(n_vert):
        u1, u2 = _lcg(2 * j + 1), _lcg(2 * j + 2)
        pts.append((8.0 * j + (u1 % 8) * 0.5, (u2 % 33) * 0.5))
    return np.array(pts, dtype=np.float64)


# ---------------------------------------------------------------------------
# numpy reference kernels (pytest differential truth)
# ---------------------------------------------------------------------------

def _segs(path: np.ndarray):
    a, b = path[:-1], path[1:]
    d = b - a
    l2 = d[:, 0] ** 2 + d[:, 1] ** 2
    seglen = np.sqrt(l2)
    cum = np.concatenate([[0.0], np.cumsum(seglen)[:-1]])
    return a, b, d, l2, seglen, cum


def np_project(path: np.ndarray, px, py):
    """-> (dist_along, seg, closest_x, closest_y) per point."""
    px = np.atleast_1d(np.asarray(px, dtype=np.float64))
    py = np.atleast_1d(np.asarray(py, dtype=np.float64))
    a, b, d, l2, seglen, cum = _segs(path)
    t = ((px[:, None] - a[None, :, 0]) * d[None, :, 0]
         + (py[:, None] - a[None, :, 1]) * d[None, :, 1]) / l2[None, :]
    t = np.clip(t, 0.0, 1.0)
    cx = a[None, :, 0] * (1 - t) + b[None, :, 0] * t
    cy = a[None, :, 1] * (1 - t) + b[None, :, 1] * t
    d2 = (px[:, None] - cx) ** 2 + (py[:, None] - cy) ** 2
    seg = np.argmin(d2, axis=1)           # first minimum wins
    rows = np.arange(len(px))
    dist = cum[seg] + t[rows, seg] * seglen[seg]
    return dist, seg, cx[rows, seg], cy[rows, seg]


def np_value(path: np.ndarray, m: float) -> tuple[float, float]:
    """ogrlinestring.cpp:2102 — first covering segment interpolates."""
    if m < 0:
        return float(path[0, 0]), float(path[0, 1])
    a, b, _, _, seglen, cum = _segs(path)
    for i in range(len(seglen)):
        if cum[i] <= m <= cum[i] + seglen[i]:
            r = (m - cum[i]) / seglen[i]
            return (float(a[i, 0] * (1 - r) + b[i, 0] * r),
                    float(a[i, 1] * (1 - r) + b[i, 1] * r))
    return float(path[-1, 0]), float(path[-1, 1])


def np_subline(path: np.ndarray, m_from: float, m_to: float) -> np.ndarray:
    """ogrlinestring.cpp:2221 (clamped).  At m_from == 0 the reference
    adds vertex 0 and then RESTARTS the vertex loop at i=0
    (ogrlinestring.cpp:2256,2343), duplicating the start point — the
    sf=-1 branch below reproduces that quirk exactly."""
    a, b, _, _, seglen, cum = _segs(path)
    total = float(cum[-1] + seglen[-1])
    m_from = max(0.0, m_from)
    m_to = min(total, m_to)
    if m_from > m_to or m_from >= total:
        raise ValueError("input distances are invalid")
    if m_from == 0:
        sf = -1
        out = [tuple(path[0])]
    else:
        sf = next(i for i in range(len(seglen))
                  if cum[i] <= m_from <= cum[i] + seglen[i])
        out = [np_value(path, m_from)]
    st = next(i for i in range(len(seglen))
              if i >= max(sf, 0) and cum[i] <= m_to <= cum[i] + seglen[i])
    for j in range(sf + 1, st + 1):
        out.append(tuple(path[j]))
    out.append(np_value(path, m_to))
    return np.array(out, dtype=np.float64)


# ---------------------------------------------------------------------------
# shared constant tables (python floats -> identical literals both engines)
# ---------------------------------------------------------------------------

def _const_segs(path: np.ndarray):
    a, b, d, l2, seglen, cum = _segs(path)
    return [
        {
            "seg": i,
            "ax": float(a[i, 0]), "ay": float(a[i, 1]),
            "bx": float(b[i, 0]), "by": float(b[i, 1]),
            "dx": float(d[i, 0]), "dy": float(d[i, 1]),
            "l2": float(l2[i]), "seglen": float(seglen[i]),
            "cum": float(cum[i]),
        }
        for i in range(len(seglen))
    ]


def path_length(path: np.ndarray) -> float:
    _, _, _, _, seglen, cum = _segs(path)
    return float(cum[-1] + seglen[-1])


# ---------------------------------------------------------------------------
# Spark Column math
# ---------------------------------------------------------------------------

def locate_points(pts: DataFrame, path: np.ndarray,
                  x_col: str = "px", y_col: str = "py") -> DataFrame:
    """Project: adds (seg, dist, cx, cy).  Shuffle-free: the argmin
    is array_min over a constant-length struct array whose FIRST
    field is d2 and SECOND the segment index — Spark struct ordering
    reproduces GEOS's first-minimal-segment rule exactly."""
    cands = []
    for s in _const_segs(path):
        t = (
            f"least(cast(1.0 as double), greatest(cast(0.0 as double), "
            f"(({x_col} - {_d(s['ax'])}) * {_d(s['dx'])} + "
            f"({y_col} - {_d(s['ay'])}) * {_d(s['dy'])}) / {_d(s['l2'])}))"
        )
        cx = f"({_d(s['ax'])} * (1 - {t}) + {_d(s['bx'])} * {t})"
        cy = f"({_d(s['ay'])} * (1 - {t}) + {_d(s['by'])} * {t})"
        cands.append(
            f"struct((({x_col}) - {cx}) * (({x_col}) - {cx}) + "
            f"(({y_col}) - {cy}) * (({y_col}) - {cy}) AS d2, "
            f"{s['seg']} AS seg, "
            f"{_d(s['cum'])} + {t} * {_d(s['seglen'])} AS dist, "
            f"{cx} AS cx, {cy} AS cy)"
        )
    best = f"array_min(array({', '.join(cands)}))"
    return pts.withColumn("_b", F.expr(best)).select(
        "*",
        F.col("_b.seg").cast("int").alias("seg"),
        F.col("_b.dist").alias("dist"),
        F.col("_b.cx").alias("cx"),
        F.col("_b.cy").alias("cy"),
    ).drop("_b")


def _covering_seg(segs: list[dict], m: str, lo: str = "-1") -> str:
    """First segment covering measure `m` with seg > lo — Spark/DuckDB
    shared text: min seg among candidates (scan order == min index)."""
    cands = ", ".join(
        f"CASE WHEN {s['seg']} > ({lo}) AND {_d(s['cum'])} <= ({m}) "
        f"AND ({m}) <= {_d(s['cum'])} + {_d(s['seglen'])} "
        f"THEN {s['seg']} ELSE {len(segs)} END"
        for s in segs
    )
    # least(): portable Spark SQL + DuckDB (array_min/list_min are not)
    return f"least({cands})"


def _interp(segs: list[dict], seg: str, m: str, axis: str) -> str:
    """Interpolated coordinate on segment `seg` at measure `m` —
    p_i*(1-r) + p_{i+1}*r, the Value() formula, shared text."""
    expr = "cast(0.0 as double)"
    lo = "a" + ("x" if axis == "x" else "y")
    hi = "b" + ("x" if axis == "x" else "y")
    for s in segs:
        r = f"((({m}) - {_d(s['cum'])}) / {_d(s['seglen'])})"
        expr = (
            f"CASE WHEN ({seg}) = {s['seg']} THEN "
            f"{_d(s[lo])} * (1 - {r}) + {_d(s[hi])} * {r} "
            f"ELSE {expr} END"
        )
    return expr


def subline_rows(df: DataFrame, path: np.ndarray,
                 m_from: str = "m_from", m_to: str = "m_to") -> DataFrame:
    """getSubLine per input row -> exploded (vtx, x, y) vertex rows.
    m_to must be pre-clamped to the path length; 0 <= m_from <= m_to.
    m_from == 0 mirrors the reference's duplicate-start quirk
    (ogrlinestring.cpp:2256: vertex 0 is emitted, then the add-points
    loop restarts at i=0 and emits it again) via the _sf = -1 branch.
    Pure Column math: vertex emission is a constant-width explode."""
    segs = _const_segs(path)
    n = len(segs)
    sf = f"CASE WHEN ({m_from}) = 0 THEN -1 ELSE {_covering_seg(segs, m_from)} END"
    df = df.withColumn("_sf", F.expr(sf).cast("int"))
    st = _covering_seg(segs, m_to, lo="_sf - 1")
    df = df.withColumn("_st", F.expr(st).cast("int"))
    # vertex ordinal v: 0 = interpolated start; 1.._st-_sf = path
    # vertices _sf+1.._st; _st-_sf+1 = interpolated end
    vtx_x = "cast(0.0 as double)"
    vtx_y = "cast(0.0 as double)"
    for s in segs + [
        {"seg": n, "ax": float(path[-1, 0]), "ay": float(path[-1, 1])}
    ]:
        vtx_x = (f"CASE WHEN _sf + _v = {s['seg']} THEN {_d(s['ax'])} "
                 f"ELSE {vtx_x} END")
        vtx_y = (f"CASE WHEN _sf + _v = {s['seg']} THEN {_d(s['ay'])} "
                 f"ELSE {vtx_y} END")
    out = (
        df.withColumn("_v", F.explode(F.expr(
            "sequence(0, _st - _sf + 1)")))
        .withColumn(
            "x",
            F.expr(
                f"CASE WHEN _v = 0 AND _sf = -1 THEN {_d(segs[0]['ax'])} "
                f"WHEN _v = 0 THEN {_interp(segs, '_sf', m_from, 'x')} "
                f"WHEN _v = _st - _sf + 1 THEN "
                f"{_interp(segs, '_st', m_to, 'x')} "
                f"ELSE {vtx_x} END"
            ),
        )
        .withColumn(
            "y",
            F.expr(
                f"CASE WHEN _v = 0 AND _sf = -1 THEN {_d(segs[0]['ay'])} "
                f"WHEN _v = 0 THEN {_interp(segs, '_sf', m_from, 'y')} "
                f"WHEN _v = _st - _sf + 1 THEN "
                f"{_interp(segs, '_st', m_to, 'y')} "
                f"ELSE {vtx_y} END"
            ),
        )
        .withColumn("vtx", F.col("_v").cast("int"))
        .drop("_v", "_sf", "_st")
    )
    return out


# ---------------------------------------------------------------------------
# DuckDB twins (identical expression text on identical literals)
# ---------------------------------------------------------------------------

def sql_locate_points(path: np.ndarray, pts_cte: str,
                      x_col: str = "px", y_col: str = "py") -> str:
    """pts_cte must expose (i, {x_col}, {y_col}).  -> CTE body ending
    in `loc` with (i, seg, dist, cx, cy)."""
    segs = _const_segs(path)
    rows = " UNION ALL ".join(
        f"SELECT {s['seg']} AS seg, {_d(s['ax'])} AS ax, {_d(s['ay'])} AS ay,"
        f" {_d(s['bx'])} AS bx, {_d(s['by'])} AS by, {_d(s['dx'])} AS dx,"
        f" {_d(s['dy'])} AS dy, {_d(s['l2'])} AS l2,"
        f" {_d(s['seglen'])} AS seglen, {_d(s['cum'])} AS cum"
        for s in segs
    )
    return f"""
pts AS ({pts_cte}),
segs AS ({rows}),
cand AS (
  SELECT p.i, s.seg,
    least(cast(1.0 as double), greatest(cast(0.0 as double),
      ((p.{x_col} - s.ax) * s.dx + (p.{y_col} - s.ay) * s.dy) / s.l2)) AS t,
    s.ax, s.ay, s.bx, s.by, s.seglen, s.cum
  FROM pts p CROSS JOIN segs s
),
proj AS (
  SELECT i, seg, ax * (1 - t) + bx * t AS cx, ay * (1 - t) + by * t AS cy,
         cum + t * seglen AS dist, t
  FROM cand
),
scored AS (
  SELECT p.i, p.seg, p.cx, p.cy, p.dist,
    (q.{x_col} - p.cx) * (q.{x_col} - p.cx)
      + (q.{y_col} - p.cy) * (q.{y_col} - p.cy) AS d2
  FROM proj p JOIN pts q ON q.i = p.i
),
loc AS (
  SELECT i, seg, dist, cx, cy FROM (
    SELECT i, seg, dist, cx, cy,
      row_number() OVER (PARTITION BY i ORDER BY d2, seg) AS rn
    FROM scored) WHERE rn = 1
)"""


def sql_subline_rows(path: np.ndarray, m_cte: str,
                     m_from: str = "m_from", m_to: str = "m_to") -> str:
    """m_cte must expose (i, {m_from}, {m_to}).  -> CTE body ending in
    `sub` with (i, vtx, x, y) — same branch logic as subline_rows,
    including the m_from == 0 duplicate-start quirk (_sf = -1)."""
    segs = _const_segs(path)
    n = len(segs)
    sf = (f"CASE WHEN ({m_from}) = 0 THEN -1 "
          f"ELSE {_covering_seg(segs, m_from)} END")
    st = _covering_seg(segs, m_to, lo="_sf - 1")
    vx = "cast(0.0 as double)"
    vy = "cast(0.0 as double)"
    for s in segs + [
        {"seg": n, "ax": float(path[-1, 0]), "ay": float(path[-1, 1])}
    ]:
        vx = (f"CASE WHEN b._sf + v.v = {s['seg']} THEN {_d(s['ax'])} "
              f"ELSE {vx} END")
        vy = (f"CASE WHEN b._sf + v.v = {s['seg']} THEN {_d(s['ay'])} "
              f"ELSE {vy} END")
    ix0 = _interp(segs, "b._sf", f"b.{m_from}", "x")
    iy0 = _interp(segs, "b._sf", f"b.{m_from}", "y")
    ix1 = _interp(segs, "b._st", f"b.{m_to}", "x")
    iy1 = _interp(segs, "b._st", f"b.{m_to}", "y")
    return f"""
m AS ({m_cte}),
bounds0 AS (
  SELECT i, {m_from}, {m_to}, cast({sf} as int) AS _sf FROM m
),
bounds AS (
  SELECT i, {m_from}, {m_to}, _sf, cast({st} as int) AS _st FROM bounds0
),
sub AS (
  SELECT b.i, cast(v.v as int) AS vtx,
    CASE WHEN v.v = 0 AND b._sf = -1 THEN {_d(segs[0]['ax'])}
         WHEN v.v = 0 THEN {ix0}
         WHEN v.v = b._st - b._sf + 1 THEN {ix1}
         ELSE {vx} END AS x,
    CASE WHEN v.v = 0 AND b._sf = -1 THEN {_d(segs[0]['ay'])}
         WHEN v.v = 0 THEN {iy0}
         WHEN v.v = b._st - b._sf + 1 THEN {iy1}
         ELSE {vy} END AS y
  FROM bounds b JOIN range(0, {n + 2}) AS v(v)
    ON v.v <= b._st - b._sf + 1
)"""
