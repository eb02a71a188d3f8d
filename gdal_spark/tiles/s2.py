"""From-scratch S2 cell-id encoder (the north rule's "H3/S2 cell
encodes") as pure Spark Column math + a small broadcast lookup join.

Semantics re-derived from the PUBLIC s2geometry algorithm description
(cube-face projection, quadratic UV->ST transform, face-local Hilbert
curve with 4 orientation states); the reference repo itself delegates
cell indexing to external libs, so the comparable surface here is the
published S2CellId layout:

    id(64) = face(3 bits) ++ hilbert_pos(2*level bits) ++ 1 ++ 0...

Pipeline (all deterministic closed-form math):

    lat/lng -> unit XYZ -> face (largest-|component| axis, ties to the
    later axis) -> (u,v) in [-1,1]^2 -> quadratic s,t in [0,1] ->
    (i,j) leaf coords (floor(s*2^30), with the engine's +1e-9 snap for
    cross-engine float parity — documented deviation) -> Hilbert
    position via the canonical 4-bit chunk lookup table (built by the
    same InitLookupCell recursion the S2 papers describe) -> cell id.

BIGINT safety: the true uint64 id overflows signed 64 for faces 4-5,
so the engine's join key is `face * 4^level + pos_level` (< 2^62 for
level <= 29) and the REAL S2 id is carried as its canonical hex token
string (trailing zero hex digits stripped), computed via an exact
hi/lo 32-bit split — directly comparable against the public s2 library.

Scale: the Hilbert fold is 8 chained equi-joins against a 1024-row
lookup table — each plans as a BroadcastHashJoin (probe-only, no
shuffle), so the encode is a narrow map over any corpus size.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from gdal_spark.tiles.tilemath import sql_double

SWAP_MASK = 1
INVERT_MASK = 2
POS_TO_ORIENT = (SWAP_MASK, 0, 0, INVERT_MASK + SWAP_MASK)  # (1, 0, 0, 3)
POS_TO_IJ = (
    (0, 1, 3, 2),  # canonical order: (0,0) (0,1) (1,1) (1,0)
    (0, 2, 3, 1),  # axes swapped
    (3, 2, 0, 1),  # bits inverted
    (3, 1, 0, 2),  # swapped & inverted
)
LOOKUP_BITS = 4
MAX_LEVEL = 30
# Cross-engine float-parity snap on floor(s * 2^30): absorbs libm-vs-JVM
# 1-ulp trig differences (~1e-12 after amplification), flips only points
# within 1e-9 of a leaf-cell boundary (measure-zero for LCG fixtures).
SNAP_EPS = 1e-9


def _build_lookup_pos() -> list[int]:
    """lookup_pos[(i4 << 6) | (j4 << 2) | orient] = (pos8 << 2) | o'.

    Built by the same recursion as the public InitLookupCell: descend
    4 levels, at each level map sub-position -> (i,j) via POS_TO_IJ
    under the current orientation, updating orientation by
    POS_TO_ORIENT.  Stored inverse-ways: given the 4-bit i and j
    chunks plus entry orientation, yield the 8-bit Hilbert position
    chunk and exit orientation.
    """
    table = [0] * 1024

    def rec(level: int, i: int, j: int, orig: int, pos: int, orient: int) -> None:
        if level == LOOKUP_BITS:
            ij = (i << LOOKUP_BITS) + j
            table[(ij << 2) + orig] = (pos << 2) + orient
            return
        r = POS_TO_IJ[orient]
        for subpos in range(4):
            rec(
                level + 1,
                (i << 1) + (r[subpos] >> 1),
                (j << 1) + (r[subpos] & 1),
                orig,
                (pos << 2) + subpos,
                orient ^ POS_TO_ORIENT[subpos],
            )

    for orig in (0, SWAP_MASK, INVERT_MASK, SWAP_MASK | INVERT_MASK):
        rec(0, 0, 0, orig, 0, orig)
    return table


LOOKUP_POS = _build_lookup_pos()


# ---------------------------------------------------------------------------
# numpy mirror (tests + applyInPandas consumers)
# ---------------------------------------------------------------------------

def np_face_uv(lng_deg, lat_deg):
    """Vectorized lat/lng -> (face, u, v)."""
    lng = np.radians(np.asarray(lng_deg, dtype=np.float64))
    lat = np.radians(np.asarray(lat_deg, dtype=np.float64))
    x = np.cos(lat) * np.cos(lng)
    y = np.cos(lat) * np.sin(lng)
    z = np.sin(lat)
    ax, ay, az = np.abs(x), np.abs(y), np.abs(z)
    # LargestAbsComponent tie-break: strict '>' so ties go to the LATER axis.
    axis = np.where(ax > ay, np.where(ax > az, 0, 2), np.where(ay > az, 1, 2))
    comp = np.choose(axis, [x, y, z])
    face = axis + np.where(comp < 0, 3, 0)
    # Guarded denominators: the selected face guarantees its divisor is the
    # largest-|.| component (never 0 on the unit sphere), but np.select
    # evaluates every branch — substitute 1.0 where a divisor is 0.
    xs = np.where(x == 0, 1.0, x)
    ys = np.where(y == 0, 1.0, y)
    zs = np.where(z == 0, 1.0, z)
    u = np.select(
        [face == 0, face == 1, face == 2, face == 3, face == 4],
        [y / xs, -x / ys, -y / zs, z / xs, z / ys],
        default=-y / zs,
    )
    v = np.select(
        [face == 0, face == 1, face == 2, face == 3, face == 4],
        [z / xs, z / ys, -x / zs, y / xs, -x / ys],
        default=-x / zs,
    )
    return face.astype(np.int64), u, v


def np_uv_to_st(u):
    """Quadratic projection: s = 0.5*sqrt(1+3u) for u>=0 else 1-0.5*sqrt(1-3u)."""
    u = np.asarray(u, dtype=np.float64)
    # np.where evaluates both branches: clamp the radicands so the
    # unused branch never goes negative (|u| <= 1 on the owning face).
    return np.where(
        u >= 0,
        0.5 * np.sqrt(np.maximum(1.0 + 3.0 * u, 0.0)),
        1.0 - 0.5 * np.sqrt(np.maximum(1.0 - 3.0 * u, 0.0)),
    )


def np_st_to_ij(s, level: int):
    n = 1 << level
    idx = np.floor(np.asarray(s) * n + SNAP_EPS).astype(np.int64)
    return np.clip(idx, 0, n - 1)


def np_hilbert_pos(face, i, j):
    """Leaf (face, i30, j30) -> 60-bit Hilbert position (no face bits)."""
    face = np.asarray(face, dtype=np.int64)
    i = np.asarray(i, dtype=np.int64)
    j = np.asarray(j, dtype=np.int64)
    lut = np.asarray(LOOKUP_POS, dtype=np.int64)
    bits = face & SWAP_MASK
    n = np.zeros_like(i)
    for k in range(7, -1, -1):
        idx = (
            (((i >> (k * 4)) & 15) << 6)
            | (((j >> (k * 4)) & 15) << 2)
            | bits
        )
        val = lut[idx]
        n |= (val >> 2) << (k * 8)
        bits = val & 3
    return n


def np_cell_key(lng_deg, lat_deg, level: int):
    """BIGINT-safe engine join key: face * 4^level + pos_level."""
    face, u, v = np_face_uv(lng_deg, lat_deg)
    i = np_st_to_ij(np_uv_to_st(u), MAX_LEVEL)
    j = np_st_to_ij(np_uv_to_st(v), MAX_LEVEL)
    pos = np_hilbert_pos(face, i, j) >> (2 * (MAX_LEVEL - level))
    return face * (1 << (2 * level)) + pos


def np_token(face, pos, level: int):
    """Canonical S2 hex token (trailing zero digits stripped) from the
    engine key parts, via exact hi/lo 32-bit split of the uint64 id."""
    face = np.asarray(face, dtype=np.int64)
    pos = np.asarray(pos, dtype=np.int64)
    lsb_bit = 60 - 2 * level  # bit position of the trailing 1
    out = []
    for f, p in zip(face.tolist(), pos.tolist()):
        full = (int(f) << 61) | (int(p) << (lsb_bit + 1)) | (1 << lsb_bit)
        tok = f"{full:016x}".rstrip("0")
        out.append(tok)
    return np.array(out, dtype=object)


# ---------------------------------------------------------------------------
# Spark Column path
# ---------------------------------------------------------------------------

def _face_uv_cols(lng: Column, lat: Column) -> tuple[Column, Column, Column]:
    rlng, rlat = F.radians(lng), F.radians(lat)
    x = F.cos(rlat) * F.cos(rlng)
    y = F.cos(rlat) * F.sin(rlng)
    z = F.sin(rlat)
    ax, ay, az = F.abs(x), F.abs(y), F.abs(z)
    axis = F.when(
        (ax > ay) & (ax > az), F.lit(0)
    ).when((~(ax > ay)) & (ay > az), F.lit(1)).otherwise(F.lit(2))
    comp = F.when(axis == 0, x).when(axis == 1, y).otherwise(z)
    face = (axis + F.when(comp < 0, F.lit(3)).otherwise(F.lit(0))).cast("int")
    u = (
        F.when(face == 0, y / x)
        .when(face == 1, -x / y)
        .when(face == 2, -y / z)
        .when(face == 3, z / x)
        .when(face == 4, z / y)
        .otherwise(-y / z)
    )
    v = (
        F.when(face == 0, z / x)
        .when(face == 1, z / y)
        .when(face == 2, -x / z)
        .when(face == 3, y / x)
        .when(face == 4, -x / y)
        .otherwise(-x / z)
    )
    return face, u, v


def _uv_to_st_col(u: Column) -> Column:
    return F.when(
        u >= 0, F.lit(0.5) * F.sqrt(F.lit(1.0) + F.lit(3.0) * u)
    ).otherwise(F.lit(1.0) - F.lit(0.5) * F.sqrt(F.lit(1.0) - F.lit(3.0) * u))


def _st_to_ij_col(s: Column, level: int) -> Column:
    n = 1 << level
    idx = F.floor(s * F.lit(float(n)) + F.lit(SNAP_EPS)).cast("long")
    return F.greatest(F.lit(0).cast("long"), F.least(F.lit(n - 1).cast("long"), idx))


def lookup_df(spark: SparkSession) -> DataFrame:
    """The 1024-row Hilbert chunk lookup as a broadcastable DataFrame."""
    rows = [(idx, val) for idx, val in enumerate(LOOKUP_POS)]
    return spark.createDataFrame(rows, "lut_idx int, lut_val int")


def with_s2_cell(
    df: DataFrame,
    lng: Column,
    lat: Column,
    level: int,
    out_prefix: str = "s2",
    method: str = "join",
) -> DataFrame:
    """Append `{p}_face`, `{p}_pos`, `{p}_key`, `{p}_token` columns.

    method="join" (default): the Hilbert fold runs as 8 chained
    BroadcastHashJoins against the 1024-row chunk table — probe-only
    per input row, no shuffle, JVM-side end to end, so the encode
    scales as a narrow map over a 10^12-row corpus.  level<=29 keeps
    every intermediate under 2^62 (Spark ANSI + DuckDB safe).

    method="numpy": one Arrow-batched pandas UDF over the SAME lookup
    table (np_cell_key/np_token) — bit-identical outputs, ~10x less
    wall time locally because the fold is one vectorized gather loop
    instead of 8 codegen stages; the trade is Python workers in the
    path.  Pick per workload; both stay narrow maps.
    """
    if not (0 < level <= 29):
        raise ValueError("level must be in 1..29 for BIGINT-safe keys")
    if method == "numpy":
        return _with_s2_cell_numpy(df, lng, lat, level, out_prefix)
    if method != "join":
        raise ValueError(f"unknown method {method!r}")
    face, u, v = _face_uv_cols(lng, lat)
    out = df.withColumn("_s2f", face).withColumn(
        "_s2i", _st_to_ij_col(_uv_to_st_col(u), MAX_LEVEL)
    ).withColumn("_s2j", _st_to_ij_col(_uv_to_st_col(v), MAX_LEVEL))
    out = out.withColumn("_s2o", F.col("_s2f").bitwiseAND(F.lit(SWAP_MASK)))
    out = out.withColumn("_s2n", F.lit(0).cast("long"))
    lut = F.broadcast(lookup_df(out.sparkSession))
    for k in range(7, -1, -1):
        idx = (
            F.shiftleft(F.shiftright(F.col("_s2i"), k * 4).bitwiseAND(F.lit(15)), 6)
            .bitwiseOR(
                F.shiftleft(
                    F.shiftright(F.col("_s2j"), k * 4).bitwiseAND(F.lit(15)), 2
                )
            )
            .bitwiseOR(F.col("_s2o"))
            .cast("int")
        )
        out = (
            out.withColumn("_s2idx", idx)
            .join(lut, F.col("_s2idx") == F.col("lut_idx"), "left")
            .withColumn(
                "_s2n",
                F.col("_s2n").bitwiseOR(
                    F.shiftleft(
                        F.shiftright(F.col("lut_val"), 2).cast("long"), k * 8
                    )
                ),
            )
            .withColumn("_s2o", F.col("lut_val").bitwiseAND(F.lit(3)))
            .drop("lut_idx", "lut_val", "_s2idx")
        )
    pos = F.shiftright(F.col("_s2n"), 2 * (MAX_LEVEL - level))
    key = F.col("_s2f").cast("long") * F.lit(1 << (2 * level)) + pos
    out = (
        out.withColumn(f"{out_prefix}_face", F.col("_s2f"))
        .withColumn(f"{out_prefix}_pos", pos)
        .withColumn(f"{out_prefix}_key", key)
        .withColumn(
            f"{out_prefix}_token", _token_col(F.col("_s2f"), pos, level)
        )
        .drop("_s2f", "_s2i", "_s2j", "_s2o", "_s2n")
    )
    return out


def _with_s2_cell_numpy(
    df: DataFrame, lng: Column, lat: Column, level: int, out_prefix: str
) -> DataFrame:
    @F.pandas_udf(
        "struct<face:int, pos:bigint, key:bigint, token:string>"
    )
    def enc(lng_s: pd.Series, lat_s: pd.Series) -> pd.DataFrame:
        lng_a = lng_s.to_numpy(np.float64)
        lat_a = lat_s.to_numpy(np.float64)
        face, u, v = np_face_uv(lng_a, lat_a)
        i = np_st_to_ij(np_uv_to_st(u), MAX_LEVEL)
        j = np_st_to_ij(np_uv_to_st(v), MAX_LEVEL)
        pos = np_hilbert_pos(face, i, j) >> (2 * (MAX_LEVEL - level))
        key = face * (1 << (2 * level)) + pos
        return pd.DataFrame(
            {
                "face": face.astype(np.int32),
                "pos": pos,
                "key": key,
                "token": np_token(face, pos, level),
            }
        )

    tmp = df.withColumn("_s2c", enc(lng, lat))
    return (
        tmp.withColumn(f"{out_prefix}_face", F.col("_s2c.face"))
        .withColumn(f"{out_prefix}_pos", F.col("_s2c.pos"))
        .withColumn(f"{out_prefix}_key", F.col("_s2c.key"))
        .withColumn(f"{out_prefix}_token", F.col("_s2c.token"))
        .drop("_s2c")
    )


def _token_col(face: Column, pos: Column, level: int) -> Column:
    """Canonical S2 token via exact hi/lo 32-bit split (uint64-safe)."""
    lsb_bit = 60 - 2 * level
    # id = face<<61 | pos<<(lsb_bit+1) | 1<<lsb_bit, split at bit 32.
    if lsb_bit + 1 >= 32:
        hi = (
            face.cast("long") * F.lit(1 << 29)
            + F.shiftleft(pos, lsb_bit + 1 - 32)
            + F.lit(1 << (lsb_bit - 32))
        )
        lo = F.lit(0).cast("long")
    else:
        hi = (
            face.cast("long") * F.lit(1 << 29)
            + F.shiftright(pos, 32 - (lsb_bit + 1))
        )
        lo = (
            F.shiftleft(
                pos.bitwiseAND(F.lit((1 << (32 - (lsb_bit + 1))) - 1)),
                lsb_bit + 1,
            )
            + F.lit(1 << lsb_bit)
        )
    hex16 = F.concat(
        F.lpad(F.lower(F.hex(hi)), 8, "0"), F.lpad(F.lower(F.hex(lo)), 8, "0")
    )
    return F.regexp_replace(hex16, "0+$", "")


# ---------------------------------------------------------------------------
# DuckDB oracle SQL builders
# ---------------------------------------------------------------------------

def sql_lut_cte() -> str:
    """The 1024-entry chunk table as a VALUES CTE body."""
    vals = ", ".join(f"({i}, {v})" for i, v in enumerate(LOOKUP_POS))
    return f"SELECT * FROM (VALUES {vals}) AS t(lut_idx, lut_val)"


def sql_face_ij_select(lng: str, lat: str, id_col: str) -> str:
    """SELECT body computing (id, face, i, j) from lng/lat expressions.

    Staged so downstream CTEs see simple column names.  Bit math is
    fully parenthesized (DuckDB's single bitwise precedence level).
    """
    half = sql_double(0.5)
    one = sql_double(1.0)
    three = sql_double(3.0)
    n30 = 1 << MAX_LEVEL
    eps = sql_double(SNAP_EPS)
    return f"""
  SELECT {id_col},
         (axis + CASE WHEN comp < 0 THEN 3 ELSE 0 END) AS face,
         CASE (axis + CASE WHEN comp < 0 THEN 3 ELSE 0 END)
           WHEN 0 THEN y / x WHEN 1 THEN -x / y WHEN 2 THEN -y / z
           WHEN 3 THEN z / x WHEN 4 THEN z / y ELSE -y / z END AS u,
         CASE (axis + CASE WHEN comp < 0 THEN 3 ELSE 0 END)
           WHEN 0 THEN z / x WHEN 1 THEN z / y WHEN 2 THEN -x / z
           WHEN 3 THEN y / x WHEN 4 THEN -x / y ELSE -x / z END AS v
  FROM (
    SELECT {id_col}, x, y, z,
           CASE WHEN abs(x) > abs(y) AND abs(x) > abs(z) THEN 0
                WHEN NOT (abs(x) > abs(y)) AND abs(y) > abs(z) THEN 1
                ELSE 2 END AS axis,
           CASE WHEN abs(x) > abs(y) AND abs(x) > abs(z) THEN x
                WHEN NOT (abs(x) > abs(y)) AND abs(y) > abs(z) THEN y
                ELSE z END AS comp
    FROM (
      SELECT {id_col},
             cos(radians({lat})) * cos(radians({lng})) AS x,
             cos(radians({lat})) * sin(radians({lng})) AS y,
             sin(radians({lat})) AS z
      FROM src
    )
  )
""", f"""
  SELECT {id_col}, face,
         cast(greatest(0, least({n30 - 1}, floor(
           (CASE WHEN u >= 0 THEN {half} * sqrt({one} + {three} * u)
                 ELSE {one} - {half} * sqrt({one} - {three} * u) END)
           * {sql_double(float(n30))} + {eps}))) as bigint) AS i,
         cast(greatest(0, least({n30 - 1}, floor(
           (CASE WHEN v >= 0 THEN {half} * sqrt({one} + {three} * v)
                 ELSE {one} - {half} * sqrt({one} - {three} * v) END)
           * {sql_double(float(n30))} + {eps}))) as bigint) AS j
  FROM fuv
"""


def sql_s2_query(
    src_cte: str, lng: str, lat: str, id_col: str, level: int
) -> str:
    """Full oracle: src CTE -> face/i/j -> 8 lut-join steps -> key+token."""
    fuv_body, fij_body = sql_face_ij_select(lng, lat, id_col)
    steps = [
        f"s8 AS (SELECT {id_col}, face, i, j,"
        f" (face & {SWAP_MASK}) AS orient, cast(0 as bigint) AS n FROM fij)"
    ]
    prev = "s8"
    for k in range(7, -1, -1):
        cur = f"s{k}"
        steps.append(
            f"""{cur} AS (
  SELECT p.{id_col}, p.face, p.i, p.j,
         (l.lut_val & 3) AS orient,
         (p.n | (cast((l.lut_val >> 2) as bigint) << {k * 8})) AS n
  FROM {prev} p JOIN lut l
    ON l.lut_idx = ((((p.i >> {k * 4}) & 15) << 6)
                  | (((p.j >> {k * 4}) & 15) << 2)
                  | p.orient)
)"""
        )
        prev = cur
    shift = 2 * (MAX_LEVEL - level)
    lsb_bit = 60 - 2 * level
    if lsb_bit + 1 < 32:
        raise ValueError("oracle token builder supports level <= 14")
    hi = (
        f"(cast(face as bigint) * {1 << 29}"
        f" + ((n >> {shift}) << {lsb_bit + 1 - 32})"
        f" + {1 << (lsb_bit - 32)})"
    )
    return f"""
WITH src AS ({src_cte}),
lut AS ({sql_lut_cte()}),
fuv AS ({fuv_body}),
fij AS ({fij_body}),
{", ".join(steps)}
SELECT {id_col},
       cast(face as int) AS s2_face,
       (n >> {shift}) AS s2_pos,
       (cast(face as bigint) * {1 << (2 * level)} + (n >> {shift})) AS s2_key,
       regexp_replace(printf('%08x', {hi}) || '00000000', '0+$', '') AS s2_token
FROM {prev}
"""
