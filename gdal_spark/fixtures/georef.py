"""Deterministic, SQL-expressible synthetic geo fixtures.

The input table per BASELINE.json carries no geo columns; the engine
derives a deterministic footprint from the row id. The derivation is
deliberately expressible in BOTH Spark Column math and plain ANSI SQL
(DuckDB), so every operator can be verified against an independent
SQL oracle on the same inputs.

Derivation rule (documented in FIXTURES.md §1a):

    i  = bigint row id
    u1 = (i  * 1103515245 + 12345) mod 2^31        # classic LCG step
    u2 = (u1 * 1103515245 + 12345) mod 2^31
    images:  lon_c = -180 + 360 * u1 / 2^31
             lat_c =  -85 + 170 * u2 / 2^31
             w = [20, 64, 256, 257, 512][i % 5]
             h = [20, 64, 256, 100, 512][i % 5]
             fmt = ['png', 'jpeg', 'tiff'][i % 3]
    footprint: w x h pixels at the zoom-12 WebMercator ground
    resolution (gcore/tilematrixset.cpp:96-104), centered at
    (lon_c, lat_c) projected to EPSG:3857.

    zones (fid, offset j = fid + 1000003 to decorrelate):
             k-gon, k = 5 + fid % 4, circumradius r_deg =
             0.5 + (fid % 7) * 0.3, centered lon0 = -150 + 300*v1/2^31,
             lat0 = -70 + 140*v2/2^31; CCW vertices at angles 2*pi*j/k;
             every 10th zone has a concentric hole at 0.4 r.

    sites (offset 2000003): query points over the image domain,
             k = [1, 3, 10][i % 3].

All integer math stays below 2^62 — safe under both Spark ANSI mode
and DuckDB bigint semantics.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from gdal_spark.tiles import tilemath as tm

LCG_A = 1103515245
LCG_C = 12345
LCG_M = 2**31

ANCHOR_ZOOM = 12  # images are "native resolution" at z=12
RES0 = tm.resolution(ANCHOR_ZOOM)

W_CYCLE = (20, 64, 256, 257, 512)
H_CYCLE = (20, 64, 256, 100, 512)
FMT_CYCLE = ("png", "jpeg", "tiff")
JPEG_QUALITY = 95
PIXEL_PHASES = (0, 85, 170)

ZONE_OFFSET = 1000003
SITE_OFFSET = 2000003
SITE_K_CYCLE = (1, 3, 10)

CAPTION_ADJ = (
    "quiet", "bright", "misty", "golden", "stormy", "frozen", "ancient",
    "vivid", "pale", "lush", "barren", "gleaming", "shadowed", "windy",
    "serene", "rugged",
)
CAPTION_NOUN = (
    "harbor", "forest", "plateau", "village", "glacier", "market", "canyon",
    "estuary", "orchard", "ridge", "lagoon", "steppe", "quarry", "delta",
    "meadow", "archipelago",
)
CAPTION_PLACE = (
    "the northern coast", "a desert basin", "the old quarter",
    "a river bend", "the high passes", "an island chain", "the salt flats",
    "a terraced valley", "the outer banks", "a volcanic field",
    "the frozen sound", "a cypress swamp", "the amber hills",
    "a limestone shelf", "the painted mesas", "a glacial fjord",
)


# ---------------------------------------------------------------------------
# Column-math forms
# ---------------------------------------------------------------------------

def lcg_next(u: Column) -> Column:
    return (u * F.lit(LCG_A) + F.lit(LCG_C)) % F.lit(LCG_M)


def _cycle(i: Column, values: tuple, dtype: str = "int") -> Column:
    arr = F.array(*[F.lit(v) for v in values])
    return F.element_at(arr, (i % len(values)).cast("int") + 1).cast(dtype) \
        if dtype != "string" else F.element_at(arr, (i % len(values)).cast("int") + 1)


def with_image_geo(df: DataFrame, id_col: str = "i") -> DataFrame:
    """Add image_id, w, h, fmt, caption and the derived georeference
    (lon_c/lat_c, EPSG:3857 center + footprint bbox) — pure Column
    math, no UDF, no shuffle.
    """
    i = F.col(id_col).cast("long")
    u1 = lcg_next(i)
    u2 = lcg_next(u1)
    lon_c = F.lit(-180.0) + F.lit(360.0) * u1 / F.lit(float(LCG_M))
    lat_c = F.lit(-85.0) + F.lit(170.0) * u2 / F.lit(float(LCG_M))
    w = _cycle(i, W_CYCLE)
    h = _cycle(i, H_CYCLE)
    df = (
        df.withColumn("image_id", F.concat(F.lit("img_"), F.lpad(i.cast("string"), 12, "0")))
        .withColumn("w", w)
        .withColumn("h", h)
        .withColumn("fmt", _cycle(i, FMT_CYCLE, "string"))
        .withColumn(
            "caption",
            F.concat(
                F.lit("synthetic scene "), i.cast("string"), F.lit(": "),
                _cycle(u1, CAPTION_ADJ, "string"), F.lit(" "),
                _cycle(u2, CAPTION_NOUN, "string"), F.lit(" over "),
                _cycle(u1 + u2, CAPTION_PLACE, "string"),
            ),
        )
        .withColumn("lon_c", lon_c)
        .withColumn("lat_c", lat_c)
    )
    cx = tm.merc_x(F.col("lon_c"))
    cy = tm.merc_y(F.col("lat_c"))
    half_w = F.col("w").cast("double") * F.lit(RES0 / 2.0)
    half_h = F.col("h").cast("double") * F.lit(RES0 / 2.0)
    return (
        df.withColumn("cx", cx)
        .withColumn("cy", cy)
        .withColumn("xmin", cx - half_w)
        .withColumn("xmax", cx + half_w)
        .withColumn("ymin", cy - half_h)
        .withColumn("ymax", cy + half_h)
    )


def with_zone_geo(df: DataFrame, fid_col: str = "fid") -> DataFrame:
    """Zone parameters as columns (center, k, radius, hole) + bbox.

    The polygon itself (WKB) is built by fixtures.zones; these scalar
    columns are what the distributed planner uses (bbox prefilter,
    cell assignment) — mirroring the reference's envelope-first ladder
    (ogrlayer.cpp:2253-2325).
    """
    fid = F.col(fid_col).cast("long")
    j = fid + F.lit(ZONE_OFFSET)
    v1 = lcg_next(j)
    v2 = lcg_next(v1)
    lon0 = F.lit(-150.0) + F.lit(300.0) * v1 / F.lit(float(LCG_M))
    lat0 = F.lit(-70.0) + F.lit(140.0) * v2 / F.lit(float(LCG_M))
    k = (F.lit(5) + (fid % 4)).cast("int")
    r = F.lit(0.5) + (fid % 7).cast("double") * F.lit(0.3)
    return (
        df.withColumn("eas_id", F.lit(158) + fid)
        .withColumn("name", F.concat(F.lit("zone_"), fid.cast("string")))
        .withColumn("kind", _cycle(fid, ("park", "water", "urban", "farm"), "string"))
        .withColumn("lon0", lon0)
        .withColumn("lat0", lat0)
        .withColumn("k", k)
        .withColumn("r", r)
        .withColumn("has_hole", (fid % 10) == 0)
        .withColumn("hole_r", r * F.lit(0.4))
        .withColumn("zxmin", lon0 - r)
        .withColumn("zxmax", lon0 + r)
        .withColumn("zymin", lat0 - r)
        .withColumn("zymax", lat0 + r)
    )


def with_site_geo(df: DataFrame, id_col: str = "i") -> DataFrame:
    i = F.col(id_col).cast("long")
    j = i + F.lit(SITE_OFFSET)
    u1 = lcg_next(j)
    u2 = lcg_next(u1)
    return (
        df.withColumn("site_id", F.concat(F.lit("site_"), F.lpad(i.cast("string"), 6, "0")))
        .withColumn("slon", F.lit(-180.0) + F.lit(360.0) * u1 / F.lit(float(LCG_M)))
        .withColumn("slat", F.lit(-85.0) + F.lit(170.0) * u2 / F.lit(float(LCG_M)))
        .withColumn("k", _cycle(i, SITE_K_CYCLE))
    )


# ---------------------------------------------------------------------------
# SQL-text forms (dialect-neutral: parse identically in Spark SQL & DuckDB)
# ---------------------------------------------------------------------------

def _sql_case_cycle(i_expr: str, values: tuple, quote: bool = False) -> str:
    branches = []
    for idx, v in enumerate(values):
        lit = f"'{v}'" if quote else str(v)
        branches.append(f"WHEN ({i_expr}) % {len(values)} = {idx} THEN {lit}")
    return "CASE " + " ".join(branches) + " END"


def sql_lcg(i_expr: str) -> tuple[str, str]:
    u1 = f"((({i_expr}) * {LCG_A} + {LCG_C}) % {LCG_M})"
    u2 = f"(({u1} * {LCG_A} + {LCG_C}) % {LCG_M})"
    return u1, u2


def sql_images_cte(i_expr: str, src: str) -> str:
    """CTE body deriving the images-geo table from a source of row ids."""
    u1, u2 = sql_lcg(i_expr)
    lon = f"(-180.0 + 360.0 * {u1} / {tm.sql_double(float(LCG_M))})"
    lat = f"(-85.0 + 170.0 * {u2} / {tm.sql_double(float(LCG_M))})"
    w = _sql_case_cycle(i_expr, W_CYCLE)
    h = _sql_case_cycle(i_expr, H_CYCLE)
    fmt = _sql_case_cycle(i_expr, FMT_CYCLE, quote=True)
    cx = tm.sql_merc_x(lon)
    cy = tm.sql_merc_y(lat)
    return f"""
  SELECT
    ({i_expr}) AS i,
    'img_' || lpad(cast(({i_expr}) as varchar), 12, '0') AS image_id,
    {w} AS w, {h} AS h, {fmt} AS fmt,
    {lon} AS lon_c, {lat} AS lat_c,
    {cx} AS cx, {cy} AS cy,
    {cx} - ({w}) * {tm.sql_double(RES0 / 2.0)} AS xmin,
    {cx} + ({w}) * {tm.sql_double(RES0 / 2.0)} AS xmax,
    {cy} - ({h}) * {tm.sql_double(RES0 / 2.0)} AS ymin,
    {cy} + ({h}) * {tm.sql_double(RES0 / 2.0)} AS ymax
  FROM {src}
"""


def sql_zones_cte(fid_expr: str, src: str) -> str:
    u1, u2 = sql_lcg(f"({fid_expr}) + {ZONE_OFFSET}")
    lon0 = f"(-150.0 + 300.0 * {u1} / {tm.sql_double(float(LCG_M))})"
    lat0 = f"(-70.0 + 140.0 * {u2} / {tm.sql_double(float(LCG_M))})"
    return f"""
  SELECT
    ({fid_expr}) AS fid,
    158 + ({fid_expr}) AS eas_id,
    {lon0} AS lon0, {lat0} AS lat0,
    5 + (({fid_expr}) % 4) AS k,
    0.5 + (({fid_expr}) % 7) * 0.3 AS r,
    (({fid_expr}) % 10 = 0) AS has_hole,
    (0.5 + (({fid_expr}) % 7) * 0.3) * 0.4 AS hole_r
  FROM {src}
"""


def sql_sites_cte(i_expr: str, src: str) -> str:
    u1, u2 = sql_lcg(f"({i_expr}) + {SITE_OFFSET}")
    k = _sql_case_cycle(i_expr, SITE_K_CYCLE)
    return f"""
  SELECT
    ({i_expr}) AS i,
    'site_' || lpad(cast(({i_expr}) as varchar), 6, '0') AS site_id,
    (-180.0 + 360.0 * {u1} / {tm.sql_double(float(LCG_M))}) AS slon,
    (-85.0 + 170.0 * {u2} / {tm.sql_double(float(LCG_M))}) AS slat,
    {k} AS k
  FROM {src}
"""


# ---------------------------------------------------------------------------
# numpy twin (for UDF-side pixel generation and golden oracles)
# ---------------------------------------------------------------------------

def np_lcg(i):
    import numpy as np

    i = np.asarray(i, dtype=np.int64)
    u1 = (i * LCG_A + LCG_C) % LCG_M
    u2 = (u1 * LCG_A + LCG_C) % LCG_M
    return u1, u2


def np_image_pixels(i: int, w: int, h: int):
    """The deterministic pixel formula: value(x,y,c) = (x+y+i+phase_c) % 256."""
    import numpy as np

    x = np.arange(w, dtype=np.int64)
    y = np.arange(h, dtype=np.int64)[:, None]
    return np.stack(
        [((x + y + i + p) % 256) for p in PIXEL_PHASES], axis=-1
    ).astype(np.uint8)


def np_phash(arr) -> int:
    """64-bit aHash: 8x8 block-mean of the grayscale image, bit = cell
    mean > global mean of cells, packed row-major MSB-first (signed).
    """
    import numpy as np

    a = arr.astype(np.float64)
    gray = a.mean(axis=2) if a.ndim == 3 else a
    h, w = gray.shape
    ys = (np.arange(9) * h) // 8
    xs = (np.arange(9) * w) // 8
    cells = np.empty((8, 8))
    for r in range(8):
        for c in range(8):
            cells[r, c] = gray[ys[r] : ys[r + 1], xs[c] : xs[c + 1]].mean()
    bits = (cells > cells.mean()).astype(np.uint64).reshape(-1)
    val = np.uint64(0)
    for b in bits:
        val = (val << np.uint64(1)) | b
    return int(val.astype(np.int64))
