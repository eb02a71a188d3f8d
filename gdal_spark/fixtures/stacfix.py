"""Deterministic STAC ItemCollection fixtures (SQL-expressible).

Synthesises the paged ``ItemCollection`` JSON documents that the
STACIT-analog scan (`gdal_spark/sources/stac.py`) reads back, derived
from a table of row ids by pure integer/LCG column math — so the
*derived item index* has an exact DuckDB closed form and every scan
query can be value-verified.

The fixture deliberately plants every skip rule the reference applies
(`/root/reference/frmts/stacit/stacitdataset.cpp`):

    skip class s = i % 23
      1 -> asset "type": "application/json"          (ParseAsset :192)
      2 -> asset "roles" contains "thumbnail"        (:200-210)
      3 -> no proj:code/proj:epsg/proj:wkt2 member   (:233-273)
      4 -> proj:bbox origin != proj:transform origin (:344-357)
      5 -> proj:transform with positive y-res        (:318-330)
    all other rows are valid items.

Geometry rule (all EXACT integers so mosaic math has no float noise):

    u1 = lcg(i + 4000037), u2 = lcg(u1)
    grp  = i % 4 -> collection 'sentinel'/'landsat', asset 'B04'/'B08'
    epsg = 32634 if i % 16 == 15 else 32633
    rx   = 1 + i % 3,  ry = 1 + (i // 3) % 3        (integer res)
    w    = 100 + u1 % 400, h = 100 + u2 % 400
    x0   = u1 % 100000, y0 = 200000 + u2 % 100000   (top-left origin)
    bbox = [x0, y0 - h*ry, x0 + w*rx, y0]
    proj:transform = [rx, 0, x0, 0, -ry, y0]  (+ ,0,0,1 when 9-elt)
    proj:shape     = [h, w]

Which two of {bbox, shape, transform} are present cycles with
m = i % 3 (0: bbox+shape, 1: bbox+transform, 2: shape+transform; the
9-element transform form is used when m == 2 and i is even).  The
proj members live on the ASSET when i % 7 == 0, else on the feature
properties (GetAssetOrFeatureProperty precedence, :274), and the CRS
is spelled "proj:code" when i % 11 == 0, else "proj:epsg" (:234-247).
datetime strings are unique and ordered by i (ascending-datetime
compositing, :582).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from gdal_spark.fixtures.georef import LCG_A, LCG_C, LCG_M, lcg_next

STAC_OFFSET = 4000037
PAGE_SIZE = 256

COLLECTIONS = ("sentinel", "landsat")
ASSETS = ("B04", "B08")


# ---------------------------------------------------------------------------
# Column-math derivation of the item-parameter table
# ---------------------------------------------------------------------------

def item_params(df: DataFrame, id_col: str = "i") -> DataFrame:
    """Item parameters from 0-based row ids — pure Column math."""
    i = F.col(id_col).cast("long")
    u1 = lcg_next(i + F.lit(STAC_OFFSET))
    u2 = lcg_next(u1)
    grp = i % 4
    coll = F.when(grp % 2 == 0, COLLECTIONS[0]).otherwise(COLLECTIONS[1])
    asset = F.when(grp < 2, ASSETS[0]).otherwise(ASSETS[1])
    epsg = F.when(i % 16 == 15, 32634).otherwise(32633)
    rx = (F.lit(1) + i % 3).cast("long")
    ry = (F.lit(1) + (i / 3).cast("long") % 3).cast("long")
    w = (F.lit(100) + u1 % 400).cast("long")
    h = (F.lit(100) + u2 % 400).cast("long")
    x0 = (u1 % 100000).cast("long")
    y0 = (F.lit(200000) + u2 % 100000).cast("long")
    dt = F.format_string(
        "2021-%02d-%02dT%02d:%02d:%02dZ",
        (F.lit(1) + (i / 2419200).cast("long") % 12).cast("int"),
        (F.lit(1) + (i / 86400).cast("long") % 28).cast("int"),
        ((i / 3600).cast("long") % 24).cast("int"),
        ((i / 60).cast("long") % 60).cast("int"),
        (i % 60).cast("int"),
    )
    return df.select(
        i.alias("i"),
        coll.alias("collection"),
        asset.alias("asset"),
        epsg.cast("long").alias("epsg"),
        rx.alias("rx"),
        ry.alias("ry"),
        w.alias("w"),
        h.alias("h"),
        x0.alias("x0"),
        y0.alias("y0"),
        (x0 + w * rx).alias("xmax"),
        (y0 - h * ry).alias("ymin"),
        (i % 23).alias("skip"),
        (i % 3).alias("memb"),
        (i % 7 == 0).alias("place_asset"),
        (i % 11 == 0).alias("use_code"),
        dt.alias("datetime"),
        (i / F.lit(PAGE_SIZE)).cast("long").alias("page"),
    )


def feature_json(p: DataFrame) -> DataFrame:
    """Render each item-parameter row to its STAC Feature JSON string
    (column ``feature``), keeping ``page`` and ``i`` for the paged
    writer.  Pure string Column math — fully distributed."""
    bbox = F.format_string(
        '"proj:bbox":[%d,%d,%d,%d]',
        F.col("x0"), F.col("ymin"), F.col("xmax"), F.col("y0")
    )
    shape = F.format_string('"proj:shape":[%d,%d]', F.col("h"), F.col("w"))
    t2 = F.when(F.col("skip") == 4, F.col("x0") + 1).otherwise(F.col("x0"))
    yres = F.when(F.col("skip") == 5, F.col("ry")).otherwise(-F.col("ry"))
    nine = (F.col("memb") == 2) & (F.col("i") % 2 == 0)
    transform = F.concat(
        F.format_string(
            '"proj:transform":[%d,0,%d,0,%d,%d',
            F.col("rx"), t2, yres, F.col("y0")
        ),
        F.when(nine, F.lit(",0,0,1]")).otherwise(F.lit("]")),
    )
    crs = F.when(
        F.col("use_code"),
        F.format_string('"proj:code":"EPSG:%d"', F.col("epsg")),
    ).otherwise(F.format_string('"proj:epsg":%d', F.col("epsg")))
    memb = F.col("memb")
    # skip 4 forces bbox+transform; skip 5 forces shape+transform
    memb = (
        F.when(F.col("skip") == 4, F.lit(1))
        .when(F.col("skip") == 5, F.lit(2))
        .otherwise(memb)
    )
    members = (
        F.when(memb == 0, F.concat(bbox, F.lit(","), shape))
        .when(memb == 1, F.concat(bbox, F.lit(","), transform))
        .otherwise(F.concat(shape, F.lit(","), transform))
    )
    proj = F.when(F.col("skip") == 3, F.lit(None)).otherwise(
        F.concat(crs, F.lit(","), members)
    )
    props = F.concat(
        F.format_string('"datetime":"%s"', F.col("datetime")),
        F.when(
            ~F.col("place_asset") & proj.isNotNull(),
            F.concat(F.lit(","), proj),
        ).otherwise(F.lit("")),
    )
    atype = F.when(
        F.col("skip") == 1, F.lit("application/json")
    ).otherwise(F.lit("image/tiff; application=geotiff"))
    roles = F.when(
        F.col("skip") == 2, F.lit(',"roles":["thumbnail","data"]')
    ).otherwise(F.lit(""))
    href = F.format_string(
        "s3://fixtures/%s/item_%d/%s.tif",
        F.col("collection"), F.col("i"), F.col("asset")
    )
    asset_body = F.concat(
        F.format_string('"href":"%s","type":"%s"', href, atype),
        roles,
        F.when(
            F.col("place_asset") & proj.isNotNull(),
            F.concat(F.lit(","), proj),
        ).otherwise(F.lit("")),
    )
    feature = F.concat(
        F.format_string(
            '{"type":"Feature","stac_version":"1.0.0","id":"item_%d",'
            '"collection":"%s","properties":{',
            F.col("i"), F.col("collection")
        ),
        props,
        F.format_string('},"assets":{"%s":{', F.col("asset")),
        asset_body,
        F.lit('}},"links":[]}'),
    )
    return p.select("i", "page", feature.alias("feature"))


# ---------------------------------------------------------------------------
# DuckDB closed form of the VALID item index (what a correct scan emits)
# ---------------------------------------------------------------------------

def sql_item_params(i_expr: str, src: str) -> str:
    """CTE body: the full parameter table (valid and skipped rows;
    filter `skip NOT IN (1,2,3,4,5)` for the scan's output)."""
    u1 = f"(((({i_expr}) + {STAC_OFFSET}) * {LCG_A} + {LCG_C}) % {LCG_M})"
    u2 = f"(({u1} * {LCG_A} + {LCG_C}) % {LCG_M})"
    return f"""
  SELECT
    ({i_expr}) AS i,
    CASE WHEN (({i_expr}) % 4) % 2 = 0 THEN 'sentinel' ELSE 'landsat' END
      AS collection,
    CASE WHEN (({i_expr}) % 4) < 2 THEN 'B04' ELSE 'B08' END AS asset,
    cast(CASE WHEN ({i_expr}) % 16 = 15 THEN 32634 ELSE 32633 END as bigint)
      AS epsg,
    cast(1 + ({i_expr}) % 3 as bigint) AS rx,
    cast(1 + (({i_expr}) // 3) % 3 as bigint) AS ry,
    cast(100 + {u1} % 400 as bigint) AS w,
    cast(100 + {u2} % 400 as bigint) AS h,
    cast({u1} % 100000 as bigint) AS x0,
    cast(200000 + {u2} % 100000 as bigint) AS y0,
    cast(({u1} % 100000) + (100 + {u1} % 400) * (1 + ({i_expr}) % 3)
      as bigint) AS xmax,
    cast((200000 + {u2} % 100000)
       - (100 + {u2} % 400) * (1 + (({i_expr}) // 3) % 3) as bigint) AS ymin,
    ({i_expr}) % 23 AS skip,
    printf('2021-%02d-%02dT%02d:%02d:%02dZ',
           1 + (({i_expr}) // 2419200) % 12,
           1 + (({i_expr}) // 86400) % 28,
           (({i_expr}) // 3600) % 24,
           (({i_expr}) // 60) % 60,
           ({i_expr}) % 60) AS datetime
  FROM {src}
"""
