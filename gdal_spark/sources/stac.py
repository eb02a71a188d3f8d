"""STAC ItemCollection scan — the STACIT driver re-derived for Spark.

Semantics from /root/reference/frmts/stacit/stacitdataset.cpp:

- ParseAsset (:185-425): skip assets typed application/json|xml or
  text/plain (:192), or whose roles include thumbnail/info/metadata
  (:200-210), or without an href (:216); CRS resolution order
  proj:code -> proj:epsg ("EPSG:"+code) -> proj:wkt2 (:233-273) with
  asset-level members taking precedence over feature properties
  (GetAssetOrFeatureProperty, :274); item extent derived from any two
  of proj:bbox / proj:shape / proj:transform (:335-381), where the
  transform must look like [xres>0, 0, x0, 0, yres<0, y0 (,0,0,1)]
  (:318-330) and, when both bbox and transform are present, share the
  same origin (:344-357).
- SetupDataset (:430-520): items grouped by collection / asset / CRS;
  mosaic bounds = min/max over items; resolution = AVERAGE (default)
  / HIGHEST / LOWEST of the per-item resolutions; raster size =
  round(span / res); geotransform (xmin, xres, 0, ymax, 0, -yres).
- Items composite in ascending-datetime order (:582-588) — the
  newest item wins where footprints overlap.
- Pagination: the reference walks "next" links request-by-request
  (:968-990, MAX_ITEMS default 1000).  The Spark dual reads ALL pages
  of a catalog as one distributed glob scan — each page file is one
  input split, so a 10^6-item catalog parses in parallel instead of
  serially following links.

Scale notes: the item index is catalog metadata (one row per asset,
no pixels) — a 10^12-image archive's index is ~10^9 rows of plain
columns, far below payload scale.  `read_stac_items` is one
wholetext scan + narrow Column math (no shuffle); `mosaic_params` is
a single groupBy over metadata rows; `latest_item_per_point` uses a
cell-key equi-join (never a nested-loop range join).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_PROJ_FIELDS = [
    T.StructField("proj:code", T.StringType()),
    T.StructField("proj:epsg", T.LongType()),
    T.StructField("proj:wkt2", T.StringType()),
    T.StructField("proj:bbox", T.ArrayType(T.DoubleType())),
    T.StructField("proj:shape", T.ArrayType(T.LongType())),
    T.StructField("proj:transform", T.ArrayType(T.DoubleType())),
]

ASSET_SCHEMA = T.StructType(
    [
        T.StructField("href", T.StringType()),
        T.StructField("type", T.StringType()),
        T.StructField("roles", T.ArrayType(T.StringType())),
    ]
    + _PROJ_FIELDS
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("type", T.StringType()),
        T.StructField("id", T.StringType()),
        T.StructField("collection", T.StringType()),
        T.StructField(
            "properties",
            T.StructType([T.StructField("datetime", T.StringType())] + _PROJ_FIELDS),
        ),
        T.StructField("assets", T.MapType(T.StringType(), ASSET_SCHEMA)),
    ]
)

PAGE_SCHEMA = T.StructType(
    [
        T.StructField("type", T.StringType()),
        T.StructField("features", T.ArrayType(FEATURE_SCHEMA)),
    ]
)

_SKIP_TYPES = ("application/json", "application/xml", "text/plain")
_SKIP_ROLES = ("thumbnail", "info", "metadata")


def write_stac_pages(features: DataFrame, out_dir: str) -> None:
    """Write `(page long, feature string)` rows as one ItemCollection
    JSON document per page (`page_<p>.json`), each carrying the
    reference's `"links":[{"rel":"next",...}]` chain.  Distributed:
    pages are hash-partitioned across executors; each task writes
    only its own page files (shared output filesystem assumed, as for
    any Spark file sink)."""
    os.makedirs(out_dir, exist_ok=True)
    # scalar metadata action (page count), never a layer collect
    mp = features.agg(F.max("page")).first()[0]
    if mp is None:  # empty feature set: write no pages
        return
    n_pages = mp + 1

    def write_partition(rows) -> None:
        by_page: dict[int, list] = {}
        for r in rows:
            by_page.setdefault(int(r["page"]), []).append(
                (int(r["i"]), r["feature"])
            )
        for page, items in by_page.items():
            items.sort()
            nxt = (
                ',"links":[{"rel":"next","href":"page_%d.json"}]'
                % (page + 1)
                if page + 1 < n_pages
                else ',"links":[]'
            )
            doc = (
                '{"type":"FeatureCollection","features":['
                + ",".join(f for _, f in items)
                + "]"
                + nxt
                + "}"
            )
            tmp = os.path.join(out_dir, f".page_{page}.json.tmp")
            with open(tmp, "w") as fh:
                fh.write(doc)
            os.replace(tmp, os.path.join(out_dir, f"page_{page}.json"))

    features.repartition(
        max(1, min(32, int(n_pages))), "page"
    ).foreachPartition(write_partition)


def read_stac_items(spark: SparkSession, path_glob: str) -> DataFrame:
    """Distributed ItemCollection scan -> item-index DataFrame
    `(collection, asset, crs, href, item_id, datetime, xmin, ymin,
    xmax, ymax, w, h)` applying every ParseAsset skip rule.  One
    wholetext read; everything after is narrow Column math."""
    raw = (
        spark.read.format("text")
        .option("wholetext", "true")
        .load(path_glob)
    )
    doc = F.from_json(F.col("value"), PAGE_SCHEMA)
    feats = raw.select(F.explode(doc["features"]).alias("f"))
    a = feats.select(
        F.col("f.collection").alias("collection"),
        F.col("f.properties").alias("props"),
        F.explode("f.assets").alias("asset", "av"),
    )

    def prop(name: str):
        # asset-level member wins over the feature property (:274)
        return F.coalesce(F.col("av")[name], F.col("props")[name])

    keep = (
        ~F.coalesce(
            F.col("av.type").isin(*_SKIP_TYPES), F.lit(False)
        )
        & ~F.coalesce(
            F.arrays_overlap(
                F.col("av.roles"), F.array(*[F.lit(r) for r in _SKIP_ROLES])
            ),
            F.lit(False),
        )
        & F.col("av.href").isNotNull()
        & (F.col("av.href") != "")
    )
    a = a.filter(keep)

    crs = F.coalesce(
        prop("proj:code"),
        F.when(
            prop("proj:epsg").isNotNull(),
            F.concat(F.lit("EPSG:"), prop("proj:epsg").cast("string")),
        ),
        prop("proj:wkt2"),
    )
    a = a.filter(crs.isNotNull()).withColumn("crs", crs)

    bbox, shape, tr = prop("proj:bbox"), prop("proj:shape"), prop("proj:transform")
    bbox_ok = bbox.isNotNull() & (F.size(bbox) == 4)
    shape_ok = shape.isNotNull() & (F.size(shape) == 2)
    tr_ok = (
        tr.isNotNull()
        & F.size(tr).isin(6, 9)
        & (tr[0] > 0)
        & (tr[1] == 0)
        & (tr[3] == 0)
        & (tr[4] < 0)
        & (
            (F.size(tr) == 6)
            | ((tr[6] == 0) & (tr[7] == 0) & (tr[8] == 1))
        )
    )
    # 3-way extent derivation (:335-381), in the reference's order.
    from_bs = bbox_ok & shape_ok
    from_bt = bbox_ok & tr_ok & (bbox[0] == tr[2]) & (bbox[3] == tr[5])
    from_st = shape_ok & tr_ok
    xmin = F.when(from_bs | (bbox_ok & tr_ok), bbox[0]).otherwise(tr[2])
    ymax = F.when(from_bs | (bbox_ok & tr_ok), bbox[3]).otherwise(tr[5])
    w = (
        F.when(from_bs, shape[1])
        .when(from_bt, ((bbox[2] - bbox[0]) / tr[0]).cast("long"))
        .otherwise(shape[1])
    )
    h = (
        F.when(from_bs, shape[0])
        .when(from_bt, ((bbox[3] - bbox[1]) / -tr[4]).cast("long"))
        .otherwise(shape[0])
    )
    xmax = F.when(from_bs | from_bt, bbox[2]).otherwise(tr[2] + shape[1] * tr[0])
    ymin = F.when(from_bs | from_bt, bbox[1]).otherwise(tr[5] + shape[0] * tr[4])
    derivable = from_bs | from_bt | from_st
    # bbox+transform present but origins inconsistent -> skip (:344)
    inconsistent = (
        ~from_bs & bbox_ok & tr_ok & ~from_bt
    )
    a = a.filter(derivable & ~inconsistent)
    out = a.select(
        "collection",
        F.col("asset"),
        "crs",
        F.col("av.href").alias("href"),
        F.col("props.datetime").alias("datetime"),
        xmin.alias("xmin"),
        ymin.alias("ymin"),
        xmax.alias("xmax"),
        ymax.alias("ymax"),
        w.alias("w"),
        h.alias("h"),
    )
    return out.filter((F.col("w") > 0) & (F.col("h") > 0))


def mosaic_params(items: DataFrame, resolution: str = "AVERAGE") -> DataFrame:
    """Per (collection, asset, crs) mosaic dataset parameters
    (SetupDataset :430-520).  AVERAGE is computed as sum/count (exact
    for integral per-item resolutions); size = round(span/res) with
    positive-half-up rounding on both engines."""
    rx = (F.col("xmax") - F.col("xmin")) / F.col("w")
    ry = (F.col("ymax") - F.col("ymin")) / F.col("h")
    if resolution == "AVERAGE":
        res_x, res_y = F.sum(rx) / F.count(F.lit(1)), F.sum(ry) / F.count(F.lit(1))
    elif resolution == "HIGHEST":
        res_x, res_y = F.min(rx), F.min(ry)
    elif resolution == "LOWEST":
        res_x, res_y = F.max(rx), F.max(ry)
    else:
        raise ValueError(f"unknown RESOLUTION {resolution!r}")
    g = items.groupBy("collection", "asset", "crs").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.min("xmin").alias("xmin"),
        F.min("ymin").alias("ymin"),
        F.max("xmax").alias("xmax"),
        F.max("ymax").alias("ymax"),
        res_x.alias("res_x"),
        res_y.alias("res_y"),
    )
    return g.select(
        "collection", "asset", "crs", "n_items",
        "xmin", "ymin", "xmax", "ymax", "res_x", "res_y",
        F.round((F.col("xmax") - F.col("xmin")) / F.col("res_x"))
        .cast("long").alias("nx"),
        F.round((F.col("ymax") - F.col("ymin")) / F.col("res_y"))
        .cast("long").alias("ny"),
    )


def latest_item_per_point(
    items: DataFrame, points: DataFrame, cell: int = 8192
) -> DataFrame:
    """For each probe point `(p, px, py)`: the item that is ON TOP of
    the ascending-datetime composite (:582) at that point, per
    (collection, asset, crs) mosaic — i.e. the covering item with the
    max datetime — plus the covering count.

    Scale shape: items explode to the few indexing cells their
    footprint touches (footprints are bounded; the explode factor is
    O((span/cell)^2)), probes map to one cell each, and the match is
    a plain equi-join on the cell key — broadcastable when either
    side is small, shuffle-partitioned otherwise.  No nested-loop
    range join.
    """
    ic = items.withColumn(
        "cx",
        F.explode(
            F.sequence(
                (F.col("xmin") / cell).cast("long"),
                ((F.col("xmax") - 1) / cell).cast("long"),
            )
        ),
    ).withColumn(
        "cy",
        F.explode(
            F.sequence(
                (F.col("ymin") / cell).cast("long"),
                ((F.col("ymax") - 1) / cell).cast("long"),
            )
        ),
    )
    pc = points.select(
        "p", "px", "py",
        (F.col("px") / cell).cast("long").alias("cx"),
        (F.col("py") / cell).cast("long").alias("cy"),
    )
    j = pc.join(ic, ["cx", "cy"]).filter(
        (F.col("px") >= F.col("xmin"))
        & (F.col("px") < F.col("xmax"))
        & (F.col("py") > F.col("ymin"))
        & (F.col("py") <= F.col("ymax"))
    )
    return j.groupBy("p", "collection", "asset", "crs").agg(
        F.max_by("href", "datetime").alias("top_href"),
        F.max("datetime").alias("top_datetime"),
        F.count(F.lit(1)).alias("n_cover"),
    )
