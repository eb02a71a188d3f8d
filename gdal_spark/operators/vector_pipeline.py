"""`gdal vector <step>` pipeline equivalents as chainable DataFrame
transformations.

The reference's vector CLI family (apps/gdalalg_vector_{filter,
select,sql,geom,buffer,simplify,swap_xy,segmentize,
explode_collections,set_geom_type,concat,clip,...}.cpp) are streamed
per-feature steps over OGRLayer pull iterators; each maps 1:1 to a
lazy DataFrame transformation here, so a pipeline is just function
composition — Catalyst fuses the chain exactly as the reference's
pull pipeline does (apps/gdalalg_vector_pipeline.cpp:918-941).

Steps needing geometry math use the ST_* pandas UDFs
(geo/st_functions.py); pure-attribute steps stay Column-only.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from gdal_spark.geo.wkb import (
    WKB_MULTIPOLYGON,
    WKB_POLYGON,
    Geometry,
    geometry_to_wkb,
    parse_wkb,
    wkb_polygon,
)

GEOM = "geometry"


def step_filter(df: DataFrame, predicate: str) -> DataFrame:
    """gdal vector filter — attribute WHERE."""
    return df.where(F.expr(predicate))


def step_select(df: DataFrame, cols: list[str]) -> DataFrame:
    """gdal vector select — field list (geometry passthrough)."""
    keep = cols + ([GEOM] if GEOM in df.columns and GEOM not in cols else [])
    return df.select(*keep)


@F.pandas_udf(T.BinaryType())
def _swap_xy_udf(wkb: pd.Series) -> pd.Series:
    def f(b):
        g = parse_wkb(bytes(b))
        for part in g.parts:
            part[:, [0, 1]] = part[:, [1, 0]]
        for rings in g.polys:
            for r in rings:
                r[:, [0, 1]] = r[:, [1, 0]]
        return geometry_to_wkb(g)

    return wkb.map(f)


def step_swap_xy(df: DataFrame) -> DataFrame:
    """gdal vector swap-xy — exchange coordinate order."""
    return df.withColumn(GEOM, _swap_xy_udf(F.col(GEOM)))


def step_segmentize(df: DataFrame, max_length: float) -> DataFrame:
    from gdal_spark.geo.st_functions import st_segmentize

    return df.withColumn(GEOM, st_segmentize(F.col(GEOM), F.lit(max_length)))


def step_simplify(df: DataFrame, tolerance: float) -> DataFrame:
    from gdal_spark.geo.st_functions import st_simplify

    return df.withColumn(GEOM, st_simplify(F.col(GEOM), F.lit(tolerance)))


def _is_legacy_tag(tag: str) -> bool:
    return tag in ("4326", "3857") or tag.startswith(("utm:", "lcc:"))


def _reproject_udf(src_crs: str, dst_crs: str):
    """Coordinate-transform factory.  The original closed-form tag
    grammar (4326 <-> 3857 <-> utm:<zone> <-> lcc:<lat1>,<lat2>,
    <lat0>,<lon0>) is kept verbatim; ANY other spelling resolves
    through the projection-zoo registry (geo/projzoo.resolve_crs:
    EPSG:n / ESRI:n / proj4 / WKT1), with Helmert datum crossings —
    every pair still routes through 4326, mirroring the reference's
    transformer composition (ogr/ogrct.cpp pipelines)."""
    import numpy as np

    from gdal_spark.geo import crs as C
    from gdal_spark.geo import projzoo as pz
    from gdal_spark.tiles import tilemath as tm

    src_key = None if _is_legacy_tag(src_crs) else pz.resolve_crs(src_crs)
    dst_key = None if _is_legacy_tag(dst_crs) else pz.resolve_crs(dst_crs)

    def to4326(x, y, tag):
        if tag == "4326":
            return x, y
        if tag == "3857":
            lon = np.degrees(x / tm.EARTH_RADIUS)
            lat = np.degrees(2 * np.arctan(np.exp(y / tm.EARTH_RADIUS)) - np.pi / 2)
            return lon, lat
        if tag.startswith("utm:"):
            return C.utm_inverse(x, y, int(tag.split(":")[1]))
        if tag.startswith("lcc:"):
            p = [float(v) for v in tag.split(":")[1].split(",")]
            return C.lcc_inverse(x, y, *p)
        raise ValueError(f"unsupported crs {tag}")

    def from4326(lon, lat, tag):
        if tag == "4326":
            return lon, lat
        if tag == "3857":
            return (
                tm.EARTH_RADIUS * np.radians(lon),
                tm.EARTH_RADIUS * np.log(np.tan(np.pi / 4 + np.radians(lat) / 2)),
            )
        if tag.startswith("utm:"):
            return C.utm_forward(lon, lat, int(tag.split(":")[1]))
        if tag.startswith("lcc:"):
            p = [float(v) for v in tag.split(":")[1].split(",")]
            return C.lcc_forward(lon, lat, *p)
        raise ValueError(f"unsupported crs {tag}")

    def tf(x, y):
        if src_key is None:
            lon, lat = to4326(x, y, src_crs)
        else:
            lon, lat = pz.reproject(x, y, src_key, 4326)
        if dst_key is None:
            return from4326(lon, lat, dst_crs)
        return pz.reproject(lon, lat, 4326, dst_key)

    @F.pandas_udf(T.BinaryType())
    def reproject(wkb: pd.Series) -> pd.Series:
        def f(b):
            g = parse_wkb(bytes(b))
            for part in g.parts:
                part[:, 0], part[:, 1] = tf(part[:, 0], part[:, 1])
            for rings in g.polys:
                for r in rings:
                    r[:, 0], r[:, 1] = tf(r[:, 0], r[:, 1])
            return geometry_to_wkb(g)

        return wkb.map(f)

    return reproject


def step_reproject(df: DataFrame, src_crs: str, dst_crs: str) -> DataFrame:
    """gdal vector reproject (apps/gdalalg_vector_reproject.cpp ->
    OGRGeometry::transform): per-vertex CRS transform of the geometry
    column across the closed-form chain 4326 / 3857 / utm:<zone> /
    lcc:<params>."""
    return df.withColumn(GEOM, _reproject_udf(src_crs, dst_crs)(F.col(GEOM)))


def step_make_valid(df: DataFrame) -> DataFrame:
    """gdal vector make-valid (apps/gdalalg_vector_make_valid.cpp ->
    OGRGeometry::MakeValid): repair self-intersecting rings via
    noding + planar face traversal (geo/makevalid.py)."""
    from gdal_spark.geo.st_functions import st_makevalid

    return df.withColumn(GEOM, st_makevalid(F.col(GEOM)))


def step_buffer(df: DataFrame, distance: float) -> DataFrame:
    from gdal_spark.geo.st_functions import st_buffer

    return df.withColumn(GEOM, st_buffer(F.col(GEOM), F.lit(distance)))


@F.pandas_udf(T.BinaryType())
def _bbox_clip_udf(wkb: pd.Series, xmin: pd.Series, ymin: pd.Series,
                   xmax: pd.Series, ymax: pd.Series) -> pd.Series:
    from gdal_spark.geo.clip import clip_convex

    out = []
    for b, x0, y0, x1, y1 in zip(wkb, xmin, ymin, xmax, ymax):
        g = parse_wkb(bytes(b))
        rect = np.array(
            [[x0, y0], [x1, y0], [x1, y1], [x0, y1], [x0, y0]], dtype=float
        )
        ring = g.all_rings()[0][0]
        clipped = clip_convex(ring, rect)
        out.append(wkb_polygon([clipped]) if len(clipped) else None)
    return pd.Series(out)


def step_clip(df: DataFrame, bbox: tuple[float, float, float, float]) -> DataFrame:
    """gdal vector clip --bbox: geometry clipped to the rect; rows
    with empty results dropped (reference drops empty features)."""
    x0, y0, x1, y1 = bbox
    out = df.withColumn(
        GEOM,
        _bbox_clip_udf(
            F.col(GEOM), F.lit(float(x0)), F.lit(float(y0)),
            F.lit(float(x1)), F.lit(float(y1)),
        ),
    )
    return out.where(F.col(GEOM).isNotNull())


@F.pandas_udf(T.ArrayType(T.BinaryType()))
def _explode_udf(wkb: pd.Series) -> pd.Series:
    def f(b):
        g = parse_wkb(bytes(b))
        if g.type_id == WKB_MULTIPOLYGON:
            return [wkb_polygon(rings) for rings in g.polys]
        return [bytes(b)]

    return wkb.map(f)


def step_explode_collections(df: DataFrame) -> DataFrame:
    """gdal vector explode-collections — one row per collection part."""
    return (
        df.withColumn("_parts", _explode_udf(F.col(GEOM)))
        .withColumn(GEOM, F.explode("_parts"))
        .drop("_parts")
    )


@F.pandas_udf(T.BinaryType())
def _promote_multi_udf(wkb: pd.Series) -> pd.Series:
    def f(b):
        g = parse_wkb(bytes(b))
        if g.type_id == WKB_POLYGON:
            return geometry_to_wkb(Geometry(WKB_MULTIPOLYGON, polys=[g.parts]))
        return bytes(b)

    return wkb.map(f)


def step_set_geom_type_multi(df: DataFrame) -> DataFrame:
    """gdal vector set-geom-type --multi (PROMOTE_TO_MULTI)."""
    return df.withColumn(GEOM, _promote_multi_udf(F.col(GEOM)))


def step_concat(dfs: list[DataFrame]) -> DataFrame:
    """gdal vector concat — schema-union by name (OGRUnionLayer)."""
    out = dfs[0]
    for d in dfs[1:]:
        out = out.unionByName(d, allowMissingColumns=True)
    return out


@F.pandas_udf(T.BinaryType())
def _wrapdateline_udf(wkb: pd.Series) -> pd.Series:
    from gdal_spark.geo.dateline import wrap_dateline_wkb

    return wkb.map(lambda b: wrap_dateline_wkb(bytes(b)))


def step_wrapdateline(df: DataFrame) -> DataFrame:
    """ogr2ogr -wrapdateline (apps/ogr2ogr_lib.cpp:8116): geometries
    crossing the antimeridian split at 180+360k and normalize into
    [-180, 180] (geo/dateline.py kernel)."""
    return df.withColumn(GEOM, _wrapdateline_udf(F.col(GEOM)))


# --- executable pipeline grammar ---------------------------------------------

def run_vector_pipeline(df: DataFrame, pipeline: str) -> DataFrame:
    """`gdal vector pipeline` — the unified `read ! step [args] !
    ... ! write` CLI grammar (apps/gdalalg_vector_pipeline.cpp,
    same step-chain model as the raster twin in
    operators/raster_pipeline.py).  Each step is one of this
    module's lazy DataFrame transformations, so the parsed chain is
    function composition that Catalyst fuses exactly like the
    reference's pull pipeline; `write` returns the composed
    DataFrame for the engine's vector sinks (sources/*).
    """
    from gdal_spark.operators.raster_pipeline import parse_pipeline

    steps = parse_pipeline(pipeline)
    for name, args in steps[1:-1]:
        if name == "filter":
            df = step_filter(df, args.get("where") or args["_positional"])
        elif name == "select":
            df = step_select(
                df, (args.get("fields") or args["_positional"]).split(",")
            )
        elif name == "swap-xy":
            df = step_swap_xy(df)
        elif name == "segmentize":
            df = step_segmentize(
                df, float(args.get("max_length") or args["_positional"])
            )
        elif name == "simplify":
            df = step_simplify(
                df, float(args.get("tolerance") or args["_positional"])
            )
        elif name == "reproject":
            df = step_reproject(df, args["src_crs"], args["dst_crs"])
        elif name == "make-valid":
            df = step_make_valid(df)
        elif name == "buffer":
            df = step_buffer(
                df, float(args.get("distance") or args["_positional"])
            )
        elif name == "clip":
            bbox = tuple(
                float(v)
                for v in (args.get("bbox") or args["_positional"]).split(",")
            )
            if len(bbox) != 4:
                raise ValueError("vector pipeline: clip --bbox needs 4 values")
            df = step_clip(df, bbox)
        elif name == "explode-collections":
            df = step_explode_collections(df)
        elif name == "set-geom-type":
            df = step_set_geom_type_multi(df)
        elif name == "wrapdateline":
            df = step_wrapdateline(df)
        else:
            raise ValueError(f"vector pipeline: unknown step {name!r}")
    return df
