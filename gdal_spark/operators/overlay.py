"""Layer x layer spatial overlay (the reference's 7-verb layer
algebra family) over the general boolean kernel.

Semantics re-derived from ogr/ogrsf_frmts/generic/ogrlayer.cpp:
Intersection :3345, Union :3763, SymDifference :4300, Identity
:4730, Update :5148, Clip :5497, Erase :5806 — nested loop with the
method layer's spatial index pruning candidates, then exact pairwise
GEOS geometry. Result features carry input fields (+ method fields
for pair pieces) and the overlay GEOMETRY (PROMOTE_TO_MULTI
supported; KEEP_LOWER_DIMENSION_GEOMETRIES is moot under the
kernel's general-position contract — crossings are transversal, so
results are always areal).

Distributed shape (scale discipline):
- candidate pairs: both layers explode their bbox's covering
  pitch-16 planar cells (Column math) -> (cx, cy) equi-join + bbox
  overlap reject + pair dedupe. Never a nested loop.
- pair pieces (x intersect y): mapInPandas over candidate pairs.
- per-x remainders (x minus every intersecting y — the sequential
  Difference loop of Union/Identity/Erase/SymDifference/Update):
  groupBy(fid) + applyInPandas; a feature's candidate group is its
  spatial neighborhood, so groups are small and the shuffle is
  pair-sized. Features with no candidates pass through whole via a
  left_anti join (no work, no decode).
- verb outputs are unions of those three building blocks.

The legacy convex-measure operator (overlay_join) now runs on the
same general kernel (geo/boolean.py), with the historical output
contract (areas only, outer rings) preserved for its oracle.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from gdal_spark.geo.boolean import boolean_op, polyset_area, rings_to_polygons
from gdal_spark.geo.geom import ring_area
from gdal_spark.geo.wkb import parse_wkb, wkb_multipolygon, wkb_polygon
from gdal_spark.operators.spatial_join import DEFAULT_INDEX_ZOOM, with_bbox_cells

CELL_PITCH = 16  # planar candidate-cell pitch (fixture cell size)

OVERLAY_SCHEMA = T.StructType(
    [
        T.StructField("fid_a", T.LongType()),
        T.StructField("fid_b", T.LongType()),
        T.StructField("inter_e4", T.LongType()),
        T.StructField("a_only_e4", T.LongType()),
        T.StructField("b_only_e4", T.LongType()),
        T.StructField("sym_diff_e4", T.LongType()),
        T.StructField("union_e4", T.LongType()),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("fid_a", T.LongType()),
        T.StructField("fid_b", T.LongType()),
        T.StructField("geom", T.BinaryType()),
        T.StructField("area_q4", T.LongType()),
        T.StructField("n_polys", T.IntegerType()),
        T.StructField("n_rings", T.IntegerType()),
    ]
)

_FEATURE_COLS = ["fid_a", "fid_b", "geom", "area_q4", "n_polys", "n_rings"]


def _geom_rings(wkb: bytes) -> list[np.ndarray]:
    """All rings of a (multi)polygon WKB as a flat even-odd set."""
    g = parse_wkb(bytes(wkb))
    return [r for poly in g.all_rings() for r in poly]


def _emit(rings: list[np.ndarray], promote: bool) -> tuple | None:
    """-> (wkb, area_q4, n_polys, n_rings) or None when empty."""
    polys = rings_to_polygons(rings)
    if not polys:
        return None
    area = 0.0
    for poly in polys:
        area += abs(ring_area(poly[0]))
        for hole in poly[1:]:
            area -= abs(ring_area(hole))
    if area <= 0.0:
        return None
    if promote or len(polys) > 1:
        wkb = wkb_multipolygon(polys)
    else:
        wkb = wkb_polygon(polys[0])
    # round-trip: recompute area from the EMITTED bytes so the oracle
    # value proves the WKB is parseable and consistent
    polys2 = parse_wkb(wkb).all_rings()
    area2 = 0.0
    n_rings = 0
    for poly in polys2:
        area2 += abs(ring_area(poly[0]))
        for hole in poly[1:]:
            area2 -= abs(ring_area(hole))
        n_rings += len(poly)
    return wkb, int(np.rint(area2 * 4)), len(polys2), n_rings


def _planar_cells(df: DataFrame, expand: float = 0.0) -> DataFrame:
    """Explode each feature to the pitch-P cells covering its bbox
    (optionally expanded by `expand` units per side)."""
    p = CELL_PITCH
    return df.withColumn(
        "cx",
        F.explode(
            F.sequence(
                F.floor((F.col("bxmin") - expand) / p).cast("int"),
                F.floor((F.col("bxmax") + expand) / p).cast("int"),
            )
        ),
    ).withColumn(
        "cy",
        F.explode(
            F.sequence(
                F.floor((F.col("bymin") - expand) / p).cast("int"),
                F.floor((F.col("bymax") + expand) / p).cast("int"),
            )
        ),
    )


def candidate_pairs(a: DataFrame, b: DataFrame, expand: float = 0.0) -> DataFrame:
    """(fid_a, geom_a, fid_b, geom_b) for features whose bboxes
    overlap after expanding A's by `expand` per side (expand > 0 pulls
    in near-miss neighbours, e.g. for distance queries)."""
    aa = _planar_cells(
        a.select(
            F.col("fid").alias("fid_a"), F.col("geometry").alias("geom_a"),
            "bxmin", "bymin", "bxmax", "bymax",
        ),
        expand,
    ).withColumnsRenamed(
        {"bxmin": "axmin", "bymin": "aymin", "bxmax": "axmax", "bymax": "aymax"}
    )
    bb = _planar_cells(
        b.select(
            F.col("fid").alias("fid_b"), F.col("geometry").alias("geom_b"),
            "bxmin", "bymin", "bxmax", "bymax",
        )
    ).withColumnsRenamed(
        {"bxmin": "bxmin2", "bymin": "bymin2", "bxmax": "bxmax2", "bymax": "bymax2"}
    )
    return (
        aa.join(bb, ["cx", "cy"])
        .where(
            (F.col("axmin") - expand < F.col("bxmax2"))
            & (F.col("axmax") + expand > F.col("bxmin2"))
            & (F.col("aymin") - expand < F.col("bymax2"))
            & (F.col("aymax") + expand > F.col("bymin2"))
        )
        .select("fid_a", "geom_a", "fid_b", "geom_b")
        .dropDuplicates(["fid_a", "fid_b"])
    )


def _pair_pieces(pairs: DataFrame, promote: bool) -> DataFrame:
    """x intersect y per candidate pair; empty results dropped
    (ogrlayer.cpp:3545 skips empty intersections)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            recs = []
            for fa, fb, ga, gb in zip(
                pdf["fid_a"], pdf["fid_b"], pdf["geom_a"], pdf["geom_b"]
            ):
                out = boolean_op(_geom_rings(ga), _geom_rings(gb), "inter")
                emitted = _emit(out, promote)
                if emitted is None:
                    continue
                wkb, area_q4, n_polys, n_rings = emitted
                recs.append(
                    {
                        "fid_a": int(fa), "fid_b": int(fb), "geom": wkb,
                        "area_q4": area_q4, "n_polys": n_polys,
                        "n_rings": n_rings,
                    }
                )
            yield pd.DataFrame(recs, columns=_FEATURE_COLS)

    return pairs.mapInPandas(run, FEATURE_SCHEMA)


def _grouped_op(
    pairs: DataFrame,
    side: str,
    op: str,
    promote: bool,
) -> DataFrame:
    """Per-feature sequential op over its candidate partners:
    op='diff' -> x minus every y (the x_geom_diff loop);
    op='clip' -> x intersect (union of every y) (Clip :5560-5597)."""
    fid_col = f"fid_{side}"
    geom_col = f"geom_{side}"
    other_geom = "geom_b" if side == "a" else "geom_a"

    def run(key, pdf: pd.DataFrame) -> pd.DataFrame:
        cur = _geom_rings(pdf[geom_col].iloc[0])
        if op == "clip":
            acc: list[np.ndarray] | None = None
            for gb in pdf[other_geom]:
                rings = _geom_rings(gb)
                acc = rings if acc is None else boolean_op(acc, rings, "union")
            cur = boolean_op(cur, acc, "inter")
        else:
            for gb in pdf[other_geom]:
                cur = boolean_op(cur, _geom_rings(gb), "diff")
        emitted = _emit(cur, promote)
        if emitted is None:
            return pd.DataFrame(columns=_FEATURE_COLS)
        wkb, area_q4, n_polys, n_rings = emitted
        return pd.DataFrame(
            [
                {
                    "fid_a": int(key[0]) if side == "a" else None,
                    "fid_b": int(key[0]) if side == "b" else None,
                    "geom": wkb, "area_q4": area_q4,
                    "n_polys": n_polys, "n_rings": n_rings,
                }
            ],
            columns=_FEATURE_COLS,
        )

    return pairs.groupBy(fid_col).applyInPandas(run, FEATURE_SCHEMA)


def _passthrough(
    side_df: DataFrame, pairs: DataFrame, side: str, promote: bool
) -> DataFrame:
    """Features with NO candidate partner emitted whole."""
    fid_col = f"fid_{side}"
    rest = side_df.join(
        pairs.select(F.col(fid_col).alias("fid")).distinct(), "fid", "left_anti"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            recs = []
            for fid, wkb in zip(pdf["fid"], pdf["geometry"]):
                emitted = _emit(_geom_rings(wkb), promote)
                if emitted is None:
                    continue
                out_wkb, area_q4, n_polys, n_rings = emitted
                recs.append(
                    {
                        "fid_a": int(fid) if side == "a" else None,
                        "fid_b": int(fid) if side == "b" else None,
                        "geom": out_wkb, "area_q4": area_q4,
                        "n_polys": n_polys, "n_rings": n_rings,
                    }
                )
            yield pd.DataFrame(recs, columns=_FEATURE_COLS)

    return rest.select("fid", "geometry").mapInPandas(run, FEATURE_SCHEMA)


def _remainders(
    side_df: DataFrame, pairs: DataFrame, side: str, promote: bool
) -> DataFrame:
    """x minus union(intersecting y) for every x (grouped diff), plus
    whole passthrough for x with no candidates."""
    return _grouped_op(pairs, side, "diff", promote).unionByName(
        _passthrough(side_df, pairs, side, promote)
    )


def overlay_features(
    a: DataFrame,
    b: DataFrame,
    verb: str,
    promote_to_multi: bool = True,
) -> DataFrame:
    """General layer algebra. Inputs: (fid, geometry, bxmin..bymax).
    -> (fid_a, fid_b, geom, area_q4, n_polys, n_rings); fid_a/fid_b
    are null for pieces that carry only one side's fields, mirroring
    the result-field mapping of ogrlayer.cpp (input fields ⊕ method
    fields; the absent side's fields stay unset)."""
    pairs = candidate_pairs(a, b).localCheckpoint()
    if verb == "intersection":
        return _pair_pieces(pairs, promote_to_multi)
    if verb == "clip":
        return _grouped_op(pairs, "a", "clip", promote_to_multi)
    if verb == "erase":
        return _remainders(a, pairs, "a", promote_to_multi)
    if verb == "identity":
        return _pair_pieces(pairs, promote_to_multi).unionByName(
            _remainders(a, pairs, "a", promote_to_multi)
        )
    if verb == "union":
        return (
            _pair_pieces(pairs, promote_to_multi)
            .unionByName(_remainders(a, pairs, "a", promote_to_multi))
            .unionByName(_remainders(b, pairs, "b", promote_to_multi))
        )
    if verb == "symdifference":
        return _remainders(a, pairs, "a", promote_to_multi).unionByName(
            _remainders(b, pairs, "b", promote_to_multi)
        )
    if verb == "update":
        return _remainders(a, pairs, "a", promote_to_multi).unionByName(
            _passthrough(
                b,
                # Update passes EVERY method feature through unchanged
                pairs.limit(0),
                "b",
                promote_to_multi,
            )
        )
    raise ValueError(f"unknown overlay verb: {verb}")


# ---------------------------------------------------------------------------
# legacy convex-measure operator (kept contract; general kernel)
# ---------------------------------------------------------------------------

def overlay_join(
    zones_a: DataFrame,
    zones_b: DataFrame,
    index_zoom: int = DEFAULT_INDEX_ZOOM,
) -> DataFrame:
    """Pairs of intersecting polygons (outer rings) with intersection
    / A-only / union areas (degrees^2, floor * 1e4).

    Inputs need (fid, geometry, zxmin..zymax). Pairs with zero
    intersection area are dropped (the reference emits no feature
    when the GEOS op returns empty).
    """
    a = with_bbox_cells(
        zones_a.select(
            F.col("fid").alias("fid_a"), F.col("geometry").alias("geom_a"),
            F.col("zxmin").alias("axmin"), F.col("zymin").alias("aymin"),
            F.col("zxmax").alias("axmax"), F.col("zymax").alias("aymax"),
        ),
        "axmin", "aymin", "axmax", "aymax", index_zoom,
    )
    b = with_bbox_cells(
        zones_b.select(
            F.col("fid").alias("fid_b"), F.col("geometry").alias("geom_b"),
            F.col("zxmin").alias("bxmin"), F.col("zymin").alias("bymin"),
            F.col("zxmax").alias("bxmax"), F.col("zymax").alias("bymax"),
        ),
        "bxmin", "bymin", "bxmax", "bymax", index_zoom,
    )
    cand = (
        a.join(b, "cell")
        .where(
            (F.col("axmin") <= F.col("bxmax")) & (F.col("axmax") >= F.col("bxmin"))
            & (F.col("aymin") <= F.col("bymax")) & (F.col("aymax") >= F.col("bymin"))
        )
        .select("fid_a", "geom_a", "fid_b", "geom_b")
        .dropDuplicates(["fid_a", "fid_b"])
    )

    def refine(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cache: dict[tuple, np.ndarray] = {}

        def outer_ring(key, wkb) -> np.ndarray:
            ring = cache.get(key)
            if ring is None:
                g = parse_wkb(bytes(wkb))
                ring = g.all_rings()[0][0]
                if len(cache) < 65536:
                    cache[key] = ring
            return ring

        for pdf in batches:
            recs = []
            for fa, ga, fb, gb in zip(
                pdf["fid_a"], pdf["geom_a"], pdf["fid_b"], pdf["geom_b"]
            ):
                ra = outer_ring(("a", fa), ga)
                rb = outer_ring(("b", fb), gb)
                if ra.shape == rb.shape and np.array_equal(ra, rb):
                    # identical polygons (same LCG fid in both layers)
                    # violate general position; intersection is trivial
                    ai = abs(ring_area(ra))
                else:
                    ai = polyset_area(boolean_op([ra], [rb], "inter"))
                if ai <= 0.0:
                    continue
                aa = abs(ring_area(ra))
                ab = abs(ring_area(rb))
                recs.append(
                    {
                        "fid_a": int(fa),
                        "fid_b": int(fb),
                        "inter_e4": int(np.floor(ai * 1e4)),
                        # clamp: identical polygons make aa - ai an
                        # exact 0 where float noise flips the floor
                        "a_only_e4": max(0, int(np.floor((aa - ai) * 1e4))),
                        "b_only_e4": max(0, int(np.floor((ab - ai) * 1e4))),
                        "sym_diff_e4": max(0, int(np.floor((aa + ab - 2 * ai) * 1e4))),
                        "union_e4": int(np.floor((aa + ab - ai) * 1e4)),
                    }
                )
            yield pd.DataFrame(
                recs,
                columns=["fid_a", "fid_b", "inter_e4", "a_only_e4",
                         "b_only_e4", "sym_diff_e4", "union_e4"]
            )

    return cand.mapInPandas(refine, OVERLAY_SCHEMA)
