"""Coverage simplification (operators/coverage.py) — the
GEOSCoverageSimplifyVW dual."""

import numpy as np
import pytest

from gdal_spark.geo.wkb import wkb_polygon
from gdal_spark.operators.coverage import simplify_coverage, vw_simplify


def test_vw_removes_below_area_tolerance():
    chain = np.array([(0.0, 0.0), (1.0, 0.1), (2.0, 0.0)])
    # triangle area = 0.1 -> removed at tol 0.4 (area 0.16), kept at 0.3
    np.testing.assert_array_equal(
        vw_simplify(chain, 0.4), [(0, 0), (2, 0)]
    )
    np.testing.assert_array_equal(vw_simplify(chain, 0.3), chain)


def test_vw_endpoints_fixed_and_cascade():
    # staircase: removing one vertex grows the neighbor's area
    chain = np.array(
        [(0.0, 0.0), (1.0, 0.2), (2.0, 0.0), (3.0, 0.2), (4.0, 0.0)]
    )
    out = vw_simplify(chain, 10.0)  # huge tolerance: only endpoints stay
    np.testing.assert_array_equal(out, [(0, 0), (4, 0)])


def _pair(spark, a):
    left = [(0, 0), (4, 0), (4 + a, 4), (4, 8), (0, 8), (0, 0)]
    right = [(4, 0), (8, 0), (8, 8), (4, 8), (4 + a, 4), (4, 0)]
    return spark.createDataFrame(
        [
            (0, bytearray(wkb_polygon([np.array(left, float)]))),
            (1, bytearray(wkb_polygon([np.array(right, float)]))),
        ],
        "fid long, geometry binary",
    )


def test_pair_consistency_no_gap_no_overlap(spark):
    out = (
        simplify_coverage(_pair(spark, 0.25), 1.2)
        .toPandas().set_index("fid")
    )
    # both owners lose the bulge TOGETHER: areas become exactly 32
    assert out.loc[0, "n_pts"] == 4 and out.loc[1, "n_pts"] == 4
    assert out.loc[0, "area2"] == 64.0 and out.loc[1, "area2"] == 64.0


def test_pair_kept_above_tolerance(spark):
    out = (
        simplify_coverage(_pair(spark, 0.5), 1.2)
        .toPandas().set_index("fid")
    )
    # bulge VW area 2.0 >= 1.44 -> kept; union stays 128
    assert out.loc[0, "n_pts"] == 5 and out.loc[1, "n_pts"] == 5
    assert out.loc[0, "area2"] + out.loc[1, "area2"] == 128.0


def test_junction_nodes_preserved(spark):
    """Three boxes stacked: the T-junction vertices where ownership
    changes must survive even a huge tolerance."""
    a_ = [(0, 0), (4, 0), (4, 4), (0, 4), (0, 0)]
    b_ = [(0, 4), (4, 4), (4, 8), (0, 8), (0, 4)]
    c_ = [(4, 0), (8, 0), (8, 8), (4, 8), (4, 4), (4, 0)]
    df = spark.createDataFrame(
        [
            (0, bytearray(wkb_polygon([np.array(a_, float)]))),
            (1, bytearray(wkb_polygon([np.array(b_, float)]))),
            (2, bytearray(wkb_polygon([np.array(c_, float)]))),
        ],
        "fid long, geometry binary",
    )
    out = simplify_coverage(df, 100.0).toPandas().set_index("fid")
    # (4,4) joins three polygons: it must remain in all three rings
    for fid in (0, 1, 2):
        assert "4.0 4.0" in out.loc[fid, "wkt_ring"]
    # areas unchanged (all boundary chains are straight already)
    assert out.loc[0, "area2"] == 32.0
    assert out.loc[1, "area2"] == 32.0
    assert out.loc[2, "area2"] == 64.0


def test_preserve_boundary_flag(spark):
    """A bulge on the coverage EXTERIOR is kept with
    preserve_boundary=True and simplified away with False."""
    a = 0.25
    left = [(0, 0), (4, 0), (4, 8), (0, 8), (-a, 4), (0, 0)]
    df = spark.createDataFrame(
        [(0, bytearray(wkb_polygon([np.array(left, float)])))],
        "fid long, geometry binary",
    )
    keep = simplify_coverage(df, 1.2, preserve_boundary=True).toPandas()
    assert keep.loc[0, "n_pts"] == 5
    simp = simplify_coverage(df, 1.2, preserve_boundary=False).toPandas()
    assert simp.loc[0, "n_pts"] == 4
    assert simp.loc[0, "area2"] == 64.0


def test_multipolygon_member_rings_not_dropped(spark):
    """A MultiPolygon coverage member contributes EVERY part's rings
    (ring id = part*4096 + ring)."""
    from gdal_spark.geo.wkb import wkb_multipolygon

    a_ = [(0, 0), (4, 0), (4, 4), (0, 4), (0, 0)]
    b_ = [(10, 0), (14, 0), (14, 4), (10, 4), (10, 0)]
    df = spark.createDataFrame(
        [(0, bytearray(wkb_multipolygon(
            [[np.array(a_, float)], [np.array(b_, float)]]
        )))],
        "fid long, geometry binary",
    )
    out = simplify_coverage(df, 0.5).toPandas().sort_values("ring")
    assert list(out["ring"]) == [0, 4096]
    assert list(out["area2"]) == [32.0, 32.0]
