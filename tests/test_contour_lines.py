"""Contour polyline chaining tests."""

import numpy as np

from gdal_spark.operators.gridded import chain_segments, contour_polylines


def test_chain_simple_path():
    segs = [((0, 0), (1, 0)), ((1, 0), (2, 1)), ((2, 1), (3, 1))]
    lines = chain_segments(segs)
    assert len(lines) == 1
    assert lines[0][0] == (0, 0) and lines[0][-1] == (3, 1)
    assert len(lines[0]) == 4


def test_chain_closed_ring():
    segs = [((0, 0), (1, 0)), ((1, 0), (1, 1)), ((1, 1), (0, 1)), ((0, 1), (0, 0))]
    lines = chain_segments(segs)
    assert len(lines) == 1
    assert lines[0][0] == lines[0][-1]


def test_chain_two_components():
    segs = [((0, 0), (1, 0)), ((5, 5), (6, 5)), ((6, 5), (7, 5))]
    lines = chain_segments(segs)
    assert sorted(len(l) for l in lines) == [2, 3]


def test_cone_produces_closed_ring(spark):
    """A radial cone surface has circular contours: one closed ring
    per level fully inside the tile."""
    import pandas as pd
    from pyspark.sql import types as T

    n = 64
    yy, xx = np.mgrid[0:n, 0:n]
    cone = 100.0 - np.hypot(xx - 32, yy - 32)  # peak 100 at center
    df = spark.createDataFrame(
        [(0, 0, bytearray(cone.astype("<f8").tobytes()))],
        "tile_x int, tile_y int, data binary",
    )
    out = {r["level"]: r for r in contour_polylines(df, [90.0, 80.0], n).collect()}
    for lvl in (90, 80):
        assert out[lvl]["n_polylines"] == 1
        assert out[lvl]["n_closed"] == 1
    # segment conservation: points = segments + 1 per open line, ==
    # segments for closed rings (+1 duplicated closing point)
    assert out[90]["n_points"] >= 3
