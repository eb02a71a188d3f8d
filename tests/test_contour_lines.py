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


def test_global_chaining_cone_rings_across_tiles(spark):
    """A cone centered on the 4-corner point of a 2x2 tile grid:
    every contour circle crosses all four tiles and must come back as
    exactly ONE closed global polyline (cross-tile chaining)."""
    import numpy as np

    from gdal_spark.operators.gridded import contour_lines_global

    n = 64

    def tile(tx, ty):
        yy, xx = np.mgrid[0:n, 0:n]
        cone = 200.0 - np.hypot(xx + tx * n - 64, yy + ty * n - 64)
        return (tx, ty, bytearray(cone.astype("<f8").tobytes()))

    df = spark.createDataFrame(
        [tile(a, b) for a in (0, 1) for b in (0, 1)],
        "tile_x int, tile_y int, data binary",
    )
    out = {r["level"]: r for r in contour_lines_global(df, [180.25, 150.25], n).collect()}
    for lvl, radius in ((180.25, 19.75), (150.25, 49.75)):
        r = out[lvl]
        assert r["n_polylines"] == 1 and r["n_closed"] == 1
        circumference = 2 * np.pi * radius
        assert abs(r["total_len_e4"] / 1e4 - circumference) < 0.2


class TestContourPolygons:
    """Contour polygon bands (operators/gridded.contour_polygons;
    reference alg/contour.cpp -p + polygon_ring_appender.h)."""

    def _tiles(self, spark, n, cx, cy):
        import numpy as np
        import pandas as pd
        from pyspark.sql import types as T2

        rows = []
        for tx in (0, 1):
            for ty in (0, 1):
                gx = np.arange(n) + tx * n
                gy = (np.arange(n) + ty * n)[:, None]
                arr = (np.abs(gx[None, :] - cx) + np.abs(gy - cy)).astype(
                    np.float64
                )
                rows.append((tx, ty, arr.tobytes()))
        schema = T2.StructType(
            [
                T2.StructField("tile_x", T2.IntegerType()),
                T2.StructField("tile_y", T2.IntegerType()),
                T2.StructField("data", T2.BinaryType()),
            ]
        )
        return spark.createDataFrame(rows, schema)

    def test_interior_annuli(self, spark):
        from gdal_spark.operators.gridded import contour_polygons

        tiles = self._tiles(spark, 16, 16, 16)
        out = {
            r.band: r
            for r in contour_polygons(
                tiles, [2.25, 6.25, 10.25], 16, 32, 32
            ).collect()
        }
        for bi, (lo, hi) in enumerate([(2.25, 6.25), (6.25, 10.25)]):
            r = out[bi]
            assert r.n_polys == 1 and r.n_rings == 2
            assert r.area_q16 == round(16 * 2 * (hi * hi - lo * lo))

    def test_border_clipped_bands_partition_domain(self, spark):
        from gdal_spark.operators.gridded import contour_polygons

        # apex at (8, 8): outer bands get clipped by the raster edge;
        # bands spanning below-min to above-max must tile the whole
        # 31x31 marching domain exactly
        tiles = self._tiles(spark, 16, 8, 8)
        rows = contour_polygons(
            tiles, [-0.25, 10.25, 20.25, 100.25], 16, 32, 32
        ).collect()
        assert sum(r.area_q16 for r in rows) == 16 * 31 * 31
        # the lowest band: diamond radius 10.25 at (8,8), clipped by
        # the x=0 and y=0 borders (two 2.25-leg corner triangles cut)
        low = next(r for r in rows if r.band == 0)
        assert low.n_polys == 1 and low.n_rings == 1
        assert low.area_q16 == round(16 * (2 * 10.25**2 - 2 * 2.25**2))
