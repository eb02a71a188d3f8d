"""TIN linear gridding (raster/tin.py) tests."""

import numpy as np

from gdal_spark.raster.tin import delaunay, tin_interpolate_grid


def test_delaunay_square():
    pts = np.array([[0, 0], [1, 0], [0, 1], [1, 1.0]])
    tris = delaunay(pts)
    assert len(tris) == 2
    # the two triangles partition the square
    area = 0.0
    for a, b, c in tris:
        pa, pb, pc = pts[a], pts[b], pts[c]
        area += abs(
            (pb[0] - pa[0]) * (pc[1] - pa[1]) - (pc[0] - pa[0]) * (pb[1] - pa[1])
        ) / 2
    assert abs(area - 1.0) < 1e-12


def test_delaunay_empty_circumcircles():
    """Delaunay property: no point inside any triangle's circumcircle."""
    rng = np.random.default_rng(9)
    pts = rng.uniform(0, 10, (40, 2))
    tris = delaunay(pts)
    from gdal_spark.raster.tin import _circumcircle

    for a, b, c in tris:
        ux, uy, r2 = _circumcircle(pts[a], pts[b], pts[c])
        d2 = (pts[:, 0] - ux) ** 2 + (pts[:, 1] - uy) ** 2
        inside = d2 < r2 - 1e-9
        inside[[a, b, c]] = False
        assert not inside.any()


def test_linear_field_exact_any_triangulation():
    rng = np.random.default_rng(4)
    pts = np.vstack([rng.uniform(0, 32, (50, 2)), [[0, 0], [32, 0], [0, 32], [32, 32]]])
    vals = 2.0 * pts[:, 0] - 7.0 * pts[:, 1] + 3.0
    v, m = tin_interpolate_grid(pts, vals, 32, 32, (0, 0, 32, 32))
    assert m.all()
    cx = np.arange(32) + 0.5
    CX, CY = np.meshgrid(cx, cx)
    assert np.abs(v - (2 * CX - 7 * CY + 3))[m].max() < 1e-9


def test_outside_hull_masked():
    pts = np.array([[10, 10], [20, 10], [15, 20.0]])
    vals = np.ones(3)
    v, m = tin_interpolate_grid(pts, vals, 32, 32, (0, 0, 32, 32))
    assert m.any() and not m.all()
    assert not m[0, 0]  # far corner outside the triangle


class TestTinGridPoints:
    """Distributed TIN gridding (operators/gridded.tin_grid_points):
    the point set is a DataFrame — never collected — cell-partitioned
    with halo."""

    def _points(self, spark, n=300, skew=False):
        import numpy as np
        from pyspark.sql import functions as F

        rng = np.random.default_rng(5)
        px = rng.uniform(0, 32, n).round(2)
        py = rng.uniform(0, 32, n).round(2)
        if skew:
            # dump 80% of the points into one cell (hot key)
            px[: int(n * 0.8)] = rng.uniform(0, 4, int(n * 0.8)).round(2)
            py[: int(n * 0.8)] = rng.uniform(0, 4, int(n * 0.8)).round(2)
        pins = [(float(t), float(e)) for t in range(0, 33, 4)
                for e in (0.0, 32.0)]
        rows = (
            [(float(x), float(y)) for x, y in zip(px, py)]
            + pins + [(y, x) for x, y in pins]
        )
        return (
            spark.createDataFrame(rows, "px double, py double")
            .distinct()
            .withColumn("v", 2.0 * F.col("px") - 7.0 * F.col("py"))
        )

    def _expected(self, gx, gy):
        # linear field at pixel centers: any triangulation is exact
        x = gx + 0.5
        y = gy + 0.5
        return 2.0 * x - 7.0 * y

    def test_linear_field_full_coverage(self, spark):
        from gdal_spark.operators.gridded import tin_grid_points

        out = tin_grid_points(
            self._points(spark), 32, 32, (0.0, 0.0, 32.0, 32.0), cell_px=8
        ).collect()
        assert len(out) == 32 * 32
        for r in out:
            assert abs(r.v - self._expected(r.gx, r.gy)) < 1e-9

    def test_skewed_points_still_exact(self, spark):
        from gdal_spark.operators.gridded import tin_grid_points

        out = tin_grid_points(
            self._points(spark, skew=True), 32, 32,
            (0.0, 0.0, 32.0, 32.0), cell_px=8,
        ).collect()
        assert len(out) == 32 * 32
        for r in out:
            assert abs(r.v - self._expected(r.gx, r.gy)) < 1e-9

    def test_no_driver_collect_in_operator(self):
        import inspect

        from gdal_spark.operators import gridded

        src = inspect.getsource(gridded.tin_grid_points)
        assert ".collect()" not in src
