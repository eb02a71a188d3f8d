"""Constructive ops: concave hull, normalize, topology-preserving
simplify, build-area, polygonize (geo/constructive.py +
geo/arrangement.py). Reference semantics: GEOS via
ogr/ogrgeometry.cpp:4106,4305,6440,6789,6916."""

import numpy as np

from gdal_spark.geo.arrangement import build_area, polygonize_faces
from gdal_spark.geo.constructive import (
    concave_hull,
    normalize_line,
    normalize_polys,
    simplify_preserve_topology,
)
from gdal_spark.geo.geom import ring_area


def sq(x0, y0, x1, y1):
    return np.array(
        [[x0, y0], [x1, y0], [x1, y1], [x0, y1], [x0, y0]], dtype=float
    )


class TestConcaveHull:
    def _l_points(self):
        pts = [(x, y) for x in range(11) for y in range(11) if x <= 5 or y <= 5]
        return np.array(pts, dtype=float)

    def test_ratio_one_is_convex_hull(self):
        pts = self._l_points()
        assert ring_area(concave_hull(pts, 1.0)) == 87.5  # 100 - notch corner

    def test_ratio_zero_carves_the_notch(self):
        pts = self._l_points()
        # maximal erosion recovers the true L-region area
        assert ring_area(concave_hull(pts, 0.0)) == 75.0

    def test_monotone_in_ratio(self):
        pts = self._l_points()
        areas = [ring_area(concave_hull(pts, r)) for r in (0.0, 0.3, 0.7, 1.0)]
        assert areas == sorted(areas)

    def test_hull_contains_all_points(self):
        from gdal_spark.geo.geom import points_in_ring

        rng = np.random.default_rng(3)
        pts = rng.uniform(0, 10, (60, 2)).round(1)
        pts = np.unique(pts, axis=0)
        hull = concave_hull(pts, 0.3)
        inside = points_in_ring(pts[:, 0], pts[:, 1], hull)
        # sites not strictly inside must sit ON the hull boundary
        # (erosion keeps every site in the closed region)
        seg_a, seg_b = hull[:-1], hull[1:]
        for p in pts[~inside]:
            d = seg_b - seg_a
            t = np.clip(
                ((p - seg_a) * d).sum(1) / (d * d).sum(1), 0.0, 1.0
            )
            dist = np.hypot(*(p - (seg_a + t[:, None] * d)).T)
            assert dist.min() < 1e-9


class TestNormalize:
    def test_shell_cw_min_start(self):
        shell = np.array([[4, 0], [4, 4], [0, 4], [0, 0], [4, 0]], float)
        hole = np.array([[1, 1], [1, 2], [2, 2], [2, 1], [1, 1]], float)
        out = normalize_polys([[shell, hole]])
        s, h = out[0]
        assert tuple(s[0]) == (0.0, 0.0)
        assert ring_area(s) < 0  # shell CW
        assert tuple(h[0]) == (1.0, 1.0)
        assert ring_area(h) > 0  # hole CCW

    def test_idempotent(self):
        shell = sq(0, 0, 4, 4)
        once = normalize_polys([[shell]])
        twice = normalize_polys(once)
        assert np.array_equal(once[0][0], twice[0][0])

    def test_line_reversal(self):
        ln = np.array([[5.0, 0.0], [0.0, 0.0]])
        out = normalize_line(ln)
        assert tuple(out[0]) == (0.0, 0.0)
        # already-normal line untouched
        assert np.array_equal(normalize_line(out), out)


class TestSimplifyPreserveTopology:
    def test_never_collapses(self):
        # plain DP at tol=5 collapses this thin strip; SPT must not
        r = np.array([[0, 0], [10, 0.01], [20, 0], [20, 1], [0, 1], [0, 0]],
                     dtype=float)
        out = simplify_preserve_topology([r], 5.0)
        assert len(out) == 1
        assert abs(ring_area(out[0])) > 0
        assert len(out[0]) >= 4

    def test_simplifies_when_safe(self):
        # redundant collinear-ish vertices drop at generous tolerance
        r = np.array([[0, 0], [2, 0.01], [4, 0], [4, 4], [0, 4], [0, 0]],
                     dtype=float)
        out = simplify_preserve_topology([r], 0.5)
        assert len(out[0]) == 5  # square + closure

    def test_holes_survive(self):
        rings = [sq(0, 0, 8, 8), sq(3, 3, 4, 4)]
        out = simplify_preserve_topology(rings, 10.0)
        assert len(out) == 2
        assert all(abs(ring_area(r)) > 0 for r in out)


class TestBuildAreaPolygonize:
    def test_alternating_nesting(self):
        rings = [sq(0, 0, 8, 8), sq(2, 2, 6, 6), sq(3, 3, 4, 4)]
        assert sum(ring_area(r) for r in build_area(rings)) == 49.0

    def test_polygonize_donut_plus_island(self):
        polys = polygonize_faces([sq(0, 0, 4, 4), sq(1, 1, 2, 2)])
        areas = sorted(
            round(sum(ring_area(r) for r in p), 9) for p in polys
        )
        assert areas == [1.0, 15.0]

    def test_polygonize_crossing_linework(self):
        # two overlapping 2x2 squares (collinear shared rails dedupe
        # keep-one): three bounded faces of area 2 each
        polys = polygonize_faces([sq(0, 0, 2, 2), sq(1, 0, 3, 2)])
        areas = sorted(
            round(sum(ring_area(r) for r in p), 9) for p in polys
        )
        assert areas == [2.0, 2.0, 2.0]
