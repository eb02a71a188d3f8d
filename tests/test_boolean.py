"""General boolean kernel (geo/boolean.py) + overlay verb tests."""

import numpy as np
import pytest

from gdal_spark.geo.boolean import (
    DegenerateGeometry,
    boolean_op,
    point_in_polyset,
    polyset_area,
    rings_to_polygons,
)


def rect(x0, y0, x1, y1):
    return np.array(
        [[x0, y0], [x1, y0], [x1, y1], [x0, y1], [x0, y0]], dtype=np.float64
    )


class TestKernel:
    def test_rect_ops(self):
        a = [rect(0, 0, 4, 4)]
        b = [rect(2.5, 2.5, 6.5, 6.5)]
        assert polyset_area(boolean_op(a, b, "inter")) == 2.25
        assert polyset_area(boolean_op(a, b, "union")) == 29.75
        assert polyset_area(boolean_op(a, b, "diff")) == 13.75

    def test_disjoint_and_contained(self):
        a = [rect(0, 0, 4, 4)]
        far = [rect(10.5, 0.5, 12.5, 2.5)]
        assert boolean_op(a, far, "inter") == []
        assert polyset_area(boolean_op(a, far, "union")) == 20.0
        inner = [rect(1.5, 1.5, 2.5, 2.5)]
        assert polyset_area(boolean_op(a, inner, "inter")) == 1.0
        # punching a hole: diff result is one polygon with one hole
        d = boolean_op(a, inner, "diff")
        assert polyset_area(d) == 15.0
        polys = rings_to_polygons(d)
        assert len(polys) == 1 and len(polys[0]) == 2

    def test_hole_interaction(self):
        a = [rect(0, 0, 8, 8), rect(2, 2, 5, 5)]  # 64 - 9 = 55
        b = [rect(3.5, 3.5, 10.5, 10.5)]
        assert polyset_area(boolean_op(a, b, "inter")) == 18.0
        assert polyset_area(boolean_op(a, b, "diff")) == 37.0
        assert polyset_area(boolean_op(a, b, "union")) == 86.0

    def test_nonconvex_L(self):
        L = np.array(
            [[0, 0], [6, 0], [6, 2], [2, 2], [2, 6], [0, 6], [0, 0]], float
        )
        b = [rect(1.5, 1.5, 3.5, 3.5)]
        assert polyset_area(boolean_op([L], b, "inter")) == 1.75
        assert polyset_area(boolean_op([L], b, "diff")) == 18.25

    def test_split_into_two_pieces(self):
        # U-shape intersected with a bar crossing both prongs
        u = np.array(
            [[0, 0], [6, 0], [6, 6], [4, 6], [4, 2], [2, 2], [2, 6], [0, 6],
             [0, 0]],
            float,
        )
        bar = [rect(0.5, 3.5, 5.5, 4.5)]
        out = boolean_op([u], bar, "inter")
        polys = rings_to_polygons(out)
        assert len(polys) == 2
        assert polyset_area(out) == 1.5 * 1 + 1.5 * 1

    def test_degenerate_handled(self):
        # the arrangement backend accepts coincident boundaries (the
        # old GH kernel raised DegenerateGeometry on these)
        a = [rect(0, 0, 4, 4)]
        shared_edge = [rect(4, 0, 8, 4)]
        assert polyset_area(boolean_op(a, shared_edge, "inter")) == 0.0
        assert polyset_area(boolean_op(a, shared_edge, "union")) == 32.0
        identical = [rect(0, 0, 4, 4)]
        assert polyset_area(boolean_op(a, identical, "inter")) == 16.0
        assert polyset_area(boolean_op(a, identical, "diff")) == 0.0
        # vertex-on-edge T-junction
        t = [rect(1, 4, 3, 6)]
        assert polyset_area(boolean_op(a, t, "union")) == 20.0
        assert polyset_area(boolean_op(a, t, "inter")) == 0.0

    def test_membership_property_random(self):
        rng = np.random.default_rng(11)

        def star(n, scale, off):
            # evenly spaced angles + sub-spacing jitter: max angular
            # gap < 2*(2pi/n) < pi, so the ring is always SIMPLE
            # (the kernel's contract; sorted fully-random angles can
            # leave a >pi gap whose chord crosses other wedges)
            ang = (np.arange(n) + rng.uniform(0.05, 0.95, n)) * 2 * np.pi / n
            r = scale * rng.uniform(0.4, 1.0, n)
            p = np.c_[off[0] + r * np.cos(ang), off[1] + r * np.sin(ang)]
            return [np.vstack([p, p[:1]])]

        for _ in range(25):
            a = star(8, 3.0, (0.0, 0.0))
            b = star(7, 2.5, rng.uniform(-2, 2, 2))
            try:
                i = boolean_op(a, b, "inter")
                u = boolean_op(a, b, "union")
                d = boolean_op(a, b, "diff")
            except DegenerateGeometry:
                continue
            aa, ab = polyset_area(a), polyset_area(b)
            # the kernel snaps vertices to the 2^-20 grid: area moves
            # by up to ~perimeter * 5e-7 for non-dyadic input
            assert abs(polyset_area(i) + polyset_area(u) - aa - ab) < 1e-4
            assert abs(polyset_area(d) - (aa - polyset_area(i))) < 1e-4
            for _ in range(20):
                x, y = rng.uniform(-4, 4, 2)
                ia = point_in_polyset(x, y, a)
                ib = point_in_polyset(x, y, b)
                assert point_in_polyset(x, y, i) == (ia and ib)
                assert point_in_polyset(x, y, u) == (ia or ib)
                assert point_in_polyset(x, y, d) == (ia and not ib)


class TestOverlayVerbs:
    @pytest.fixture(scope="class")
    def layers(self, spark):
        from gdal_spark.fixtures.blobs import build_blobs

        return build_blobs(spark, "a", n=30), build_blobs(spark, "b", n=30)

    def test_intersection_pieces_match_fixture_math(self, layers):
        from gdal_spark.fixtures.blobs import blob_rings
        from gdal_spark.operators.overlay import overlay_features

        a, b = layers
        got = {
            (r["fid_a"], r["fid_b"]): r["area_q4"]
            for r in overlay_features(a, b, "intersection").collect()
        }
        assert len(got) > 5
        # brute-force kernel check per emitted pair
        for (fa, fb), q4 in got.items():
            inter = boolean_op(blob_rings(fa, "a"), blob_rings(fb, "b"), "inter")
            assert int(round(polyset_area(inter) * 4)) == q4

    def test_union_partitions_total_area(self, layers):
        from gdal_spark.fixtures.blobs import blob_rings
        from gdal_spark.operators.overlay import overlay_features

        a, b = layers
        total = sum(
            r["area_q4"] for r in overlay_features(a, b, "union").collect()
        )
        # disjoint within layers: |A u B| = sum|A| + sum|B| - sum|AnB|
        area = lambda rings: polyset_area(rings)
        expect = 0.0
        for f in range(30):
            expect += area(blob_rings(f, "a")) + area(blob_rings(f, "b"))
        for fa in range(30):
            for fb in range(30):
                expect -= area(
                    boolean_op(blob_rings(fa, "a"), blob_rings(fb, "b"), "inter")
                )
        assert total == int(round(expect * 4))

    def test_update_passes_method_through(self, layers):
        from gdal_spark.operators.overlay import overlay_features

        a, b = layers
        rows = overlay_features(a, b, "update").collect()
        b_rows = [r for r in rows if r["fid_b"] is not None]
        assert len(b_rows) == 30  # every method feature, unchanged

    def test_emitted_wkb_parses(self, layers):
        from gdal_spark.geo.wkb import parse_wkb
        from gdal_spark.operators.overlay import overlay_features

        a, b = layers
        for r in overlay_features(a, b, "intersection").limit(20).collect():
            g = parse_wkb(bytes(r["geom"]))
            assert g.type_name in ("MultiPolygon", "Polygon")
            assert len(g.all_rings()) == r["n_polys"]


class TestPredicates:
    def r(self, x0, y0, x1, y1):
        return rect(x0, y0, x1, y1)

    def test_relate_basic(self):
        from gdal_spark.geo.predicates import polygon_relate

        a = [self.r(0, 0, 4, 4)]
        assert polygon_relate(a, [self.r(2, 2, 6, 6)])["overlaps"]
        assert polygon_relate(a, [self.r(10, 0, 12, 2)])["disjoint"]
        rel = polygon_relate(a, [self.r(1, 1, 2, 2)])
        assert rel["contains"] and rel["intersects"] and not rel["overlaps"]
        rel = polygon_relate([self.r(1, 1, 2, 2)], a)
        assert rel["within"]
        rel = polygon_relate(a, [self.r(0, 0, 4, 4)])
        assert rel["equals"] and rel["within"] and rel["contains"]

    def test_touches_shared_edge_and_corner(self):
        from gdal_spark.geo.predicates import polygon_relate

        a = [self.r(0, 0, 4, 4)]
        edge = polygon_relate(a, [self.r(4, 0, 8, 4)])
        assert edge["touches"] and edge["intersects"] and not edge["overlaps"]
        corner = polygon_relate(a, [self.r(4, 4, 8, 8)])
        assert corner["touches"] and not corner["disjoint"]

    def test_within_with_boundary_contact(self):
        from gdal_spark.geo.predicates import polygon_relate

        # inner rect sharing part of the outer's left edge: still within
        rel = polygon_relate([self.r(0, 1, 2, 3)], [self.r(0, 0, 4, 4)])
        assert rel["within"] and not rel["touches"]

    def test_hole_makes_disjoint_vs_touches(self):
        from gdal_spark.geo.predicates import polygon_relate

        donut = [self.r(0, 0, 8, 8), self.r(2, 2, 6, 6)]
        island = [self.r(3, 3, 5, 5)]     # strictly inside the hole
        rel = polygon_relate(donut, island)
        assert rel["disjoint"]
        filler = [self.r(2, 2, 6, 6)]     # exactly fills the hole
        rel = polygon_relate(donut, filler)
        assert rel["touches"] and not rel["overlaps"]

    def test_distances(self):
        import math

        from gdal_spark.geo.predicates import (
            point_polygon_distance2,
            polygon_distance2,
        )

        a = [self.r(0, 0, 4, 4)]
        assert polygon_distance2(a, [self.r(7, 0, 9, 4)]) == 9.0
        assert polygon_distance2(a, [self.r(7, 7, 9, 9)]) == 18.0
        assert polygon_distance2(a, [self.r(2, 2, 9, 9)]) == 0.0
        assert point_polygon_distance2(2, 2, a) == 0.0
        assert point_polygon_distance2(4, 2, a) == 0.0   # on boundary
        assert point_polygon_distance2(7, 6, a) == 13.0  # corner (4,4)
        donut = [self.r(0, 0, 8, 8), self.r(2, 2, 6, 6)]
        assert point_polygon_distance2(4, 4, donut) == 4.0  # inside hole
        assert math.isclose(polygon_distance2(donut, [self.r(3.5, 3.5, 4.5, 4.5)]), 2.25)
