"""Convex clipping + overlay join tests."""

import numpy as np

from gdal_spark.geo.clip import clip_convex, intersection_area
from gdal_spark.geo.geom import ring_area


def ring(pts):
    a = np.asarray(pts, dtype=float)
    return np.vstack([a, a[:1]])


UNIT = ring([[0, 0], [2, 0], [2, 2], [0, 2]])


def test_clip_identical():
    out = clip_convex(UNIT, UNIT)
    assert abs(abs(ring_area(out)) - 4.0) < 1e-12


def test_clip_offset_squares():
    b = ring([[1, 1], [3, 1], [3, 3], [1, 3]])
    assert abs(intersection_area(UNIT, b) - 1.0) < 1e-12


def test_clip_disjoint():
    b = ring([[5, 5], [6, 5], [6, 6], [5, 6]])
    assert intersection_area(UNIT, b) == 0.0


def test_clip_contained():
    inner = ring([[0.5, 0.5], [1.5, 0.5], [1.5, 1.5], [0.5, 1.5]])
    assert abs(intersection_area(UNIT, inner) - 1.0) < 1e-12
    assert abs(intersection_area(inner, UNIT) - 1.0) < 1e-12


def test_clip_triangle_square():
    tri = ring([[1, -1], [3, 1], [1, 3]])
    # intersection of the square with the right-pointing triangle
    area = intersection_area(UNIT, tri)
    brute = _grid_area(UNIT, tri)
    assert abs(area - brute) < 0.03


def _grid_area(a, b, n=400):
    from gdal_spark.geo.geom import points_in_polygon

    xs = np.linspace(-0.5, 3.5, n)
    ys = np.linspace(-0.5, 3.5, n)
    gx, gy = np.meshgrid(xs, ys)
    ina = points_in_polygon(gx.ravel(), gy.ravel(), [a])
    inb = points_in_polygon(gx.ravel(), gy.ravel(), [b])
    cell = (xs[1] - xs[0]) * (ys[1] - ys[0])
    return float((ina & inb).sum()) * cell


def test_overlay_join_small(spark):
    from pyspark.sql import functions as F

    from gdal_spark.fixtures.zones import build_zones, zone_rings
    from gdal_spark.operators.overlay import overlay_join

    za = build_zones(spark, n=20)
    zb = build_zones(spark, n=20)
    out = {
        (r["fid_a"], r["fid_b"]): r
        for r in overlay_join(za, zb).collect()
    }
    # identical fids are identical polygons: inter == union, a_only 0
    for fid in range(20):
        r = out[(fid, fid)]
        assert r["a_only_e4"] == 0
        assert r["inter_e4"] == r["union_e4"]
        area = abs(ring_area(zone_rings(fid)[0]))
        assert r["inter_e4"] == int(np.floor(area * 1e4))
    # every reported pair really intersects (brute-force check)
    for (fa, fb), r in out.items():
        ai = intersection_area(zone_rings(fa)[0], zone_rings(fb)[0])
        assert r["inter_e4"] == int(np.floor(ai * 1e4))


def test_clip_symmetry_and_bound():
    rng = np.random.default_rng(17)
    for _ in range(25):
        k1, k2 = rng.integers(3, 8, 2)
        c1 = rng.uniform(0, 4, 2)
        c2 = rng.uniform(0, 4, 2)
        r1, r2 = rng.uniform(0.5, 3, 2)
        a1 = np.sort(rng.uniform(0, 2 * np.pi, k1))
        a2 = np.sort(rng.uniform(0, 2 * np.pi, k2))
        A = ring(np.column_stack([c1[0] + r1 * np.cos(a1), c1[1] + r1 * np.sin(a1)]))
        B = ring(np.column_stack([c2[0] + r2 * np.cos(a2), c2[1] + r2 * np.sin(a2)]))
        ab = intersection_area(A, B)
        ba = intersection_area(B, A)
        assert abs(ab - ba) < 1e-9
        assert ab <= abs(ring_area(A)) + 1e-9
        assert ab <= abs(ring_area(B)) + 1e-9
