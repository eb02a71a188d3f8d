"""MakeValid (geo/makevalid.py) tests."""

import math

import numpy as np

from gdal_spark.geo.geom import points_in_polygon, points_in_ring, ring_area
from gdal_spark.geo.makevalid import make_valid_rings


def areas(polys):
    return sorted(
        round(
            sum([abs(ring_area(p[0]))] + [-abs(ring_area(h)) for h in p[1:]]), 9
        )
        for p in polys
    )


def test_bowtie_splits_into_triangles():
    bow = np.array([[0, 0], [4, 2], [4, 0], [0, 2], [0, 0]], float)
    assert areas(make_valid_rings([bow])) == [2.0, 2.0]


def test_valid_input_passthrough():
    sq = np.array([[0, 0], [4, 0], [4, 4], [0, 4], [0, 0]], float)
    assert areas(make_valid_rings([sq])) == [16.0]


def test_donut_nesting_preserved():
    donut = [
        np.array([[0, 0], [8, 0], [8, 8], [0, 8], [0, 0]], float),
        np.array([[2, 2], [2, 5], [5, 5], [5, 2], [2, 2]], float),
    ]
    polys = make_valid_rings(donut)
    assert len(polys) == 1 and len(polys[0]) == 2
    assert areas(polys) == [55.0]


def test_pentagram_interleaved_crossings():
    """The canonical face-traversal case: 5 interleaved crossings ->
    5 point triangles; the winding-2 center pentagon is excluded
    (even-odd), and membership matches the raw ring's parity."""
    ang = [math.radians(90 + 144 * k) for k in range(5)]
    star = np.array(
        [[math.cos(a), math.sin(a)] for a in ang]
        + [[math.cos(ang[0]), math.sin(ang[0])]]
    )
    polys = make_valid_rings([star])
    assert len(polys) == 5
    out_rings = [r for p in polys for r in p]
    rng = np.random.default_rng(1)
    for _ in range(500):
        x, y = rng.uniform(-1, 1, 2)
        assert bool(points_in_ring(np.array([x]), np.array([y]), star)[0]) == bool(
            points_in_polygon([x], [y], out_rings)[0]
        )


def test_bowtie_with_hole_in_lobe():
    bow = np.array([[0, 0], [4, 2], [4, 0], [0, 2], [0, 0]], float)
    hole = np.array(
        [[0.5, 0.6], [0.5, 1.2], [1.2, 1.2], [1.2, 0.6], [0.5, 0.6]], float
    )
    polys = make_valid_rings([bow, hole])
    assert len(polys) == 2
    assert areas(polys) == [2.0 - 0.42, 2.0]
