"""Geometry kernel tests: WKB roundtrip, PIP ladder, areas."""

import numpy as np

from gdal_spark.fixtures.zones import zone_rings
from gdal_spark.geo.geom import (
    PreparedPolygon,
    points_in_polygon,
    polygon_area,
    polygon_centroid,
    segments_intersect,
)
from gdal_spark.geo.wkb import parse_wkb, wkb_point, wkb_polygon


def unit_square(offset=0.0):
    return np.array(
        [[0, 0], [1, 0], [1, 1], [0, 1], [0, 0]], dtype=float
    ) + offset


def test_wkb_roundtrip_polygon():
    rings = [unit_square(), unit_square() * 0.25 + 0.3]
    data = wkb_polygon(rings)
    g = parse_wkb(data)
    assert g.type_name == "Polygon"
    assert len(g.parts) == 2
    assert np.allclose(g.parts[0], rings[0])


def test_wkb_point():
    g = parse_wkb(wkb_point(3.5, -7.25))
    assert g.type_name == "Point"
    assert g.parts[0].tolist() == [[3.5, -7.25]]


def test_pip_square_with_hole():
    outer = unit_square()
    hole = np.array(
        [[0.4, 0.4], [0.6, 0.4], [0.6, 0.6], [0.4, 0.6], [0.4, 0.4]]
    )
    px = np.array([0.5, 0.1, 1.5, 0.45, 0.99])
    py = np.array([0.5, 0.1, 0.5, 0.45, 0.99])
    got = points_in_polygon(px, py, [outer, hole])
    #     hole   in    out   hole   in
    assert got.tolist() == [False, True, False, False, True]


def test_prepared_polygon_ladder():
    prep = PreparedPolygon([unit_square()])
    px = np.array([-5.0, 0.5, 2.0])
    py = np.array([0.5, 0.5, 2.0])
    assert prep.contains_points(px, py).tolist() == [False, True, False]
    # bbox fully containing the polygon -> envelope fast-accept
    assert prep.intersects_bbox(-1, -1, 2, 2)
    # bbox crossing an edge but with no corner inside
    assert prep.intersects_bbox(0.25, -0.5, 0.75, 1.5)
    # disjoint bbox
    assert not prep.intersects_bbox(2.0, 2.0, 3.0, 3.0)


def test_area_and_centroid():
    rings = [unit_square(), np.array(
        [[0.25, 0.25], [0.75, 0.25], [0.75, 0.75], [0.25, 0.75], [0.25, 0.25]]
    )]
    assert polygon_area(rings) == 1.0 - 0.25
    cx, cy = polygon_centroid([unit_square()])
    assert (round(cx, 9), round(cy, 9)) == (0.5, 0.5)


def test_segments():
    assert segments_intersect((0, 0), (1, 1), (0, 1), (1, 0))
    assert not segments_intersect((0, 0), (1, 0), (0, 1), (1, 1))
    assert segments_intersect((0, 0), (1, 0), (0.5, 0), (2, 0))  # collinear overlap


def test_zone_rings_match_sql_halfplane_semantics():
    """Engine ray-cast on zone WKB == convex half-plane test (the
    DuckDB oracle's formulation) for random probe points."""
    rng = np.random.default_rng(4)
    for fid in [0, 1, 5, 10, 23]:
        rings = zone_rings(fid)
        outer = rings[0]
        cx, cy = outer[:-1, 0].mean(), outer[:-1, 1].mean()
        px = rng.uniform(cx - 3, cx + 3, 500)
        py = rng.uniform(cy - 3, cy + 3, 500)
        got = points_in_polygon(px, py, rings)

        def halfplane_inside(ring, x, y):
            v1 = ring[:-1]
            v2 = ring[1:]
            cross = (v2[:, 0] - v1[:, 0])[:, None] * (y[None] - v1[:, 1][:, None]) - (
                v2[:, 1] - v1[:, 1]
            )[:, None] * (x[None] - v1[:, 0][:, None])
            return (cross >= 0).all(axis=0)

        exp = halfplane_inside(outer, px, py)
        if len(rings) > 1:
            # hole ring is stored CW; reverse for the CCW half-plane test
            exp &= ~halfplane_inside(rings[1][::-1], px, py)
        assert (got == exp).all(), fid
