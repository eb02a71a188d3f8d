"""Curve geometry (WKB 8-12) linearization tests."""

import math

import numpy as np

from gdal_spark.geo import curves
from gdal_spark.geo.geom import ring_area
from gdal_spark.geo.wkb import parse_wkb, wkb_linestring


def arc_points(cx, cy, R, angs):
    return np.array(
        [[cx + R * math.cos(math.radians(a)), cy + R * math.sin(math.radians(a))]
         for a in angs]
    )


def test_quarter_arcs_step_count():
    # 90-deg half-arcs: nSteps = int(90/4 + 0.5) = 23 -> 22 interior
    pts = curves.circular_to_points(arc_points(0, 0, 1, (0, 90, 180)))
    assert len(pts) == 23 + 23 + 1
    assert np.allclose(np.hypot(pts[:, 0], pts[:, 1]), 1.0)
    d = np.diff(pts, axis=0)
    assert abs(np.sqrt(d[:, 0] ** 2 + d[:, 1] ** 2).sum() - math.pi) < 1e-3


def test_min_four_steps_for_tiny_arcs():
    # 6-deg half-arcs: int(6/4+0.5)=2 -> clamped to 4 steps each
    pts = curves.circular_to_points(arc_points(5, 5, 10, (10, 16, 22)))
    assert len(pts) == 4 + 4 + 1


def test_collinear_passthrough():
    line = curves.circular_to_points(np.array([[0, 0], [2, 1], [4, 2.0]]))
    assert line.tolist() == [[0, 0], [2, 1], [4, 2]]


def test_clockwise_arc():
    pts = curves.circular_to_points(arc_points(0, 0, 2, (90, 45, 0)))
    assert np.allclose(np.hypot(pts[:, 0], pts[:, 1]), 2.0)
    assert np.allclose(pts[0], [0, 2]) and np.allclose(pts[-1], [2, 0])


def test_curvepolygon_to_polygon_area():
    circ = arc_points(3, 4, 2, (0, 90, 180, 270, 360))
    cp = curves.wkb_curvepolygon([curves.wkb_circularstring(circ)])
    g = parse_wkb(curves.linearize_wkb(cp))
    assert g.type_name == "Polygon"
    area = abs(ring_area(g.all_rings()[0][0]))
    assert abs(area - math.pi * 4) < 0.01


def test_compoundcurve_joins_components():
    cc = curves.wkb_compoundcurve(
        [
            wkb_linestring(np.array([[0, 0], [1, 0]], float)),
            curves.wkb_circularstring(np.array([[1, 0], [2, 1], [3, 0]], float)),
        ]
    )
    g = parse_wkb(curves.linearize_wkb(cc))
    assert g.type_name == "LineString"
    pts = g.parts[0]
    assert np.allclose(pts[0], [0, 0]) and np.allclose(pts[-1], [3, 0])
    # joint point not duplicated
    assert (np.abs(np.diff(pts, axis=0)).sum(axis=1) > 0).all()


def test_linear_wkb_passthrough():
    w = wkb_linestring(np.array([[0, 0], [5, 5.0]]))
    assert curves.linearize_wkb(w) == w
