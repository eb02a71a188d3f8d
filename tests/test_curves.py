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


# ---------------------------------------------------------------------------
# linear -> curve write-back (ogrgeometry.cpp:3535 getCurveGeometry)
# ---------------------------------------------------------------------------

def test_fit_back_recovers_circle_exactly():
    import math

    import numpy as np

    from gdal_spark.geo import curves

    for fid in range(1, 40):
        cx, cy = (fid * 7) % 100, (fid * 11) % 100
        R = 5 + fid % 7
        a0 = (fid * 13) % 360
        s1 = 21 + 2 * (fid % 8)
        s2 = 33 + 2 * ((fid * 3) % 9)
        pts = np.array(
            [
                [cx + R * math.cos(math.radians(a)),
                 cy + R * math.sin(math.radians(a))]
                for a in (a0, a0 + s1, a0 + s1 + s2)
            ]
        )
        line = curves.circular_to_points(pts)
        segs = curves.line_to_curve_segments(line)
        arcs = [s for s in segs if s[0] == "arc"]
        assert len(arcs) == 1 and len(segs) == 1
        fcx, fcy, fR, sweep = arcs[0][2]
        assert abs(fcx - cx) < 1e-8 and abs(fcy - cy) < 1e-8
        assert abs(fR - R) < 1e-8
        assert abs(abs(math.degrees(sweep)) - (s1 + s2)) < 1e-6


def test_fit_back_mixed_compound():
    import numpy as np

    from gdal_spark.geo import curves
    from gdal_spark.geo.wkb import parse_wkb

    # straight lead-in + stroked quarter circle + straight tail
    arc = curves.circular_to_points(
        np.array([[10.0, 0.0], [0.0, 10.0], [-10.0, 0.0]])
    )
    line = np.vstack([[[30.0, 0.0], [20.0, 0.0]], arc, [[-20.0, 0.0]]])
    segs = curves.line_to_curve_segments(line)
    kinds = [s[0] for s in segs]
    assert kinds == ["line", "arc", "line"]
    wkb = curves.line_wkb_to_curve_wkb(
        __import__("gdal_spark.geo.wkb", fromlist=["wkb_linestring"])
        .wkb_linestring(line)
    )
    g = parse_wkb(curves.linearize_wkb(wkb))
    assert g.type_id == 2  # LineString
    # linearized compound keeps the exact straight vertices
    assert tuple(g.parts[0][0]) == (30.0, 0.0)
    assert tuple(g.parts[0][-1]) == (-20.0, 0.0)


def test_fit_back_straight_line_stays_line():
    import numpy as np

    from gdal_spark.geo import curves
    from gdal_spark.geo.wkb import wkb_linestring

    line = np.array([[0.0, 0.0], [1.0, 0.0], [2.0, 0.0], [3.0, 1.0]])
    buf = wkb_linestring(line)
    assert curves.line_wkb_to_curve_wkb(buf) == buf


def test_fit_back_relinearize_same_circle():
    import math

    import numpy as np

    from gdal_spark.geo import curves
    from gdal_spark.geo.wkb import parse_wkb

    pts = np.array(
        [
            [5.0 + 7.0 * math.cos(math.radians(a)),
             3.0 + 7.0 * math.sin(math.radians(a))]
            for a in (10, 40, 75)
        ]
    )
    line1 = curves.circular_to_points(pts)
    wkb2 = curves.line_wkb_to_curve_wkb(
        __import__("gdal_spark.geo.wkb", fromlist=["wkb_linestring"])
        .wkb_linestring(line1)
    )
    line2 = parse_wkb(curves.linearize_wkb(wkb2)).parts[0]
    # every re-linearized vertex lies on the original circle
    d = np.hypot(line2[:, 0] - 5.0, line2[:, 1] - 3.0)
    assert np.max(np.abs(d - 7.0)) < 1e-8
    # endpoints preserved exactly
    assert tuple(line2[0]) == tuple(line1[0])
    assert tuple(line2[-1]) == tuple(line1[-1])
