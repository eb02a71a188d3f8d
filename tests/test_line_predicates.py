"""Line-geometry DE-9IM predicates (geo/predicates.line_line_relate,
line_polygon_relate) + ST_Crosses registration. Reference:
ogrgeometry.cpp:5734 (Crosses), :5661 (Touches), :5989 (Overlaps)
delegating to GEOS relate."""

import numpy as np
import pytest

from gdal_spark.geo.predicates import line_line_relate, line_polygon_relate

L = np.array
SQ = [np.array([[0, 0], [4, 0], [4, 4], [0, 4], [0, 0]], dtype=float)]
HOLED = [
    np.array([[0, 0], [8, 0], [8, 8], [0, 8], [0, 0]], dtype=float),
    np.array([[3, 3], [3, 5], [5, 5], [5, 3], [3, 3]], dtype=float),
]


def flags(rel):
    return {k for k, v in rel.items() if v}


class TestLineLine:
    def test_proper_cross(self):
        r = line_line_relate(L([[0, 0], [4, 4]], float), L([[0, 4], [4, 0]], float))
        assert flags(r) == {"intersects", "crosses"}

    def test_interior_vertex_contact_crosses(self):
        # shared interior VERTEX of both lines: dim(IxI)=0 -> crosses
        a = L([[0, 0], [2, 2], [4, 0]], float)
        b = L([[0, 4], [2, 2], [4, 4]], float)
        r = line_line_relate(a, b)
        assert r["crosses"] and not r["touches"]

    def test_endpoint_on_interior_touches(self):
        # B's END on A's interior: II empty -> touches, never crosses
        r = line_line_relate(L([[0, 0], [4, 0]], float), L([[2, 0], [2, 3]], float))
        assert flags(r) == {"intersects", "touches"}

    def test_endpoint_endpoint_touch(self):
        r = line_line_relate(L([[0, 0], [2, 0]], float), L([[2, 0], [4, 2]], float))
        assert flags(r) == {"intersects", "touches"}

    def test_collinear_partial_overlap(self):
        r = line_line_relate(L([[0, 0], [4, 0]], float), L([[2, 0], [6, 0]], float))
        assert flags(r) == {"intersects", "overlaps"}

    def test_collinear_within(self):
        r = line_line_relate(L([[1, 0], [3, 0]], float), L([[0, 0], [4, 0]], float))
        assert r["within"] and not r["overlaps"] and not r["equals"]

    def test_equals(self):
        r = line_line_relate(L([[0, 0], [4, 0]], float), L([[4, 0], [0, 0]], float))
        assert r["equals"] and r["within"] and r["contains"]

    def test_disjoint(self):
        r = line_line_relate(L([[0, 0], [1, 0]], float), L([[5, 5], [6, 5]], float))
        assert flags(r) == {"disjoint"}

    def test_cross_plus_overlap_is_not_crosses(self):
        # II has a 1-D part -> dim(IxI)=1 -> overlaps, not crosses
        a = L([[0, 0], [4, 0], [4, 4]], float)
        b = L([[2, 0], [6, 0]], float)
        r = line_line_relate(a, b)
        assert r["overlaps"] and not r["crosses"]


class TestLinePolygon:
    def test_cross_through(self):
        r = line_polygon_relate(L([[-1, 2], [5, 2]], float), SQ)
        assert r["crosses"] and not r["within"] and not r["touches"]

    def test_within(self):
        r = line_polygon_relate(L([[1, 2], [3, 2]], float), SQ)
        assert r["within"] and not r["crosses"]

    def test_within_endpoints_on_boundary(self):
        r = line_polygon_relate(L([[0, 2], [4, 2]], float), SQ)
        assert r["within"] and not r["crosses"]

    def test_collinear_edge_touch(self):
        r = line_polygon_relate(L([[-1, 0], [5, 0]], float), SQ)
        assert r["touches"] and not r["crosses"]

    def test_corner_touch(self):
        r = line_polygon_relate(L([[-1, -1], [0, 0]], float), SQ)
        assert r["touches"]

    def test_disjoint(self):
        r = line_polygon_relate(L([[-3, -3], [-2, -3]], float), SQ)
        assert flags(r) == {"disjoint"}

    def test_chord_through_hole_crosses(self):
        # enters the hole (exterior) mid-way: inside + outside pieces
        r = line_polygon_relate(L([[1, 4], [7, 4]], float), HOLED)
        assert r["crosses"]

    def test_inside_annulus_within(self):
        r = line_polygon_relate(L([[1, 1], [7, 1]], float), HOLED)
        assert r["within"]

    def test_inside_hole_disjoint_interior(self):
        # entirely inside the hole: in the polygon's EXTERIOR
        r = line_polygon_relate(L([[3.5, 4], [4.5, 4]], float), HOLED)
        assert not r["intersects"] or r["touches"]
        assert not r["within"] and not r["crosses"]


class TestSTCrosses:
    @pytest.fixture(scope="class")
    def session(self, spark):
        from gdal_spark.geo.st_functions import register_st_functions

        register_st_functions(spark)
        return spark

    def test_sql_dispatch(self, session):
        row = session.sql(
            """SELECT
              ST_Crosses(ST_GeomFromText('LINESTRING(0 0,4 4)'),
                         ST_GeomFromText('LINESTRING(0 4,4 0)')) AS ll,
              ST_Crosses(ST_GeomFromText('LINESTRING(-1 2,5 2)'),
                         ST_GeomFromText('POLYGON((0 0,4 0,4 4,0 4,0 0))')) AS la,
              ST_Crosses(ST_GeomFromText('POLYGON((0 0,4 0,4 4,0 4,0 0))'),
                         ST_GeomFromText('LINESTRING(-1 2,5 2)')) AS al,
              ST_Crosses(ST_GeomFromText('POLYGON((0 0,4 0,4 4,0 4,0 0))'),
                         ST_GeomFromText('POLYGON((2 2,6 2,6 6,2 6,2 2))')) AS aa
            """
        ).collect()[0]
        assert row.ll is True
        assert row.la is True
        assert row.al is True
        assert row.aa is False
