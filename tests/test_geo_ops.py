"""Geometry ops, WKT io, ST_* function registration tests."""

import numpy as np

from gdal_spark.geo import ops
from gdal_spark.geo.wkb import parse_wkb, wkb_polygon, geometry_to_wkb
from gdal_spark.geo.wkt import from_wkt, to_wkt

SQUARE = np.array([[0.0, 0.0], [4.0, 0.0], [4.0, 4.0], [0.0, 4.0], [0.0, 0.0]])


def test_wkt_roundtrip_polygon():
    wkb = wkb_polygon([SQUARE])
    txt = to_wkt(parse_wkb(wkb))
    assert txt == "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))"
    back = geometry_to_wkb(from_wkt(txt))
    g = parse_wkb(back)
    assert np.allclose(g.parts[0], SQUARE)


def test_wkt_point_and_linestring():
    assert to_wkt(from_wkt("POINT (1.5 -2)")) == "POINT (1.5 -2)"
    ls = from_wkt("LINESTRING (0 0, 1 1, 2 0)")
    assert ops.line_length(ls.parts[0]) == 2 * np.sqrt(2.0)


def test_segmentize_preserves_vertices_and_bounds():
    line = np.array([[0.0, 0.0], [10.0, 0.0]])
    out = ops.segmentize(line, 3.0)
    # 10/3 -> 4 segments of 2.5
    assert len(out) == 5
    assert np.allclose(np.diff(out[:, 0]), 2.5)
    sq = ops.segmentize(SQUARE, 1.0)
    assert len(sq) == 17
    # original corners survive
    for v in SQUARE:
        assert (np.abs(sq - v).sum(axis=1) < 1e-12).any()


def test_douglas_peucker():
    line = np.array([[0.0, 0.0], [1.0, 0.05], [2.0, 0.0], [3.0, 2.0], [4.0, 0.0]])
    out = ops.douglas_peucker(line, 0.1)
    # the 0.05 bump collapses, the 2.0 spike stays
    assert [list(p) for p in out] == [[0, 0], [2, 0], [3, 2], [4, 0]]


def test_convex_hull():
    pts = np.array([[0, 0], [2, 0], [2, 2], [0, 2], [1, 1], [0.5, 0.5]], dtype=float)
    hull = ops.convex_hull(pts)
    assert len(hull) == 5  # 4 corners + closure
    assert abs(ops.line_length(hull) - 8.0) < 1e-12


def test_buffer_convex_area():
    hull = ops.buffer_convex(SQUARE, 1.0, quad_segs=16)
    from gdal_spark.geo.geom import polygon_area

    area = polygon_area([hull])
    # square(16) + 4 edges*4*1 + pi*1^2, slightly under pi due to arcs
    assert 16 + 16 + 3.10 < area <= 16 + 16 + np.pi + 1e-9


def test_is_valid_ring():
    assert ops.is_valid_ring(SQUARE)
    bowtie = np.array([[0, 0], [2, 2], [2, 0], [0, 2], [0, 0]], dtype=float)
    assert not ops.is_valid_ring(bowtie)


def test_point_on_surface_inside():
    from gdal_spark.geo.geom import points_in_polygon

    ring = SQUARE
    hole = np.array([[1.0, 1.0], [1.0, 3.0], [3.0, 3.0], [3.0, 1.0], [1.0, 1.0]])
    x, y = ops.point_on_surface([ring, hole])
    assert points_in_polygon([x], [y], [ring, hole])[0]


def test_st_functions_sql(spark):
    from pyspark.sql import functions as F

    from gdal_spark.geo.st_functions import register_st_functions

    register_st_functions(spark)
    df = spark.createDataFrame([(1, bytearray(wkb_polygon([SQUARE])))], ["id", "geometry"])
    df.createOrReplaceTempView("g")
    row = spark.sql(
        """
        SELECT ST_Area(geometry) a, ST_Length(geometry) l,
               ST_AsText(ST_Centroid(geometry)) c,
               ST_IsValid(geometry) v,
               ST_Contains_Point(geometry, 2.0, 2.0) inside,
               ST_Contains_Point(geometry, 9.0, 2.0) outside,
               ST_AsText(ST_Simplify(ST_Segmentize(geometry, 1.0), 0.5)) s
        FROM g
        """
    ).collect()[0]
    assert row["a"] == 16.0
    assert row["l"] == 16.0
    assert row["c"] == "POINT (2 2)"
    assert row["v"] is True
    assert row["inside"] is True and row["outside"] is False
    # segmentize adds vertices, simplify removes the collinear ones
    assert row["s"] == "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))"


def test_geodesic_area_sanity():
    # 1x1 degree "square" at the equator ~ 111.19 km x 111.32 km
    sq = np.array([[0, 0], [1, 0], [1, 1], [0, 1], [0, 0]], dtype=float)
    area = ops.geodesic_ring_area(sq)
    assert 1.22e10 < area < 1.25e10  # ~1.237e10 m^2
    # perimeter ~ 4 * 111 km
    length = ops.geodesic_line_length(sq)
    assert 4.40e5 < length < 4.47e5


def test_geodesic_area_shrinks_at_high_latitude():
    lo = ops.geodesic_ring_area(
        np.array([[0, 0], [1, 0], [1, 1], [0, 1], [0, 0]], dtype=float)
    )
    hi = ops.geodesic_ring_area(
        np.array([[0, 70], [1, 70], [1, 71], [0, 71], [0, 70]], dtype=float)
    )
    assert hi < 0.45 * lo


def test_st_overlay_functions_in_sql(spark):
    import numpy as np

    from gdal_spark.geo.st_functions import register_st_functions
    from gdal_spark.geo.wkb import wkb_polygon

    register_st_functions(spark)

    def rect(x0, y0, x1, y1):
        return wkb_polygon(
            [np.array([[x0, y0], [x1, y0], [x1, y1], [x0, y1], [x0, y0]], float)]
        )

    df = spark.createDataFrame(
        [(rect(0, 0, 4, 4), rect(2.5, 2.5, 6.5, 6.5))], ["ga", "gb"]
    )
    df.createOrReplaceTempView("gpair")
    row = spark.sql(
        """SELECT ST_Area(ST_Intersection(ga, gb)) AS i,
                  ST_Area(ST_Union(ga, gb)) AS u,
                  ST_Area(ST_Difference(ga, gb)) AS d,
                  ST_Area(ST_SymDifference(ga, gb)) AS s,
                  ST_Distance(ga, gb) AS dist,
                  ST_Intersects(ga, gb) AS x,
                  ST_Touches(ga, gb) AS t
           FROM gpair"""
    ).collect()[0]
    assert row["i"] == 2.25 and row["u"] == 29.75
    assert row["d"] == 13.75 and row["s"] == 27.5
    assert row["dist"] == 0.0 and row["x"] and not row["t"]


def test_st_io_and_constructive_extras(spark):
    import numpy as np

    from gdal_spark.geo.st_functions import register_st_functions
    from gdal_spark.geo.wkb import wkb_polygon

    register_st_functions(spark)

    def rect(x0, y0, x1, y1):
        return wkb_polygon(
            [np.array([[x0, y0], [x1, y0], [x1, y1], [x0, y1], [x0, y0]], float)]
        )

    df = spark.createDataFrame([(rect(0, 0, 4, 4),)], ["g"])
    df.createOrReplaceTempView("gone")
    row = spark.sql(
        """SELECT ST_AsGeoJSON(g) AS gj,
                  ST_Area(ST_GeomFromGeoJSON(ST_AsGeoJSON(g))) AS a,
                  ST_Area(ST_DelaunayTriangles(g)) AS da,
                  ST_Area(ST_UnaryUnion(g)) AS ua
           FROM gone"""
    ).collect()[0]
    import json

    gj = json.loads(row["gj"])
    assert gj["type"] == "Polygon" and len(gj["coordinates"][0]) == 5
    assert row["a"] == 16.0      # GeoJSON roundtrip preserves area
    assert row["da"] == 16.0     # triangles partition the square
    assert row["ua"] == 16.0


def test_st_simple_ring_rectangle(spark):
    import numpy as np

    from gdal_spark.geo.st_functions import register_st_functions
    from gdal_spark.geo.wkb import wkb_linestring, wkb_polygon

    register_st_functions(spark)
    rect = wkb_polygon(
        [np.array([[0, 0], [4, 0], [4, 4], [0, 4], [0, 0]], float)]
    )
    bow = wkb_polygon(
        [np.array([[0, 0], [4, 2], [4, 0], [0, 2], [0, 0]], float)]
    )
    ring_ls = wkb_linestring(
        np.array([[0, 0], [2, 0], [2, 2], [0, 0]], float)
    )
    open_ls = wkb_linestring(np.array([[0, 0], [2, 0], [2, 2]], float))
    tri = wkb_polygon([np.array([[0, 0], [4, 0], [2, 3], [0, 0]], float)])
    df = spark.createDataFrame(
        [(rect, bow, ring_ls, open_ls, tri)], ["r", "b", "rl", "ol", "t"]
    )
    df.createOrReplaceTempView("gsrr")
    row = spark.sql(
        """SELECT ST_IsSimple(r) AS rs, ST_IsSimple(b) AS bs,
                  ST_IsRing(rl) AS rr, ST_IsRing(ol) AS orr,
                  ST_IsRectangle(r) AS rrect, ST_IsRectangle(t) AS trect
           FROM gsrr"""
    ).collect()[0]
    assert row["rs"] and not row["bs"]
    assert row["rr"] and not row["orr"]
    assert row["rrect"] and not row["trect"]


def test_st_kml_gml_export(spark):
    import numpy as np

    from gdal_spark.geo.st_functions import register_st_functions
    from gdal_spark.geo.wkb import wkb_point, wkb_polygon

    register_st_functions(spark)
    rect = wkb_polygon(
        [
            np.array([[0, 0], [4, 0], [4, 4], [0, 4], [0, 0]], float),
            np.array([[1, 1], [1, 2], [2, 2], [2, 1], [1, 1]], float),
        ]
    )
    df = spark.createDataFrame([(rect, wkb_point(2.5, -3.25))], ["poly", "pt"])
    df.createOrReplaceTempView("gk")
    row = spark.sql(
        "SELECT ST_AsKML(poly) AS k, ST_AsGML(poly) AS g, ST_AsKML(pt) AS kp FROM gk"
    ).collect()[0]
    assert row["k"].startswith("<Polygon><outerBoundaryIs>")
    assert "<innerBoundaryIs>" in row["k"] and "1,1 1,2 2,2 2,1 1,1" in row["k"]
    assert row["g"].startswith("<gml:Polygon>") and "gml:coordinates" in row["g"]
    assert row["kp"] == "<Point><coordinates>2.5,-3.25</coordinates></Point>"


def test_st_transform_sql(spark):
    # ST_Transform (ogrsqlitesqlfunctions.cpp:705): every vertex of
    # every geometry type reprojects through the projzoo registry,
    # with int codes OR user-input strings for the CRS arguments
    from gdal_spark.geo import projzoo as pz
    from gdal_spark.geo.st_functions import register_st_functions
    from gdal_spark.geo.wkb import parse_wkb, wkb_point, wkb_polygon

    register_st_functions(spark)
    poly = wkb_polygon(
        [np.array([[5.0, 50.0], [6.0, 50.0], [6.0, 51.0], [5.0, 50.0]])]
    )
    df = spark.createDataFrame(
        [(1, wkb_point(5.0, 50.0)), (2, poly), (3, None)], ["i", "g"]
    )
    df.createOrReplaceTempView("stt")
    rows = {
        r["i"]: r
        for r in spark.sql(
            "SELECT i, ST_Transform(g, 4326, 3035) AS t, "
            "ST_Transform(g, 'EPSG:4326', 'EPSG:3035') AS ts FROM stt"
        ).collect()
    }
    ex, ey = pz.reproject(5.0, 50.0, 4326, 3035)
    g1 = parse_wkb(bytes(rows[1]["t"]))
    assert abs(g1.parts[0][0, 0] - float(ex)) < 1e-6
    assert abs(g1.parts[0][0, 1] - float(ey)) < 1e-6
    # string CRS args give the identical bytes
    assert bytes(rows[1]["t"]) == bytes(rows[1]["ts"])
    g2 = parse_wkb(bytes(rows[2]["t"]))
    assert len(g2.parts) == 1 and g2.parts[0].shape == (4, 2)
    assert abs(g2.parts[0][0, 0] - float(ex)) < 1e-6
    assert rows[3]["t"] is None
