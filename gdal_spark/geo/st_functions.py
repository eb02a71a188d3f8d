"""ST_* scalar geometry functions registered into Spark SQL.

Mirrors the reference's SQLite-dialect function registry
(ogr/ogrsf_frmts/sqlite/ogrsqlitesqlfunctions.cpp:627-933): the same
names work in `spark.sql(...)` once `register_st_functions(spark)`
runs. All are Arrow-batched pandas UDFs over WKB binary columns
(never per-row Python UDFs); geometry semantics come from the
pure-numpy kernels in geo/geom.py and geo/ops.py.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from gdal_spark.geo import ops
from gdal_spark.geo.geom import points_in_polygon, polygon_area, polygon_centroid
from gdal_spark.geo.wkb import (
    WKB_LINESTRING,
    WKB_MULTIPOLYGON,
    WKB_POINT,
    WKB_POLYGON,
    Geometry,
    geometry_to_wkb,
    parse_wkb,
    wkb_point,
    wkb_polygon,
)
from gdal_spark.geo.wkt import from_wkt, to_wkt


def _rings(g: Geometry) -> list[np.ndarray]:
    all_r = g.all_rings()
    return [r for rings in all_r for r in rings]


@F.pandas_udf(T.DoubleType())
def st_area(wkb: pd.Series) -> pd.Series:
    def f(b):
        if b is None:
            return 0.0
        # per-polygon ring groups: outer minus holes, summed across
        # multipolygon parts (a flat ring list would misread a second
        # outer as a hole)
        return sum(polygon_area(poly) for poly in parse_wkb(bytes(b)).all_rings())

    return wkb.map(f)


@F.pandas_udf(T.DoubleType())
def st_length(wkb: pd.Series) -> pd.Series:
    def f(b):
        g = parse_wkb(bytes(b))
        if g.type_id == WKB_LINESTRING:
            return ops.line_length(g.parts[0])
        return ops.polygon_perimeter(_rings(g))

    return wkb.map(f)


@F.pandas_udf(T.DoubleType())
def st_geodesic_area(wkb: pd.Series) -> pd.Series:
    """Ellipsoidal (WGS84) geodesic area: per polygon |outer| -
    sum(|holes|), summed over multipolygon parts (a flat ring list
    would misread a second outer as a hole — same pitfall as st_area)
    (ogr/ogrsurface.cpp:39 via geod_polygonarea,
    ogrlinestring.cpp:3230; geo/geodesic.py for the algorithm)."""
    from gdal_spark.geo import geodesic

    def f(b):
        total = 0.0
        for rings in parse_wkb(bytes(b)).all_rings():
            area = geodesic.ring_area(rings[0])
            for hole in rings[1:]:
                area -= geodesic.ring_area(hole)
            total += area
        return total

    return wkb.map(f)


@F.pandas_udf(T.DoubleType())
def st_geodesic_length(wkb: pd.Series) -> pd.Series:
    """Ellipsoidal (WGS84) geodesic length: per-edge geod_inverse s12
    summed over every ring/part (ogrlinestring.cpp:3251,
    ogrsurface.cpp:111 — polygon perimeters include inner rings)."""
    from gdal_spark.geo import geodesic

    def f(b):
        g = parse_wkb(bytes(b))
        if g.type_id == WKB_LINESTRING:
            return geodesic.line_length(g.parts[0])
        return float(sum(geodesic.line_length(r) for r in _rings(g)))

    return wkb.map(f)


@F.pandas_udf(T.BinaryType())
def st_centroid(wkb: pd.Series) -> pd.Series:
    def f(b):
        cx, cy = polygon_centroid(_rings(parse_wkb(bytes(b))))
        return wkb_point(cx, cy)

    return wkb.map(f)


@F.pandas_udf(T.BooleanType())
def st_contains_point(wkb: pd.Series, x: pd.Series, y: pd.Series) -> pd.Series:
    out = []
    for b, px, py in zip(wkb, x, y):
        rings = _rings(parse_wkb(bytes(b)))
        out.append(bool(points_in_polygon([float(px)], [float(py)], rings)[0]))
    return pd.Series(out)


@F.pandas_udf(T.StringType())
def st_astext(wkb: pd.Series) -> pd.Series:
    return wkb.map(lambda b: to_wkt(parse_wkb(bytes(b))))


@F.pandas_udf(T.BinaryType())
def st_geomfromtext(wkt: pd.Series) -> pd.Series:
    return wkt.map(lambda s: geometry_to_wkb(from_wkt(s)))


@F.pandas_udf(T.BooleanType())
def st_isvalid(wkb: pd.Series) -> pd.Series:
    def f(b):
        g = parse_wkb(bytes(b))
        rs = _rings(g)
        return bool(rs) and all(ops.is_valid_ring(r) for r in rs)

    return wkb.map(f)


@F.pandas_udf(T.BinaryType())
def st_convexhull(wkb: pd.Series) -> pd.Series:
    def f(b):
        g = parse_wkb(bytes(b))
        pts = np.vstack(_rings(g) or g.parts)
        return wkb_polygon([ops.convex_hull(pts)])

    return wkb.map(f)


@F.pandas_udf(T.BinaryType())
def st_simplify(wkb: pd.Series, tol: pd.Series) -> pd.Series:
    def f(b, t):
        t = float(t)
        g = parse_wkb(bytes(b))
        if g.type_id == WKB_LINESTRING:
            return geometry_to_wkb(
                Geometry(WKB_LINESTRING, parts=[ops.douglas_peucker(g.parts[0], t)])
            )
        rings = [ops.douglas_peucker(r, t) for r in _rings(g)]
        return wkb_polygon(rings)

    return pd.Series([f(b, t) for b, t in zip(wkb, tol)])


@F.pandas_udf(T.BinaryType())
def st_segmentize(wkb: pd.Series, max_len: pd.Series) -> pd.Series:
    def f(b, m):
        m = float(m)
        g = parse_wkb(bytes(b))
        if g.type_id == WKB_LINESTRING:
            return geometry_to_wkb(
                Geometry(WKB_LINESTRING, parts=[ops.segmentize(g.parts[0], m)])
            )
        return wkb_polygon([ops.segmentize(r, m) for r in _rings(g)])

    return pd.Series([f(b, m) for b, m in zip(wkb, max_len)])


@F.pandas_udf(T.DoubleType())
def st_linelocatepoint(wkb: pd.Series, px: pd.Series,
                       py: pd.Series) -> pd.Series:
    """OGRSimpleCurve::Project dual (ogrlinestring.cpp:2167, GEOS
    GEOSProject): distance from the line origin to the closest point
    on the line."""
    from gdal_spark.geo import lineref as lr

    def f(b, x, y):
        g = parse_wkb(bytes(b))
        dist, _, _, _ = lr.np_project(g.parts[0], [float(x)], [float(y)])
        return float(dist[0])

    return pd.Series([f(b, x, y) for b, x, y in zip(wkb, px, py)])


@F.pandas_udf(T.BinaryType())
def st_lineinterpolatepoint(wkb: pd.Series, m: pd.Series) -> pd.Series:
    """OGRSimpleCurve::Value dual (ogrlinestring.cpp:2102): point at
    DISTANCE m along the line (clamped to the endpoints)."""
    from gdal_spark.geo import lineref as lr

    def f(b, mm):
        g = parse_wkb(bytes(b))
        x, y = lr.np_value(g.parts[0], float(mm))
        return wkb_point(x, y)

    return pd.Series([f(b, mm) for b, mm in zip(wkb, m)])


@F.pandas_udf(T.BinaryType())
def st_linesubstring(wkb: pd.Series, m_from: pd.Series,
                     m_to: pd.Series) -> pd.Series:
    """OGRSimpleCurve::getSubLine dual (ogrlinestring.cpp:2221,
    bAsRatio=FALSE): the line portion between two DISTANCES from the
    origin (clamped, like the reference)."""
    from gdal_spark.geo import lineref as lr
    from gdal_spark.geo.wkb import wkb_linestring

    def f(b, a, z):
        g = parse_wkb(bytes(b))
        return wkb_linestring(lr.np_subline(g.parts[0], float(a), float(z)))

    return pd.Series([f(b, a, z) for b, a, z in zip(wkb, m_from, m_to)])


@F.pandas_udf(T.BinaryType())
def st_buffer(wkb: pd.Series, dist: pd.Series) -> pd.Series:
    def f(b, d):
        d = float(d)
        g = parse_wkb(bytes(b))
        outer = _rings(g)[0] if _rings(g) else g.parts[0]
        return wkb_polygon([ops.buffer_convex(outer, d)])

    return pd.Series([f(b, d) for b, d in zip(wkb, dist)])


@F.pandas_udf(T.BinaryType())
def st_pointonsurface(wkb: pd.Series) -> pd.Series:
    def f(b):
        x, y = ops.point_on_surface(_rings(parse_wkb(bytes(b))))
        return wkb_point(x, y)

    return wkb.map(f)


@F.pandas_udf(T.DoubleType())
def st_x(wkb: pd.Series) -> pd.Series:
    return wkb.map(lambda b: float(parse_wkb(bytes(b)).parts[0][0][0]))


@F.pandas_udf(T.DoubleType())
def st_y(wkb: pd.Series) -> pd.Series:
    return wkb.map(lambda b: float(parse_wkb(bytes(b)).parts[0][0][1]))


# ---------------------------------------------------------------------------
# pairwise predicates + distance (ogrgeometry.cpp:579,3562,5588-6050)
# ---------------------------------------------------------------------------

def _relate_any(ga: Geometry, gb: Geometry) -> dict:
    """Type-dispatched DE-9IM flag set: areal x areal via
    polygon_relate, any LINESTRING operand via the line relate engine
    (geo/predicates.line_line_relate / line_polygon_relate), with the
    asymmetric flags swapped when the line is the second operand."""
    from gdal_spark.geo import predicates as P

    a_pt = ga.type_id == WKB_POINT
    b_pt = gb.type_id == WKB_POINT
    if a_pt or b_pt:
        return _point_relate(ga, gb)
    a_line = ga.type_id == WKB_LINESTRING
    b_line = gb.type_id == WKB_LINESTRING
    if a_line and b_line:
        return P.line_line_relate(ga.parts[0], gb.parts[0])
    if a_line:
        return P.line_polygon_relate(ga.parts[0], _rings(gb))
    if b_line:
        r = dict(P.line_polygon_relate(gb.parts[0], _rings(ga)))
        r["within"], r["contains"] = r["contains"], r["within"]
        return r
    r = dict(P.polygon_relate(_rings(ga), _rings(gb)))
    r.setdefault("crosses", False)
    return r


def _point_relate(ga: Geometry, gb: Geometry) -> dict:
    """DE-9IM flags when either operand is a POINT. Point boundary is
    empty, so a point on a line/polygon BOUNDARY intersects+touches;
    strictly interior -> within; two points relate by equality."""
    from gdal_spark.geo import predicates as P

    flags = dict.fromkeys(
        ("intersects", "disjoint", "within", "contains", "overlaps",
         "touches", "equals", "crosses"), False
    )
    a_pt = ga.type_id == WKB_POINT
    b_pt = gb.type_id == WKB_POINT
    if a_pt and b_pt:
        eq = bool(np.array_equal(ga.parts[0][0], gb.parts[0][0]))
        flags.update(
            intersects=eq, disjoint=not eq, equals=eq, within=eq,
            contains=eq,
        )
        return flags
    pt, other, pt_first = (
        (ga, gb, True) if a_pt else (gb, ga, False)
    )
    x, y = (float(v) for v in pt.parts[0][0])
    if other.type_id == WKB_LINESTRING:
        coords = other.parts[0]
        on = False
        at_end = False
        for i in range(len(coords) - 1):
            p1, p2 = coords[i], coords[i + 1]
            d = p2 - p1
            cr = d[0] * (y - p1[1]) - d[1] * (x - p1[0])
            if cr == 0.0:
                t = (x - p1[0]) * d[0] + (y - p1[1]) * d[1]
                if 0.0 <= t <= float(d @ d):
                    on = True
        for e in (coords[0], coords[-1]):
            if e[0] == x and e[1] == y:
                at_end = True
        inside = on and not at_end
        flags.update(
            intersects=on, disjoint=not on, touches=on and at_end,
        )
        if pt_first:
            flags["within"] = inside
        else:
            flags["contains"] = inside
        return flags
    rings = _rings(other)
    on_b = P.point_on_boundary(x, y, rings)
    inside = (not on_b) and bool(
        points_in_polygon([x], [y], rings)[0]
    )
    flags.update(
        intersects=on_b or inside, disjoint=not (on_b or inside),
        touches=on_b,
    )
    if pt_first:
        flags["within"] = inside
    else:
        flags["contains"] = inside
    return flags


def _pairwise_predicate(name: str):
    @F.pandas_udf(T.BooleanType())
    def pred(wa: pd.Series, wb: pd.Series) -> pd.Series:
        out = []
        for ba, bb in zip(wa, wb):
            out.append(
                _relate_any(parse_wkb(bytes(ba)), parse_wkb(bytes(bb)))[name]
            )
        return pd.Series(out)

    return pred


@F.pandas_udf(T.BooleanType())
def st_crosses(wa: pd.Series, wb: pd.Series) -> pd.Series:
    """ST_Crosses (ogrgeometry.cpp:5734): DE-9IM crosses for
    line x line (dim(IxI) == 0) and line x areal / areal x line (the
    line has pieces both inside and outside) via the line relate
    engine (geo/predicates.line_line_relate /
    line_polygon_relate). Areal x areal pairs can never cross
    (equal-dimension crosses is undefined -> false), matching GEOS."""

    def one(ba, bb):
        return _relate_any(parse_wkb(bytes(ba)), parse_wkb(bytes(bb)))[
            "crosses"
        ]

    return pd.Series([one(a, b) for a, b in zip(wa, wb)])


st_intersects = _pairwise_predicate("intersects")
st_disjoint = _pairwise_predicate("disjoint")
st_within = _pairwise_predicate("within")
st_contains = _pairwise_predicate("contains")
st_overlaps = _pairwise_predicate("overlaps")
st_touches = _pairwise_predicate("touches")
st_equals = _pairwise_predicate("equals")


@F.pandas_udf(T.DoubleType())
def st_distance(wa: pd.Series, wb: pd.Series) -> pd.Series:
    """Min euclidean distance between two geometries (point or areal
    WKB); 0 when they intersect (ogrgeometry.cpp:3562)."""
    import math

    from gdal_spark.geo import predicates as P

    def one(ba, bb):
        ga, gb = parse_wkb(bytes(ba)), parse_wkb(bytes(bb))
        if ga.type_id == WKB_POINT and gb.type_id == WKB_POINT:
            (ax, ay), (bx, by) = ga.parts[0][0], gb.parts[0][0]
            return math.hypot(ax - bx, ay - by)
        if ga.type_id == WKB_POINT:
            x, y = ga.parts[0][0]
            return math.sqrt(P.point_polygon_distance2(x, y, _rings(gb)))
        if gb.type_id == WKB_POINT:
            x, y = gb.parts[0][0]
            return math.sqrt(P.point_polygon_distance2(x, y, _rings(ga)))
        return math.sqrt(P.polygon_distance2(_rings(ga), _rings(gb)))

    return pd.Series([one(a, b) for a, b in zip(wa, wb)])


def _pairwise_overlay(op: str):
    """ST_Intersection / ST_Union / ST_Difference / ST_SymDifference
    over areal WKB pairs via the general boolean kernel
    (ogrgeometry.cpp:4893,5012,5331,5451 semantics; general-position
    operand contract per geo/boolean.py). Returns NULL for an empty
    result (the reference returns an EMPTY geometry; NULL keeps the
    SQL surface simple and is documented)."""
    from gdal_spark.geo.boolean import boolean_op, rings_to_polygons
    from gdal_spark.geo.wkb import wkb_multipolygon

    @F.pandas_udf(T.BinaryType())
    def fn(wa: pd.Series, wb: pd.Series) -> pd.Series:
        def one(ba, bb):
            ra = _rings(parse_wkb(bytes(ba)))
            rb = _rings(parse_wkb(bytes(bb)))
            if op == "symdiff":
                # group each one-sided difference separately: the two
                # results share boundary edges, so a combined even-odd
                # nesting pass would misclassify them as holes
                polys = rings_to_polygons(
                    boolean_op(ra, rb, "diff")
                ) + rings_to_polygons(boolean_op(rb, ra, "diff"))
            else:
                polys = rings_to_polygons(boolean_op(ra, rb, op))
            return wkb_multipolygon(polys) if polys else None

        return pd.Series([one(a, b) for a, b in zip(wa, wb)])

    return fn


@F.pandas_udf(T.BooleanType())
def st_issimple(wkb: pd.Series) -> pd.Series:
    """IsSimple (ogrgeometry.cpp:2416 -> GEOS IsSimpleOp): no two
    segments of any component intersect except adjacent segments at
    their shared vertex. An OPEN LineString is scanned as an open
    chain — no synthetic closure edge is added (GEOS never adds one;
    a polyline whose closing chord would cross the line is still
    simple). Degenerate self-contacts return False, never raise."""
    from gdal_spark.geo.makevalid import chain_is_simple

    def one(b):
        g = parse_wkb(bytes(b))
        if g.type_id == WKB_LINESTRING:
            pts = g.parts[0]
            if np.array_equal(pts[0], pts[-1]):
                return chain_is_simple(pts[:-1], closed=True)
            return chain_is_simple(pts, closed=False)
        return all(
            chain_is_simple(r[:-1], closed=True)
            for rings in g.all_rings()
            for r in rings
        )

    return wkb.map(one)


@F.pandas_udf(T.BooleanType())
def st_isring(wkb: pd.Series) -> pd.Series:
    """IsRing (ogrgeometry.cpp:2486): closed AND simple linestring."""
    from gdal_spark.geo.makevalid import chain_is_simple

    def one(b):
        g = parse_wkb(bytes(b))
        if g.type_id != WKB_LINESTRING:
            return False
        pts = g.parts[0]
        if len(pts) < 4 or not np.array_equal(pts[0], pts[-1]):
            return False
        return chain_is_simple(pts[:-1], closed=True)

    return wkb.map(one)


@F.pandas_udf(T.BooleanType())
def st_isrectangle(wkb: pd.Series) -> pd.Series:
    """IsRectangle (ogrgeometry.cpp:8820): a single 5-point ring
    whose edges are axis-parallel."""

    def one(b):
        g = parse_wkb(bytes(b))
        rings = g.all_rings()
        if len(rings) != 1 or len(rings[0]) != 1:
            return False
        r = rings[0][0]
        if len(r) != 5 or not np.array_equal(r[0], r[-1]):
            return False
        for (x1, y1), (x2, y2) in zip(r[:-1], r[1:]):
            if x1 != x2 and y1 != y2:
                return False
        return True

    return wkb.map(one)


@F.pandas_udf(T.StringType())
def st_asgeojson(wkb: pd.Series) -> pd.Series:
    """GeoJSON geometry export (ogr/ogrgeojsongeometry.cpp analog):
    Point/LineString/Polygon/MultiPolygon from WKB."""
    import json

    def one(b):
        g = parse_wkb(bytes(b))
        if g.type_id == WKB_POINT:
            x, y = g.parts[0][0]
            return json.dumps({"type": "Point", "coordinates": [x, y]})
        if g.type_id == WKB_LINESTRING:
            return json.dumps(
                {"type": "LineString",
                 "coordinates": [[float(x), float(y)] for x, y in g.parts[0]]}
            )
        polys = [
            [[[float(x), float(y)] for x, y in ring] for ring in rings]
            for rings in g.all_rings()
        ]
        if len(polys) == 1 and g.type_name == "Polygon":
            return json.dumps({"type": "Polygon", "coordinates": polys[0]})
        return json.dumps({"type": "MultiPolygon", "coordinates": polys})

    return wkb.map(one)


@F.pandas_udf(T.StringType())
def st_askml(wkb: pd.Series) -> pd.Series:
    """KML geometry export (ogr/ogr2kmlgeometry.cpp): Point/
    LineString/Polygon with lon,lat coordinate tuples."""

    def coords(arr):
        return " ".join(f"{x:.15g},{y:.15g}" for x, y in arr)

    def one(b):
        g = parse_wkb(bytes(b))
        if g.type_id == WKB_POINT:
            x, y = g.parts[0][0]
            return f"<Point><coordinates>{x:.15g},{y:.15g}</coordinates></Point>"
        if g.type_id == WKB_LINESTRING:
            return (
                f"<LineString><coordinates>{coords(g.parts[0])}"
                "</coordinates></LineString>"
            )
        rings = g.all_rings()[0]
        out = ["<Polygon>"]
        out.append(
            "<outerBoundaryIs><LinearRing><coordinates>"
            + coords(rings[0]) + "</coordinates></LinearRing></outerBoundaryIs>"
        )
        for h in rings[1:]:
            out.append(
                "<innerBoundaryIs><LinearRing><coordinates>"
                + coords(h) + "</coordinates></LinearRing></innerBoundaryIs>"
            )
        out.append("</Polygon>")
        return "".join(out)

    return wkb.map(one)


@F.pandas_udf(T.StringType())
def st_asgml(wkb: pd.Series) -> pd.Series:
    """GML 2 geometry export (ogr/ogr2gmlgeometry.cpp):
    gml:Point/LineString/Polygon with gml:coordinates."""

    def coords(arr):
        return " ".join(f"{x:.15g},{y:.15g}" for x, y in arr)

    def one(b):
        g = parse_wkb(bytes(b))
        if g.type_id == WKB_POINT:
            x, y = g.parts[0][0]
            return (
                f"<gml:Point><gml:coordinates>{x:.15g},{y:.15g}"
                "</gml:coordinates></gml:Point>"
            )
        if g.type_id == WKB_LINESTRING:
            return (
                f"<gml:LineString><gml:coordinates>{coords(g.parts[0])}"
                "</gml:coordinates></gml:LineString>"
            )
        rings = g.all_rings()[0]
        out = ["<gml:Polygon>"]
        out.append(
            "<gml:outerBoundaryIs><gml:LinearRing><gml:coordinates>"
            + coords(rings[0])
            + "</gml:coordinates></gml:LinearRing></gml:outerBoundaryIs>"
        )
        for h in rings[1:]:
            out.append(
                "<gml:innerBoundaryIs><gml:LinearRing><gml:coordinates>"
                + coords(h)
                + "</gml:coordinates></gml:LinearRing></gml:innerBoundaryIs>"
            )
        out.append("</gml:Polygon>")
        return "".join(out)

    return wkb.map(one)


@F.pandas_udf(T.BinaryType())
def st_geomfromgeojson(txt: pd.Series) -> pd.Series:
    """GeoJSON geometry import -> WKB."""
    import json

    def one(s):
        o = json.loads(s)
        t = o["type"]
        c = o["coordinates"]
        if t == "Point":
            return wkb_point(float(c[0]), float(c[1]))
        if t == "LineString":
            return wkb_linestring(np.asarray(c, dtype=np.float64))
        if t == "Polygon":
            return wkb_polygon([np.asarray(r, dtype=np.float64) for r in c])
        if t == "MultiPolygon":
            from gdal_spark.geo.wkb import wkb_multipolygon

            return wkb_multipolygon(
                [[np.asarray(r, dtype=np.float64) for r in poly] for poly in c]
            )
        raise ValueError(f"unsupported GeoJSON type {t}")

    return txt.map(one)


@F.pandas_udf(T.BinaryType())
def st_delaunaytriangles(wkb: pd.Series) -> pd.Series:
    """Delaunay triangulation of a geometry's vertices ->
    MultiPolygon of triangles (ogrgeometry.cpp:6697 semantics via
    the Bowyer-Watson kernel in raster/tin.py)."""
    from gdal_spark.geo.wkb import wkb_multipolygon
    from gdal_spark.raster.tin import delaunay

    def one(b):
        g = parse_wkb(bytes(b))
        if g.type_id == WKB_LINESTRING:
            pts = np.asarray(g.parts[0], dtype=np.float64)
        elif g.type_id == WKB_POINT:
            return None
        else:
            pts = np.concatenate(
                [r[:-1] for rings in g.all_rings() for r in rings]
            )
        pts = np.unique(pts, axis=0)
        tris = delaunay(pts)
        polys = []
        for a, b2, c in tris:
            ring = np.vstack([pts[a], pts[b2], pts[c], pts[a]])
            polys.append([ring])
        return wkb_multipolygon(polys) if polys else None

    return wkb.map(one)


@F.pandas_udf(T.BinaryType())
def st_unaryunion(wkb: pd.Series) -> pd.Series:
    """UnaryUnion (ogrgeometry.cpp:5227): fold the general boolean
    union over a multipolygon's parts (general-position contract
    between parts, per geo/boolean.py)."""
    from gdal_spark.geo.boolean import boolean_op, rings_to_polygons
    from gdal_spark.geo.wkb import wkb_multipolygon

    def one(b):
        parts = parse_wkb(bytes(b)).all_rings()
        if not parts:
            return None
        acc = list(parts[0])
        for rings in parts[1:]:
            acc = boolean_op(acc, list(rings), "union")
        polys = rings_to_polygons(acc)
        return wkb_multipolygon(polys) if polys else None

    return wkb.map(one)


@F.pandas_udf(T.BinaryType())
def st_makevalid(wkb: pd.Series) -> pd.Series:
    """Repair self-intersecting areal geometry (ogrgeometry.cpp:3922
    MakeValid): noding + planar face traversal + odd-winding face
    selection (geo/makevalid.py)."""
    from gdal_spark.geo.makevalid import make_valid_rings
    from gdal_spark.geo.wkb import wkb_multipolygon

    def one(b):
        polys = make_valid_rings(_rings(parse_wkb(bytes(b))))
        return wkb_multipolygon(polys) if polys else None

    return wkb.map(one)


st_intersection = _pairwise_overlay("inter")
st_union = _pairwise_overlay("union")
st_difference = _pairwise_overlay("diff")
st_symdifference = _pairwise_overlay("symdiff")


@F.pandas_udf(T.BinaryType())
def st_buildarea(wkb: pd.Series) -> pd.Series:
    """ST_BuildArea (ogrgeometry.cpp:6916 -> GEOSBuildArea): areal
    region bounded by the input's closed linework, alternating-rule
    nesting (geo/arrangement.build_area)."""
    from gdal_spark.geo.arrangement import build_area
    from gdal_spark.geo.boolean import rings_to_polygons
    from gdal_spark.geo.wkb import wkb_multipolygon

    def one(b):
        rings = _rings(parse_wkb(bytes(b)))
        polys = rings_to_polygons(build_area(rings))
        return wkb_multipolygon(polys) if polys else None

    return wkb.map(one)


@F.pandas_udf(T.BinaryType())
def st_polygonize(wkb: pd.Series) -> pd.Series:
    """ST_Polygonize (ogrgeometry.cpp:6789 -> GEOSPolygonize): every
    bounded face of the noded linework as its own polygon, nested
    components cutting holes (geo/arrangement.polygonize_faces).
    Returns a MultiPolygon of all faces."""
    from gdal_spark.geo.arrangement import polygonize_faces
    from gdal_spark.geo.wkb import wkb_multipolygon

    def one(b):
        rings = _rings(parse_wkb(bytes(b)))
        polys = polygonize_faces(rings)
        return wkb_multipolygon(polys) if polys else None

    return wkb.map(one)


@F.pandas_udf(T.BinaryType())
def st_concavehull(wkb: pd.Series, ratio: pd.Series) -> pd.Series:
    """ST_ConcaveHull (ogrgeometry.cpp:4305, GEOS >= 3.11 semantics;
    geo/constructive.concave_hull) over the geometry's vertices."""
    from gdal_spark.geo.constructive import concave_hull

    def f(b, r):
        g = parse_wkb(bytes(b))
        pts = np.vstack(
            [p[:-1] if len(p) > 1 and np.array_equal(p[0], p[-1]) else p
             for p in g.parts]
        )
        pts = np.unique(pts, axis=0)
        return wkb_polygon([concave_hull(pts, float(r))])

    return pd.Series([f(b, r) for b, r in zip(wkb, ratio)])


@F.pandas_udf(T.BinaryType())
def st_normalize(wkb: pd.Series) -> pd.Series:
    """ST_Normalize (ogrgeometry.cpp:4106 -> GEOSNormalize / JTS
    canonical form): rings anchored at their minimum vertex, shells
    CW, holes CCW + sorted; LineStrings reversed when the reverse
    compares smaller (geo/constructive)."""
    from gdal_spark.geo.constructive import normalize_line, normalize_polys
    from gdal_spark.geo.wkb import wkb_multipolygon

    def one(b):
        g = parse_wkb(bytes(b))
        if g.type_id == WKB_LINESTRING:
            return geometry_to_wkb(
                Geometry(WKB_LINESTRING, parts=[normalize_line(g.parts[0])])
            )
        polys = normalize_polys(g.all_rings())
        if g.type_id == WKB_MULTIPOLYGON or len(polys) > 1:
            return wkb_multipolygon(polys)
        return wkb_polygon(polys[0])

    return wkb.map(one)


@F.pandas_udf(T.BinaryType())
def st_simplifypreservetopology(wkb: pd.Series, tol: pd.Series) -> pd.Series:
    """ST_SimplifyPreserveTopology (ogrgeometry.cpp:6440): DP with
    per-ring validity/simplicity fallback (geo/constructive)."""
    from gdal_spark.geo.constructive import simplify_preserve_topology

    def f(b, t):
        g = parse_wkb(bytes(b))
        if g.type_id == WKB_LINESTRING:
            return geometry_to_wkb(
                Geometry(
                    WKB_LINESTRING,
                    parts=[ops.douglas_peucker(g.parts[0], float(t))],
                )
            )
        return wkb_polygon(simplify_preserve_topology(_rings(g), float(t)))

    return pd.Series([f(b, t) for b, t in zip(wkb, tol)])


@F.pandas_udf(T.BinaryType())
def st_setprecision(wkb: pd.Series, grid: pd.Series) -> pd.Series:
    """ST_SetPrecision (ogrgeometry.cpp:6608 SetPrecision): snap
    vertices to the grid, drop collapsed edges/spikes/rings
    (geo/arrangement.set_precision). NULL when the geometry collapses
    entirely."""
    from gdal_spark.geo.arrangement import set_precision
    from gdal_spark.geo.boolean import rings_to_polygons
    from gdal_spark.geo.wkb import wkb_multipolygon

    def f(b, gsize):
        g = parse_wkb(bytes(b))
        if g.type_id == WKB_LINESTRING:
            snapped = np.floor(g.parts[0] / float(gsize) + 0.5) * float(gsize)
            keep = [0] + [
                i for i in range(1, len(snapped))
                if not np.array_equal(snapped[i], snapped[i - 1])
            ]
            if len(keep) < 2:
                return None
            return geometry_to_wkb(
                Geometry(WKB_LINESTRING, parts=[snapped[keep]])
            )
        out = set_precision(_rings(g), float(gsize))
        polys = rings_to_polygons(out)
        return wkb_multipolygon(polys) if polys else None

    return pd.Series([f(b, gsize) for b, gsize in zip(wkb, grid)])


def _geom_coord_arrays(g: Geometry) -> list[np.ndarray]:
    if g.polys:
        return [r for rings in g.polys for r in rings]
    return list(g.parts)


def _geom_set_coords(g: Geometry, arrays: list[np.ndarray]) -> None:
    it = iter(arrays)
    if g.polys:
        g.polys = [[next(it) for _ in rings] for rings in g.polys]
    else:
        g.parts = [next(it) for _ in g.parts]


@F.pandas_udf(T.BinaryType())
def st_transform(wkb: pd.Series, src: pd.Series, dst: pd.Series) -> pd.Series:
    """ST_Transform(geom, src_crs, dst_crs): reproject every vertex
    through the projection-zoo registry (geo/projzoo.py).  src/dst
    accept anything resolve_crs takes — int EPSG codes, 'EPSG:n',
    'ESRI:n', '+proj=' strings, WKT1.  Mirrors the reference's
    SQLite-dialect ST_Transform (ogrsqlitesqlfunctions.cpp:705) with
    an explicit source CRS (the engine's geometry columns carry no
    layer SRS header).  All coordinates in an Arrow batch sharing one
    (src, dst) pair are reprojected in ONE vectorized numpy call."""
    from gdal_spark.geo import projzoo as pz

    def norm(v):
        s = str(v)
        return int(s) if s.lstrip("-").isdigit() else s

    out = pd.Series([None] * len(wkb), dtype=object)
    keys = pd.DataFrame({"s": src.map(norm), "d": dst.map(norm)})
    for (s_key, d_key), idx in keys.groupby(["s", "d"]).groups.items():
        s_res = pz.resolve_crs(s_key)
        d_res = pz.resolve_crs(d_key)
        geoms, counts, chunks = [], [], []
        for b in wkb.loc[idx]:
            g = parse_wkb(b) if b is not None else None
            geoms.append(g)
            arrs = _geom_coord_arrays(g) if g is not None else []
            chunks.append(arrs)
            counts.append(sum(len(a) for a in arrs))
        if sum(counts):
            allc = np.vstack([a for arrs in chunks for a in arrs])
            x, y = pz.reproject(allc[:, 0], allc[:, 1], s_res, d_res)
            flat = np.column_stack([x, y])
        else:
            flat = np.empty((0, 2))
        pos = 0
        for g, arrs, i in zip(geoms, chunks, idx):
            if g is None:
                continue
            new_arrs = []
            for a in arrs:
                new_arrs.append(flat[pos:pos + len(a)])
                pos += len(a)
            _geom_set_coords(g, new_arrs)
            out.loc[i] = geometry_to_wkb(g)
    return out


_REGISTRY = {
    "ST_Area": st_area,
    "ST_Transform": st_transform,
    "ST_MakeValid": st_makevalid,
    "ST_IsSimple": st_issimple,
    "ST_IsRing": st_isring,
    "ST_IsRectangle": st_isrectangle,
    "ST_AsGeoJSON": st_asgeojson,
    "ST_GeomFromGeoJSON": st_geomfromgeojson,
    "ST_AsKML": st_askml,
    "ST_AsGML": st_asgml,
    "ST_DelaunayTriangles": st_delaunaytriangles,
    "ST_UnaryUnion": st_unaryunion,
    "ST_Intersection": st_intersection,
    "ST_Union": st_union,
    "ST_Difference": st_difference,
    "ST_SymDifference": st_symdifference,
    "ST_Intersects": st_intersects,
    "ST_Disjoint": st_disjoint,
    "ST_Within": st_within,
    "ST_Contains": st_contains,
    "ST_Overlaps": st_overlaps,
    "ST_Touches": st_touches,
    "ST_Equals": st_equals,
    "ST_Distance": st_distance,
    "ST_Length": st_length,
    "ST_GeodesicArea": st_geodesic_area,
    "ST_GeodesicLength": st_geodesic_length,
    "ST_Centroid": st_centroid,
    "ST_Contains_Point": st_contains_point,
    "ST_AsText": st_astext,
    "ST_GeomFromText": st_geomfromtext,
    "ST_IsValid": st_isvalid,
    "ST_ConvexHull": st_convexhull,
    "ST_Simplify": st_simplify,
    "ST_Segmentize": st_segmentize,
    "ST_LineLocatePoint": st_linelocatepoint,
    "ST_LineInterpolatePoint": st_lineinterpolatepoint,
    "ST_LineSubstring": st_linesubstring,
    "ST_Buffer": st_buffer,
    "ST_PointOnSurface": st_pointonsurface,
    "ST_X": st_x,
    "ST_Y": st_y,
    "ST_Crosses": st_crosses,
    "ST_BuildArea": st_buildarea,
    "ST_Polygonize": st_polygonize,
    "ST_ConcaveHull": st_concavehull,
    "ST_Normalize": st_normalize,
    "ST_SimplifyPreserveTopology": st_simplifypreservetopology,
    "ST_SetPrecision": st_setprecision,
}


def register_st_functions(spark: SparkSession) -> None:
    """Make the ST_* names usable from spark.sql, mirroring
    OGRSQLiteRegisterSQLFunctions."""
    for name, udf in _REGISTRY.items():
        spark.udf.register(name, udf)
