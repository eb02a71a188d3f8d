"""Ellipsoidal geodesics (geo/geodesic.py) — pinned against the PROJ
outputs recorded in the reference's conformance suite
(/root/reference/autotest/ogr/ogr_geom.py test_ogr_geom_GeodesicArea /
test_ogr_geom_GeodesicLength), plus the DuckDB SQL twin differential
and spherical-limit closed forms."""

import duckdb
import numpy as np
import pytest

from gdal_spark.geo import geodesic as gd

# PROJ-computed anchors from the reference autotest (1e-6 rel there;
# the quadrature solver lands within ~1e-12).
AREA_4849 = 4068384291.8911743      # POLYGON((2 49,3 49,3 48,2 49))
AREA_8889 = 108860488.12023926      # POLYGON((2 89,3 89,3 88,2 89))
LEN_49_2_49_3 = 73171.26435678436
LEN_49_3_48_3 = 111200.0367623785
LEN_48_3_49_2 = 133514.4852804854
PERIM_4849 = 317885.78639964823

RING_4849 = np.array([(2, 49), (3, 49), (3, 48), (2, 49)], dtype=float)
RING_8889 = np.array([(2, 89), (3, 89), (3, 88), (2, 89)], dtype=float)


def test_inverse_matches_proj_anchors():
    s, _ = gd.inverse(49, 2, 49, 3)
    assert s[0] == pytest.approx(LEN_49_2_49_3, rel=1e-11)
    s, _ = gd.inverse(49, 3, 48, 3)     # meridional
    assert s[0] == pytest.approx(LEN_49_3_48_3, rel=1e-11)
    s, _ = gd.inverse(48, 3, 49, 2)
    assert s[0] == pytest.approx(LEN_48_3_49_2, rel=1e-11)


def test_ring_area_matches_proj():
    assert gd.ring_area(RING_4849) == pytest.approx(AREA_4849, rel=1e-9)
    assert gd.ring_area(RING_8889) == pytest.approx(AREA_8889, rel=1e-9)


def test_perimeter_matches_proj():
    assert gd.line_length(RING_4849) == pytest.approx(PERIM_4849, rel=1e-11)


def test_area_orientation_and_hemisphere_invariance():
    # reversed ring, southern mirror, lon-shifted: same |area|
    rev = RING_4849[::-1].copy()
    south = RING_4849 * np.array([1.0, -1.0])
    shifted = RING_4849 + np.array([137.0, 0.0])
    a = gd.ring_area(RING_4849)
    assert gd.ring_area(rev) == pytest.approx(a, rel=1e-12)
    assert gd.ring_area(south) == pytest.approx(a, rel=1e-12)
    assert gd.ring_area(shifted) == pytest.approx(a, rel=1e-9)


def test_antimeridian_ring():
    ring = np.array(
        [(179, 40), (-179, 40), (-179, 41), (179, 41), (179, 40)],
        dtype=float)
    # sanity envelope: 2deg lon x 1 deg lat band at 40..41N
    a = gd.ring_area(ring)
    assert 1.8e10 < a < 1.95e10
    # equivalent ring away from the antimeridian
    ring2 = np.array(
        [(10, 40), (12, 40), (12, 41), (10, 41), (10, 40)], dtype=float)
    assert a == pytest.approx(gd.ring_area(ring2), rel=1e-9)


def test_known_arc_lengths():
    # equatorial degree (exact closed form a * lam * ... on equator)
    s, S = gd.inverse(0, 0, 0, 1)
    assert s[0] == pytest.approx(gd.WGS84_A * np.radians(1.0), rel=1e-12)
    assert S[0] == 0.0
    # meridian quadrant: the classic ~10,001.966 km (metre definition)
    s, S = gd.inverse(0, 7, 90, 7)
    assert s[0] == pytest.approx(10001965.729, abs=1.0)
    assert S[0] == 0.0


def test_coincident_and_tiny_edges():
    s, S = gd.inverse(12.5, 3.25, 12.5, 3.25)
    assert s[0] == 0.0 and S[0] == 0.0
    s, _ = gd.inverse(30, 20, 30.0001, 20.0001)
    # ~14.7 m diagonal
    assert 14.0 < s[0] < 16.0


def test_sphere_limit_matches_girard(monkeypatch):
    """With f -> 0 the solver must reproduce spherical excess.  The
    tolerance is limited by float cancellation in the remainder
    integrand at artificially tiny e (Fz*u - a^2*sin(beta) subtracts
    two ~a^2 terms whose true difference ~e^2*a^2 sinks below the
    terms' own rounding at f = 1e-12, then the near-vertex
    1/sin^2(alpha0) factor amplifies the noise); at the real WGS84 f
    the difference is ~130 ulps wide and the PROJ-anchor tests above
    pin 1e-12 relative."""
    f = 1e-12
    monkeypatch.setattr(gd, "WGS84_F", f)
    monkeypatch.setattr(gd, "_E2", f * (2 - f))
    monkeypatch.setattr(gd, "_EP2", f * (2 - f) / (1 - f * (2 - f)))
    monkeypatch.setattr(gd, "_B", gd.WGS84_A * (1 - f))
    monkeypatch.setattr(gd, "_E", float(np.sqrt(f * (2 - f))))

    def uv(lon, lat):
        lam, phi = np.radians(lon), np.radians(lat)
        return np.array([np.cos(phi) * np.cos(lam),
                         np.cos(phi) * np.sin(lam), np.sin(phi)])

    def angle(a, b, c):
        t1 = np.cross(uv(*a), uv(*b))
        t2 = np.cross(uv(*a), uv(*c))
        return np.arccos(np.dot(t1, t2)
                         / np.linalg.norm(t1) / np.linalg.norm(t2))

    for tri in [((2, 49), (3, 49), (3, 48)), ((2, 89), (3, 89), (3, 88)),
                ((-40, -10), (-35, -12), (-38, -3))]:
        p1, p2, p3 = tri
        ring = np.array([p1, p2, p3, p1], dtype=float)
        excess = (angle(p1, p2, p3) + angle(p2, p3, p1)
                  + angle(p3, p1, p2) - np.pi)
        girard = excess * gd.WGS84_A ** 2
        assert gd.ring_area(ring) == pytest.approx(girard, rel=2e-7)


def test_nearly_antipodal_behavior():
    """The equatorial nearly-antipodal case is a loud scope bound;
    non-equatorial nearly-antipodal inputs either converge (residual
    check passed inside inverse()) to ~half-circumference or raise —
    they must never return silently-wrong short distances."""
    with pytest.raises(ValueError):
        gd.inverse(0.0, 0.0, 0.0, 179.6)
    try:
        s, _ = gd.inverse(10.0, 0.0, -10.0, 179.95)
    except ValueError:
        return  # loud refusal is acceptable
    assert 1.95e7 < s[0] < 2.01e7


def test_pole_enclosing_ring_raises():
    ring = np.array([(0, 80), (120, 80), (-120, 80), (0, 80)], dtype=float)
    with pytest.raises(ValueError):
        gd.ring_area(ring)


def test_sql_twin_matches_numpy():
    edges = [
        (0, 2, 49, 3, 49), (1, 3, 49, 3, 48), (2, 3, 48, 2, 49),
        (3, 2, 89, 3, 89), (4, 3, 89, 3, 88), (5, 3, 88, 2, 89),
        (6, 10, -1, 12, -1), (7, 12, -1, 12, 1), (8, 179, 40, -179, 41),
        (9, -100, -60, -95, -55), (10, 5.5, 0.25, 5.5, 0.25),
        (11, 0, 0, 10, 0), (12, 30, 20, 31, 21), (13, 100, 84, 103, 82),
    ]
    cte = " UNION ALL ".join(
        f"SELECT {i} AS edge_id, cast({x1!r} as double) AS x1,"
        f" cast({y1!r} as double) AS y1, cast({x2!r} as double) AS x2,"
        f" cast({y2!r} as double) AS y2"
        for i, x1, y1, x2, y2 in edges)
    sql = ("WITH " + gd.sql_edge_measures_cte(cte)
           + " SELECT edge_id, s12, s12_area FROM geod ORDER BY edge_id")
    rows = duckdb.sql(sql).fetchall()
    lat1 = np.array([e[2] for e in edges], float)
    lon1 = np.array([e[1] for e in edges], float)
    lat2 = np.array([e[4] for e in edges], float)
    lon2 = np.array([e[3] for e in edges], float)
    s12, S12 = gd.inverse(lat1, lon1, lat2, lon2)
    for eid, qs, qa in rows:
        assert qs == pytest.approx(s12[eid], rel=1e-12, abs=1e-7)
        assert qa == pytest.approx(S12[eid], rel=1e-10, abs=1e-3)


def test_st_functions_ellipsoidal(spark):
    from gdal_spark.geo.st_functions import register_st_functions
    from gdal_spark.geo.wkb import wkb_polygon

    register_st_functions(spark)
    df = spark.createDataFrame(
        [(1, bytearray(wkb_polygon([RING_4849])))], ["id", "geometry"])
    df.createOrReplaceTempView("geod_t")
    row = spark.sql(
        "SELECT ST_GeodesicArea(geometry) AS a,"
        " ST_GeodesicLength(geometry) AS p FROM geod_t").collect()[0]
    assert row["a"] == pytest.approx(AREA_4849, rel=1e-9)
    assert row["p"] == pytest.approx(PERIM_4849, rel=1e-11)


def test_st_geodesic_area_multipolygon_sums_parts(spark):
    """A second polygon's outer ring must ADD, not subtract (the
    flat-ring pitfall st_area's comment documents; the reference sums
    member polygons in OGRMultiSurface::get_GeodesicArea)."""
    from gdal_spark.geo.st_functions import register_st_functions
    from gdal_spark.geo.wkb import wkb_multipolygon, wkb_polygon

    register_st_functions(spark)
    far = RING_4849 + np.array([10.0, 0.0])
    mp = wkb_multipolygon([[RING_4849], [far]])
    df = spark.createDataFrame(
        [(1, bytearray(mp)), (2, bytearray(wkb_polygon([RING_4849]))),
         (3, bytearray(wkb_polygon([far])))],
        ["id", "geometry"])
    df.createOrReplaceTempView("geod_mp_t")
    rows = {r["id"]: r["a"] for r in spark.sql(
        "SELECT id, ST_GeodesicArea(geometry) AS a FROM geod_mp_t"
    ).collect()}
    assert rows[1] == pytest.approx(rows[2] + rows[3], rel=1e-12)
    assert rows[1] > rows[2]  # not outer-minus-"hole"
