"""Linear referencing (geo/lineref.py) — Spark Column math vs the
numpy reference kernels, plus Project/Value inversion invariants."""

import numpy as np
import pytest

from gdal_spark.geo import lineref as lr


@pytest.fixture(scope="module")
def path():
    return lr.demo_path()


def test_demo_path_general_position(path):
    assert len(path) == 9
    assert (np.diff(path[:, 0]) > 0).all()          # no zero segments
    assert (path * 2 == np.round(path * 2)).all()   # dyadic


def test_project_value_inversion(path):
    L = lr.path_length(path)
    for m in np.linspace(0.05, 0.95, 19) * L:
        x, y = lr.np_value(path, float(m))
        dist, seg, cx, cy = lr.np_project(path, [x], [y])
        assert abs(dist[0] - m) < 1e-9
        assert abs(cx[0] - x) < 1e-9 and abs(cy[0] - y) < 1e-9


def test_value_clamps(path):
    assert lr.np_value(path, -5.0) == (path[0, 0], path[0, 1])
    assert lr.np_value(path, 1e9) == (path[-1, 0], path[-1, 1])


def test_subline_endpooints_and_vertices(path):
    L = lr.path_length(path)
    sub = lr.np_subline(path, 0.1 * L, 0.8 * L)
    assert np.allclose(sub[0], lr.np_value(path, 0.1 * L))
    assert np.allclose(sub[-1], lr.np_value(path, 0.8 * L))
    # interior rows are exact path vertices, in order
    a, _, _, _, seglen, cum = lr._segs(path)
    inner = sub[1:-1]
    for v in inner:
        assert any(np.array_equal(v, p) for p in path)
    # monotone measure along the result
    d, _, _, _ = lr.np_project(path, sub[:, 0], sub[:, 1])
    assert (np.diff(d) > 0).all()


def test_locate_points_matches_numpy(spark, path):
    rng = [(i, float(px), float(py)) for i, (px, py) in enumerate(
        zip(np.linspace(-2, 70, 31), ((np.arange(31) * 7) % 23) - 5.0))]
    df = spark.createDataFrame(rng, "i long, px double, py double")
    got = {r["i"]: r for r in lr.locate_points(df, path).collect()}
    px = np.array([r[1] for r in rng])
    py = np.array([r[2] for r in rng])
    dist, seg, cx, cy = lr.np_project(path, px, py)
    for i in range(len(rng)):
        assert got[i]["seg"] == seg[i]
        assert abs(got[i]["dist"] - dist[i]) < 1e-12
        assert abs(got[i]["cx"] - cx[i]) < 1e-12
        assert abs(got[i]["cy"] - cy[i]) < 1e-12


def test_subline_rows_matches_numpy(spark, path):
    L = lr.path_length(path)
    cases = [(k, 0.03 * k * L, min(L, (0.03 * k + 0.21) * L))
             for k in range(1, 25)]
    df = spark.createDataFrame(cases, "i long, m_from double, m_to double")
    out = lr.subline_rows(df, path).collect()
    by_i = {}
    for r in out:
        by_i.setdefault(r["i"], {})[r["vtx"]] = (r["x"], r["y"])
    for k, mf, mt in cases:
        want = lr.np_subline(path, mf, mt)
        rows = by_i[k]
        assert sorted(rows) == list(range(len(want)))
        for v in range(len(want)):
            assert abs(rows[v][0] - want[v][0]) < 1e-12
            assert abs(rows[v][1] - want[v][1]) < 1e-12


def test_subline_zero_start_duplicates_origin(path):
    """Reference quirk (ogrlinestring.cpp:2256): dfDistanceFrom == 0
    emits vertex 0, then the add-points loop restarts at i=0 and emits
    it AGAIN — the subline starts with a duplicated origin vertex."""
    L = lr.path_length(path)
    sub = lr.np_subline(path, 0.0, 0.55 * L)
    assert np.array_equal(sub[0], path[0])
    assert np.array_equal(sub[1], path[0])          # the duplicate
    assert not np.array_equal(sub[2], path[0])
    assert np.allclose(sub[-1], lr.np_value(path, 0.55 * L))


def test_subline_rows_zero_start_matches_numpy(spark, path):
    """Spark subline_rows must mirror np_subline (and the reference)
    at the m_from == 0 boundary, duplicate origin included."""
    L = lr.path_length(path)
    cases = [(1, 0.0, 0.55 * L), (2, 0.0, 0.07 * L), (3, 0.0, L),
             (4, 0.2 * L, 0.9 * L)]
    df = spark.createDataFrame(cases, "i long, m_from double, m_to double")
    out = lr.subline_rows(df, path).collect()
    by_i = {}
    for r in out:
        by_i.setdefault(r["i"], {})[r["vtx"]] = (r["x"], r["y"])
    for k, mf, mt in cases:
        want = lr.np_subline(path, mf, mt)
        rows = by_i[k]
        assert sorted(rows) == list(range(len(want)))
        for v in range(len(want)):
            assert abs(rows[v][0] - want[v][0]) < 1e-12
            assert abs(rows[v][1] - want[v][1]) < 1e-12


def test_sql_subline_rows_zero_start_matches_numpy(path):
    """DuckDB twin at the m_from == 0 boundary — same duplicate."""
    import duckdb

    L = lr.path_length(path)
    cases = [(1, 0.0, 0.55 * L), (2, 0.0, L), (3, 0.35 * L, 0.8 * L)]
    m_cte = " UNION ALL ".join(
        f"SELECT {i} AS i, cast({mf!r} as double) AS m_from, "
        f"cast({mt!r} as double) AS m_to" for i, mf, mt in cases)
    sql = ("WITH " + lr.sql_subline_rows(path, m_cte)
           + " SELECT i, vtx, x, y FROM sub ORDER BY i, vtx")
    got = duckdb.sql(sql).fetchall()
    by_i = {}
    for i, vtx, x, y in got:
        by_i.setdefault(i, {})[vtx] = (x, y)
    for k, mf, mt in cases:
        want = lr.np_subline(path, mf, mt)
        rows = by_i[k]
        assert sorted(rows) == list(range(len(want)))
        for v in range(len(want)):
            assert abs(rows[v][0] - want[v][0]) < 1e-12
            assert abs(rows[v][1] - want[v][1]) < 1e-12


def test_st_lineref_functions_sql(spark, path):
    from gdal_spark.geo.st_functions import register_st_functions
    from gdal_spark.geo.wkb import parse_wkb, wkb_linestring

    register_st_functions(spark)
    df = spark.createDataFrame(
        [(1, bytearray(wkb_linestring(path)))], ["id", "geometry"])
    df.createOrReplaceTempView("lines")
    L = lr.path_length(path)
    row = spark.sql(f"""
        SELECT ST_LineLocatePoint(geometry, 3.0, 14.0) AS at_start,
               ST_LineInterpolatePoint(geometry, {L / 2!r}) AS mid,
               ST_LineSubstring(geometry, {0.1 * L!r}, {0.6 * L!r}) AS sub
        FROM lines
    """).collect()[0]
    assert row["at_start"] == 0.0
    mx, my = lr.np_value(path, L / 2)
    g = parse_wkb(bytes(row["mid"]))
    assert abs(g.parts[0][0][0] - mx) < 1e-12
    assert abs(g.parts[0][0][1] - my) < 1e-12
    sub = parse_wkb(bytes(row["sub"])).parts[0]
    want = lr.np_subline(path, 0.1 * L, 0.6 * L)
    assert np.allclose(sub, want, atol=1e-12)


from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=30, deadline=None)
@given(seed=st.integers(0, 2**31 - 1), n_vert=st.integers(2, 7),
       px=st.integers(-40, 200), py=st.integers(-80, 80))
def test_project_matches_dense_bruteforce(seed, n_vert, px, py):
    """np_project vs a dense parameterization: the projected distance
    must be within one sample step of the dense minimum, and its
    distance-to-line never worse."""
    rng = np.random.RandomState(seed)
    pts = np.cumsum(rng.randint(1, 9, size=(n_vert, 2)), axis=0) * 0.5
    path = pts.astype(np.float64)
    p = np.array([px * 0.5, py * 0.5])
    dist, seg, cx, cy = lr.np_project(path, [p[0]], [p[1]])
    got_d2 = (p[0] - cx[0]) ** 2 + (p[1] - cy[0]) ** 2
    # dense brute force along the polyline
    a, b, d, l2, seglen, cum = lr._segs(path)
    best = np.inf
    best_m = 0.0
    for i in range(len(seglen)):
        for t in np.linspace(0.0, 1.0, 2001):
            x = a[i, 0] + t * d[i, 0]
            y = a[i, 1] + t * d[i, 1]
            dd = (p[0] - x) ** 2 + (p[1] - y) ** 2
            if dd < best:
                best, best_m = dd, cum[i] + t * seglen[i]
    assert got_d2 <= best + 1e-9
    assert abs(dist[0] - best_m) < max(2.0 * seglen.max() / 2000, 1e-6)
