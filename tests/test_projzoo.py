"""Projection zoo (gdal_spark/geo/projzoo.py): published worked
examples (Snyder 1987; EPSG Guidance Note 7-2), forward/inverse
roundtrips, SQL-twin agreement, and registry dispatch.

Reference conformance surface: /root/reference/autotest/osr/osr_ct.py
(the reference itself delegates to PROJ, ogr/ogrct.cpp:1018)."""

import math

import duckdb
import numpy as np
import pytest

from gdal_spark.geo import projzoo as pz


def test_albers_snyder_worked_example():
    # Snyder p.292 (ellipsoidal Albers, Clarke 1866): lat1=29.5,
    # lat2=45.5, lat0=23, lon0=-96; (35N, 75W) -> 1885472.7, 1535925.0
    x, y = pz.albers_forward(-75.0, 35.0, "NAD27", 29.5, 45.5, 23.0, -96.0)
    assert abs(x - 1885472.7) < 0.1
    assert abs(y - 1535925.0) < 0.1


def test_polar_stereo_epsg_worked_example():
    # EPSG GN7-2 Polar Stereographic variant B example (EPSG:3032
    # parameters): latF=-71, lon0=70E, FE=FN=6000000;
    # (75S, 120E) -> E 7255380.79, N 7053389.56
    x, y = pz.polar_stereo_forward(
        120.0, -75.0, "WGS84", -71.0, 70.0, 6000000.0, 6000000.0
    )
    assert abs(x - 7255380.79) < 0.02
    assert abs(y - 7053389.56) < 0.02


def test_oblique_stereo_epsg_worked_example():
    # EPSG GN7-2 Oblique Stereographic example (Amersfoort / RD New):
    # (53N, 6E) -> E 196105.283, N 557057.739
    d = pz.REGISTRY[28992]
    x, y = pz.oblique_stereo_forward(6.0, 53.0, d.datum, **d.params)
    assert abs(x - 196105.283) < 0.002
    assert abs(y - 557057.739) < 0.002


def test_sinusoidal_snyder_worked_example():
    # Snyder p.365 (ellipsoidal sinusoidal, Clarke 1866): lon0=-90;
    # (50S, 75W) -> x 1075471.5, y -5540628.0
    x, y = pz.sinusoidal_forward(-75.0, -50.0, "NAD27", lon0=-90.0)
    assert abs(x - 1075471.5) < 0.1
    assert abs(y - (-5540628.0)) < 0.1


def test_quarter_meridian():
    # WGS84 quarter meridian = 10001965.7293 m (well-known constant)
    a, _e, e2 = pz.ell_consts("WGS84")
    assert abs(pz.merid_arc(np.pi / 2.0, a, e2) - 10001965.7293) < 1e-3


def test_eqc_epsg_worked_example():
    # EPSG method 1028: WGS84, lat1=0, lon0=0; (55N, 10E) ->
    # E 1113194.91, N 6097230.31
    x, y = pz.eqc_forward(10.0, 55.0, "WGS84")
    assert abs(x - 1113194.91) < 0.02
    assert abs(y - 6097230.31) < 0.02


@pytest.mark.parametrize(
    "code,lon,lat",
    [
        (5070, -100.0, 40.0),
        (3031, 45.0, -70.0),
        (3413, -100.0, 75.0),
        (28992, 5.5, 52.0),
        ("ESRI:54008", 123.0, -33.0),
        (4087, -77.0, 12.0),
        (32631, 3.0, 48.0),
        (32733, 15.0, -20.0),
    ],
)
def test_forward_inverse_roundtrip(code, lon, lat):
    x, y = pz.forward(code, lon, lat)
    lon2, lat2 = pz.inverse(code, x, y)
    assert abs(lon2 - lon) < 1e-8
    assert abs(lat2 - lat) < 1e-8


def test_reproject_crosses_datums():
    # 4326 -> 28992 must include the Amersfoort Helmert: the naive
    # no-datum projection differs by tens of meters
    x, y = pz.reproject(5.38763888888889, 52.15616055555555, 4326, 28992)
    d = pz.REGISTRY[28992]
    x0, y0 = pz.oblique_stereo_forward(
        5.38763888888889, 52.15616055555555, d.datum, **d.params
    )
    shift = math.hypot(x - x0, y - y0)
    assert 10.0 < shift < 200.0
    # and the chain roundtrips through the inverse + back-shift
    lon, lat = pz.inverse(28992, np.float64(x), np.float64(y))
    from gdal_spark.geo.datum import datum_shift

    lon2, lat2, _h = datum_shift(lon, lat, "AMERSFOORT", "WGS84")
    assert abs(lon2 - 5.38763888888889) < 1e-7
    assert abs(lat2 - 52.15616055555555) < 1e-7


def test_projected_to_projected_chain():
    x0, y0 = pz.forward(4087, 10.0, 55.0)
    x1, y1 = pz.reproject(x0, y0, 4087, "ESRI:54008")
    xs, ys = pz.forward("ESRI:54008", 10.0, 55.0)
    # inv_merid series truncation only — well under a meter
    assert abs(x1 - xs) < 0.01
    assert abs(y1 - ys) < 0.01


@pytest.mark.parametrize(
    "code,lon,lat",
    [
        (5070, -75.0, 35.0),
        (3031, 120.0, -75.0),
        (3413, -45.0, 80.0),
        (28992, 6.0, 53.0),
        ("ESRI:54008", -75.0, -50.0),
        (4087, 10.0, 55.0),
    ],
)
def test_sql_forward_twin_agrees(code, lon, lat):
    xs, ys = pz.sql_forward(code, repr(lon), repr(lat))
    dx, dy = duckdb.sql(f"SELECT {xs}, {ys}").fetchone()
    nx, ny = pz.forward(code, lon, lat)
    assert abs(dx - float(nx)) < 1e-6
    assert abs(dy - float(ny)) < 1e-6


@pytest.mark.parametrize("code", [3031, 3413, 4087, "ESRI:54008"])
def test_sql_inverse_twin_agrees(code):
    x, y = pz.forward(code, 20.0, -70.0 if code == 3031 else 70.0)
    xs, ys = pz.sql_inverse(code, repr(float(x)), repr(float(y)))
    dlon, dlat = duckdb.sql(f"SELECT {xs}, {ys}").fetchone()
    nlon, nlat = pz.inverse(code, float(x), float(y))
    assert abs(dlon - float(nlon)) < 1e-9
    assert abs(dlat - float(nlat)) < 1e-9


def test_albers_equal_area_property():
    # a 1-degree quad at two very different latitudes maps to (nearly)
    # identical ellipsoidal areas — the defining property of 9822
    def quad_area(lat):
        lons = np.array([-100.0, -99.0, -99.0, -100.0])
        lats = np.array([lat, lat, lat + 1.0, lat + 1.0])
        x, y = pz.forward(5070, lons, lats)
        return 0.5 * abs(
            np.sum(x * np.roll(y, -1) - np.roll(x, -1) * y)
        )

    # planar quad areas approximate the ellipsoidal ones to ~1e-4;
    # compare against the cos(lat) scaling a non-equal-area map has
    a30, a45 = quad_area(30.0), quad_area(45.0)
    ratio = a45 / a30
    expected = math.cos(math.radians(45.5)) / math.cos(math.radians(30.5))
    assert abs(ratio - expected) < 0.01


def test_unknown_code_raises():
    with pytest.raises(KeyError):
        pz.forward(999999, 0.0, 0.0)


# ---------------------------------------------------------------------------
# round-4 tail: Mercator 1SP + UPS (polar stereographic variant A)
# ---------------------------------------------------------------------------

def test_ups_epsg_worked_example():
    # EPSG GN7-2 Polar Stereographic variant A example (UPS North,
    # k0 = 0.994): (73N, 44E) -> E 3320416.75, N 632668.43
    x, y = pz.forward(5041, 44.0, 73.0)
    assert abs(x - 3320416.75) < 0.02
    assert abs(y - 632668.43) < 0.02


def test_mercator_1sp_epsg_worked_example():
    # EPSG GN7-2 Mercator 1SP example (Makassar / NEIEZ, Bessel,
    # k0 = 0.997, lon0 = 110E, FE = 3900000, FN = 900000):
    # (3S, 120E) -> E 5009726.58, N 569150.82
    x, y = pz.mercator_forward(
        120.0, -3.0, "AMERSFOORT", k0=0.997, lon0=110.0,
        fe=3900000.0, fn=900000.0,
    )
    assert abs(x - 5009726.58) < 0.02
    assert abs(y - 569150.82) < 0.02


@pytest.mark.parametrize(
    "code,lon,lat",
    [(3395, 10.0, 55.0), (5041, -50.0, 75.0), (5042, 120.0, -75.0)],
)
def test_mercator_ups_roundtrip_and_sql(code, lon, lat):
    import duckdb as dd

    x, y = pz.forward(code, lon, lat)
    lon2, lat2 = pz.inverse(code, float(x), float(y))
    assert abs(lon2 - lon) < 1e-9 and abs(lat2 - lat) < 1e-9
    xs, ys = pz.sql_forward(code, repr(lon), repr(lat))
    dx, dy = dd.sql(f"SELECT {xs}, {ys}").fetchone()
    assert abs(dx - float(x)) < 1e-7 and abs(dy - float(y)) < 1e-7


def test_world_mercator_differs_from_webmerc():
    # 3395 is ellipsoidal — at 55N it sits ~20 km south of 3857
    _x1, y1 = pz.forward(3395, 0.0, 55.0)
    _x2, y2 = pz.forward(3857, 0.0, 55.0)
    assert 15000 < (y2 - y1) < 40000


def test_bng_via_registry_matches_datum_pipeline():
    # reproject(4326 -> 27700) through the registry == the dedicated
    # bng_forward Helmert+Airy-TM pipeline (oracle bng_transform)
    from gdal_spark.geo.datum import bng_forward

    lons = np.array([-3.0, -1.2, 0.5])
    lats = np.array([51.0, 53.4, 55.9])
    x1, y1 = pz.reproject(lons, lats, 4326, 27700)
    x2, y2 = bng_forward(lons, lats)
    assert np.max(np.abs(x1 - x2)) < 1e-9
    assert np.max(np.abs(y1 - y2)) < 1e-9
    # and the registry inverse undoes the projection on OSGB36
    lon_o, lat_o = pz.inverse(27700, x1, y1)
    from gdal_spark.geo.datum import datum_shift

    lon_w, lat_w, _h = datum_shift(lon_o, lat_o, "OSGB36", "WGS84")
    assert np.max(np.abs(lon_w - lons)) < 1e-7
    assert np.max(np.abs(lat_w - lats)) < 1e-7


def test_resolve_crs_user_inputs():
    assert pz.resolve_crs("EPSG:3031") == 3031
    assert pz.resolve_crs(5070) == 5070
    assert pz.resolve_crs("ESRI:54008") == "ESRI:54008"
    assert pz.resolve_crs("+proj=utm +zone=31") == 32631
    assert pz.resolve_crs("+proj=utm +zone=33 +south") == 32733
    assert pz.resolve_crs("+proj=merc +k_0=1.0") == 3395
    assert pz.resolve_crs("+proj=longlat") == 4326
    assert pz.resolve_crs("+proj=sinu") == "ESRI:54008"
    assert pz.resolve_crs(
        "+proj=aea +lat_1=29.5 +lat_2=45.5 +lat_0=23 +lon_0=-96"
    ) == 5070
    with pytest.raises(KeyError):
        pz.resolve_crs("+proj=krovak")
    with pytest.raises(KeyError):
        pz.resolve_crs("EPSG:999999")
    # reproject accepts the string forms end-to-end
    x1, y1 = pz.reproject(10.0, 55.0, "EPSG:4326", "+proj=merc +k_0=1.0")
    x2, y2 = pz.forward(3395, 10.0, 55.0)
    assert float(x1) == float(x2) and float(y1) == float(y2)


def test_laea_epsg_worked_example():
    # EPSG GN7-2 LAEA example (ETRS89 / LAEA Europe parameters):
    # (50N, 5E) -> E 3962799.45, N 2999718.85
    x, y = pz.forward(3035, np.array([5.0]), np.array([50.0]))
    assert abs(x[0] - 3962799.45) < 0.01
    assert abs(y[0] - 2999718.85) < 0.01


@pytest.mark.parametrize(
    "code,lon_rng,lat_rng",
    [
        (3035, (-60.0, 80.0), (5.0, 84.0)),
        (6933, (-179.0, 179.0), (-84.0, 84.0)),
        ("ESRI:54009", (-178.0, 178.0), (-84.0, 84.0)),
    ],
)
def test_equal_area_roundtrips(code, lon_rng, lat_rng):
    rng = np.random.default_rng(17)
    lons = rng.uniform(*lon_rng, 500)
    lats = rng.uniform(*lat_rng, 500)
    x, y = pz.forward(code, lons, lats)
    lon2, lat2 = pz.inverse(code, x, y)
    # authalic beta->phi series truncation bounds the ellipsoidal
    # inverses at ~1e-8 deg (~1 mm); Mollweide is spherical-exact
    assert np.max(np.abs(lon2 - lons)) < 1e-7
    assert np.max(np.abs(lat2 - lats)) < 1e-7


@pytest.mark.parametrize("code,lon0,lat0", [(6933, 10.0, 40.0),
                                            (3035, 12.0, 52.0),
                                            (3035, -40.0, 20.0)])
def test_equal_area_jacobian(code, lon0, lat0):
    # |d(x,y)/d(lam,phi)| must equal the ellipsoidal area element
    # a^2 (1-e^2) cos(phi) / (1 - e^2 sin^2 phi)^2 everywhere
    a, _e, e2 = pz.ell_consts(pz.crs_datum(code))
    h = 1e-6
    x0, y0 = pz.forward(code, np.array([lon0]), np.array([lat0]))
    x1, y1 = pz.forward(code, np.array([lon0 + h]), np.array([lat0]))
    x2, y2 = pz.forward(code, np.array([lon0]), np.array([lat0 + h]))
    J = ((x1 - x0) * (y2 - y0) - (x2 - x0) * (y1 - y0)) / np.radians(h) ** 2
    phi = math.radians(lat0)
    want = a * a * (1.0 - e2) * math.cos(phi) / (
        1.0 - e2 * math.sin(phi) ** 2) ** 2
    assert abs(J[0] / want - 1.0) < 1e-4


def test_mollweide_landmarks():
    # Snyder 31: x(90E, 0) = sqrt(2) R; y(0, 90N) = sqrt(2) R; and the
    # SQL staged twin agrees with numpy through DuckDB
    a, _e, _e2 = pz.ell_consts("WGS84")
    x, y = pz.forward("ESRI:54009", np.array([90.0, 0.0]),
                      np.array([0.0, 90.0]))
    assert abs(x[0] - math.sqrt(2.0) * a) < 1e-3
    assert abs(y[1] - math.sqrt(2.0) * a) < 200.0  # pole: Newton plateau
    stages, px, py, src = pz.sql_forward_stages(
        "ESRI:54009", "slon", "slat", "pts")
    lons = np.array([-120.0, -30.5, 44.25, 170.0])
    lats = np.array([-70.0, 12.5, 48.0, 83.5])
    rows = ", ".join(f"({i}, {lo!r}, {la!r})"
                     for i, (lo, la) in enumerate(zip(lons, lats)))
    q = (f"WITH raw(i, slon, slat) AS (VALUES {rows}), "
         f"pts AS (SELECT i, cast(slon as double) slon, "
         f"cast(slat as double) slat FROM raw), {stages} "
         f"SELECT {px}, {py} FROM {src} ORDER BY i")
    got = np.array(duckdb.sql(q).fetchall())
    X, Y = pz.forward("ESRI:54009", lons, lats)
    assert np.max(np.abs(got[:, 0] - X)) < 1e-6
    assert np.max(np.abs(got[:, 1] - Y)) < 1e-6


def test_resolve_crs_equal_area_proj4():
    assert pz.resolve_crs(
        "+proj=laea +lat_0=52 +lon_0=10 +x_0=4321000 +y_0=3210000"
    ) == 3035
    assert pz.resolve_crs("+proj=cea +lat_ts=30") == 6933
    assert pz.resolve_crs("+proj=moll") == "ESRI:54009"


def test_to_proj4_roundtrip_every_registry_entry():
    # exportToProj4 parity: every entry round-trips except the one
    # documented proj4-level ambiguity (ETRS89 == NAD83 in proj4
    # terms; NAD83 wins by registry order)
    for key in pz.REGISTRY:
        back = pz.resolve_crs(pz.to_proj4(key))
        if key == 4258:
            assert back == 4269
        else:
            assert back == key, (key, back)


def test_homerc_epsg_worked_example():
    # EPSG 7-2 method 9815 (Timbalai 1948 / RSO Borneo):
    # 5°23'14.1129"N 115°48'19.8196"E -> E 679245.73, N 596562.78
    phi = 5 + 23 / 60 + 14.1129 / 3600
    lam = 115 + 48 / 60 + 19.8196 / 3600
    x, y = pz.forward(29873, lam, phi)
    assert abs(x - 679245.73) < 0.01
    assert abs(y - 596562.78) < 0.01


def test_homerc_swiss_centre_exact():
    # LV95 projection centre (Bern) maps exactly to FE/FN
    x, y = pz.forward(2056, 7.439583333333333, 46.952405555555565)
    assert abs(x - 2600000.0) < 1e-6
    assert abs(y - 1200000.0) < 1e-6


def test_krovak_epsg_worked_example():
    # EPSG 7-2 method 9819: 50°12'32.4416"N 16°50'59.1790"E ->
    # southing 1050538.63, westing 568990.97 (East-North: negated).
    # PROJ's fixed Czech constants differ from the EPSG worked
    # rounding at the few-cm level.
    phi = 50 + 12 / 60 + 32.4416 / 3600
    lam = 16 + 50 / 60 + 59.1790 / 3600
    x, y = pz.forward(5514, lam, phi)
    assert abs(x - -568990.97) < 0.05
    assert abs(y - -1050538.63) < 0.05


@pytest.mark.parametrize(
    "code,lon,lat",
    [
        (2056, 8.5, 47.4),     # Zurich
        (2056, -10.0, 30.0),   # far field stays invertible
        (29873, 117.0, 5.5),
        (5514, 14.42, 50.09),  # Prague
        (5514, 21.0, 44.5),
    ],
)
def test_homerc_krovak_roundtrip(code, lon, lat):
    x, y = pz.forward(code, lon, lat)
    lon2, lat2 = pz.inverse(code, x, y)
    assert abs(lon2 - lon) < 1e-9
    assert abs(lat2 - lat) < 1e-9


@pytest.mark.parametrize("code,lon,lat", [(2056, 9.0, 46.0), (5514, 17.0, 49.2)])
def test_homerc_krovak_sql_stage_twin(code, lon, lat):
    stages, xs, ys, src = pz.sql_forward_stages(
        code, "lon", "lat", "pts", keep="i")
    sql = (
        f"WITH pts AS (SELECT 1 AS i, {lon!r} AS lon, {lat!r} AS lat),\n"
        f"{stages}\nSELECT {xs}, {ys} FROM {src}"
    )
    dx, dy = duckdb.sql(sql).fetchone()
    nx, ny = pz.forward(code, lon, lat)
    assert abs(dx - float(nx)) < 1e-6
    assert abs(dy - float(ny)) < 1e-6


def test_cassini_trinidad_worked_example():
    """EPSG Guidance 7-2 §3.2.2 (Trinidad 1903 / Trinidad Grid,
    Clarke's links): phi 10°N lam 62°W -> E 66644.94 N 82536.22."""
    import numpy as np

    x, y = pz.forward(30200, np.array([-62.0]), np.array([10.0]))
    assert abs(x[0] - 66644.94) < 0.01
    assert abs(y[0] - 82536.22) < 0.01
    lon, lat = pz.inverse(30200, x, y)
    assert abs(lon[0] + 62.0) < 1e-9 and abs(lat[0] - 10.0) < 1e-7


def test_cassini_properties():
    import numpy as np

    d = pz.REGISTRY[30200]
    p = d.params
    # central meridian maps to x = FE exactly (A = 0)
    x, y = pz.forward(30200, np.array([p["lon0"]]), np.array([25.0]))
    assert abs(x[0] - p["fe"]) < 1e-6
    # origin maps to (FE, FN)
    x, y = pz.forward(30200, np.array([p["lon0"]]), np.array([p["lat0"]]))
    assert abs(x[0] - p["fe"]) < 1e-6 and abs(y[0] - p["fn"]) < 1e-6
    # forward∘inverse identity: the EPSG series are truncated at A^5,
    # so the residual grows with distance from the central meridian —
    # sub-mm within ±2° of lon0, ~cm-level by ±5° (still far inside
    # the method's use envelope)
    # (the inverse-meridian rectifying series itself carries ~3e-8°;
    # at ±5° the truncated D^4/A^5 terms reach ~1.5e-6° at ±55° lat —
    # the EPSG series are specified for narrow Cassini zones like
    # Trinidad's ~2°)
    for span, tol in ((2.0, 1e-7), (5.0, 5e-6)):
        lons = np.linspace(p["lon0"] - span, p["lon0"] + span, 15)
        lats = np.linspace(-55.0, 55.0, 23)
        LO, LA = np.meshgrid(lons, lats)
        X, Y = pz.forward(30200, LO.ravel(), LA.ravel())
        lo2, la2 = pz.inverse(30200, X, Y)
        assert np.abs(lo2 - LO.ravel()).max() < tol
        assert np.abs(la2 - LA.ravel()).max() < tol


def test_cassini_proj4_and_wkt_roundtrip():
    s = pz.to_proj4(30200)
    assert "+proj=cass" in s and "+a=" in s    # no proj4 ellps alias
    assert pz.resolve_crs(s) == 30200
    from gdal_spark.geo.wktcrs import to_wkt, wkt_to_crs

    w = to_wkt(30200)
    assert "Cassini_Soldner" in w and "Trinidad_1903" in w
    assert wkt_to_crs(w) == 30200
