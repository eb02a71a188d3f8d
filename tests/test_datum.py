"""Datum pipelines (geo/datum.py): Helmert chain + generalized
Krüger TM. Reference: ogr/ogrct.cpp:1018 (PROJ crs-to-crs chain)."""

import numpy as np

from gdal_spark.geo.datum import (
    BNG,
    bng_forward,
    datum_shift,
    geocentric_to_geodetic,
    geodetic_to_geocentric,
    helmert,
    tm_forward,
)


class TestGeocentric:
    def test_roundtrip(self):
        lon = np.array([-1.5, 170.0, 12.25])
        lat = np.array([53.2, -45.0, 0.5])
        x, y, z = geodetic_to_geocentric(lon, lat, 0.0, "WGS84")
        lo, la, h = geocentric_to_geodetic(x, y, z, "WGS84")
        assert np.allclose(lo, lon, atol=1e-12)
        assert np.allclose(la, lat, atol=1e-12)
        assert np.abs(h).max() < 1e-6  # Bowring: sub-micrometre

    def test_equator_radius(self):
        x, y, z = geodetic_to_geocentric(
            np.array([0.0]), np.array([0.0]), 0.0, "WGS84"
        )
        assert abs(x[0] - 6378137.0) < 1e-9
        assert abs(y[0]) < 1e-9 and abs(z[0]) < 1e-9


class TestHelmert:
    def test_forward_inverse_cancel(self):
        p = (446.448, -125.157, 542.060, 0.1502, 0.2470, 0.8421, -20.4894)
        x = np.array([3874938.0])
        y = np.array([116218.0])
        z = np.array([5047168.0])
        x2, y2, z2 = helmert(*helmert(x, y, z, p), p, inverse=True)
        # negated-parameter (linearized) inverse: second-order terms
        # (s^2*R ~ 3 mm at OSGB36's -20.5 ppm scale) bound the error
        assert abs(x2[0] - x[0]) < 0.02
        assert abs(y2[0] - y[0]) < 0.02
        assert abs(z2[0] - z[0]) < 0.02

    def test_shift_magnitude(self):
        # WGS84 -> OSGB36 over Britain is famously ~ 2-4 arcsec
        lo, la, _h = datum_shift(
            np.array([-1.5]), np.array([53.2]), "WGS84", "OSGB36"
        )
        d_arcsec = np.hypot((lo[0] + 1.5) * 3600, (la[0] - 53.2) * 3600)
        assert 1.0 < d_arcsec < 10.0


class TestBritishNationalGrid:
    def test_os_worked_example(self):
        # Ordnance Survey's published TM worked example (OSGB36
        # geographic -> BNG): lat 52d39m27.2531s N, lon 1d43m4.5177s E
        # -> E 651409.903, N 313177.270
        lat = 52 + 39 / 60 + 27.2531 / 3600
        lon = 1 + 43 / 60 + 4.5177 / 3600
        e, n = tm_forward(
            np.array([lon]), np.array([lat]), "OSGB36", BNG["k0"],
            BNG["lon0"], BNG["lat0"], BNG["fe"], BNG["fn"],
        )
        assert abs(e[0] - 651409.903) < 1e-3
        assert abs(n[0] - 313177.270) < 1e-3

    def test_true_origin_maps_to_false_origin(self):
        e, n = tm_forward(
            np.array([BNG["lon0"]]), np.array([BNG["lat0"]]), "OSGB36",
            BNG["k0"], BNG["lon0"], BNG["lat0"], BNG["fe"], BNG["fn"],
        )
        assert abs(e[0] - BNG["fe"]) < 1e-9
        assert abs(n[0] - BNG["fn"]) < 1e-9

    def test_wgs84_pipeline_lands_in_grid(self):
        # Greenwich: BNG easting ~538-539 km, northing ~177 km
        e, n = bng_forward(np.array([0.0]), np.array([51.4769]))
        assert 535000 < e[0] < 542000
        assert 172000 < n[0] < 182000
