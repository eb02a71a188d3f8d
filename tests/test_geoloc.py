"""Geolocation-array transformer (gdal_spark/geo/geoloc.py).

Reference: /root/reference/alg/gdalgeoloc.cpp (bilinear forward +
backmap inverse); /root/reference/autotest/alg/transformgeoloc.py."""

import numpy as np

from gdal_spark.geo.geoloc import (
    GeolocArrays,
    apply_geoloc,
    build_backmap,
    geoloc_forward,
    geoloc_inverse,
)


def _grid(n=33, step=8.0):
    gj, gi = np.meshgrid(
        np.arange(n, dtype=np.float64),
        np.arange(n, dtype=np.float64),
        indexing="ij",
    )
    lon = -120.0 + 0.01 * gi + 0.002 * gj + 0.0001 * gi * gj
    lat = 30.0 + 0.008 * gj + 0.001 * gi - 0.00005 * gi * gj
    return GeolocArrays(lon, lat, 0.0, 0.0, step, step)


def test_forward_at_nodes_is_exact():
    g = _grid()
    # pixel (16, 24) sits exactly on node (2, 3)
    lon, lat = geoloc_forward(g, 16.0, 24.0)
    assert lon == g.lon[3, 2]
    assert lat == g.lat[3, 2]


def test_forward_bilinear_midpoint():
    g = _grid()
    lon, lat = geoloc_forward(g, 4.0, 4.0)  # center of cell (0,0)
    assert abs(lon - 0.25 * (g.lon[0, 0] + g.lon[0, 1]
                             + g.lon[1, 0] + g.lon[1, 1])) < 1e-12
    assert abs(lat - 0.25 * (g.lat[0, 0] + g.lat[0, 1]
                             + g.lat[1, 0] + g.lat[1, 1])) < 1e-12


def test_forward_respects_offsets_and_steps():
    g0 = _grid()
    g = GeolocArrays(g0.lon, g0.lat, 10.0, 20.0, 4.0, 2.0)
    lon0, lat0 = geoloc_forward(g0, 8.0, 8.0)        # grid coord (1,1)
    lon1, lat1 = geoloc_forward(g, 14.0, 22.0)        # same grid coord
    assert lon0 == lon1 and lat0 == lat1


def test_backmap_roundtrip_subpixel():
    g = _grid()
    rng = np.random.default_rng(7)
    px = rng.uniform(20.0, 235.0, 500)
    ln = rng.uniform(20.0, 235.0, 500)
    lon, lat = geoloc_forward(g, px, ln)
    bm = build_backmap(g)
    px2, ln2 = geoloc_inverse(g, lon, lat, backmap=bm)
    # backmap seed + Newton refinement through the forward: for a
    # smooth warp the roundtrip is far sub-pixel
    assert np.nanmax(np.abs(px2 - px)) < 1e-6
    assert np.nanmax(np.abs(ln2 - ln)) < 1e-6


def test_apply_geoloc_matches_numpy(spark):
    g = _grid()
    pts = spark.createDataFrame(
        [(i, float(i * 7 % 250), float(i * 13 % 250)) for i in range(40)],
        "i long, px double, ln double",
    )
    rows = apply_geoloc(pts, g).collect()
    for r in rows:
        lon, lat = geoloc_forward(g, r["px"], r["ln"])
        assert r["lon"] == float(lon)
        assert r["lat"] == float(lat)
