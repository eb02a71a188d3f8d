"""GCP / TPS / RPC transformer tests (alg/gdal_crs.cpp,
thinplatespline.cpp, gdal_rpc.cpp analogs)."""

import numpy as np

from gdal_spark.geo.gcp import apply_gcp_polynomial, fit_gcp_polynomial
from gdal_spark.geo.rpc import rpc_forward, rpc_inverse
from gdal_spark.geo.tps import apply_tps, fit_tps


def test_gcp_orders_recover_exact_polynomials():
    k = np.arange(12)
    px = (k * 17) % 97
    py = (k * 29) % 89
    for order, fx in (
        (1, lambda x, y: 10 + 2 * x - 3 * y),
        (2, lambda x, y: 1 + x + y + x * x - y * y + x * y),
    ):
        cx, cy = fit_gcp_polynomial(px, py, fx(px, py), fx(py, px), order)
        qx = np.arange(50.0)
        qy = (qx * 3) % 61
        gx, gy = apply_gcp_polynomial(cx, cy, qx, qy)
        assert np.abs(gx - fx(qx, qy)).max() < 1e-8
        assert np.abs(gy - fx(qy, qx)).max() < 1e-8


def test_tps_interpolates_controls_and_affine():
    rng = np.random.default_rng(5)
    px = rng.uniform(0, 100, 14)
    py = rng.uniform(0, 100, 14)
    v = rng.uniform(0, 10, 14)
    m = fit_tps(px, py, v)
    assert np.abs(apply_tps(m, px, py) - v).max() < 1e-9  # exact interp
    m2 = fit_tps(px, py, 7 + 2 * px - 3 * py)
    qx = rng.uniform(0, 100, 40)
    qy = rng.uniform(0, 100, 40)
    assert np.abs(apply_tps(m2, qx, qy) - (7 + 2 * qx - 3 * qy)).max() < 1e-9


def test_tps_is_nonlinear_between_controls():
    px = np.array([0.0, 10, 0, 10, 5])
    py = np.array([0.0, 0, 10, 10, 5])
    v = np.array([0.0, 0, 0, 0, 5])  # bump in the middle
    m = fit_tps(px, py, v)
    assert abs(apply_tps(m, np.array([5.0]), np.array([5.0]))[0] - 5) < 1e-9
    assert apply_tps(m, np.array([2.5]), np.array([2.5]))[0] > 0.5


def test_rpc_forward_inverse_roundtrip_with_denominators():
    rng = np.random.default_rng(7)
    sn = np.zeros(20); sn[1] = 1.0; sn[4] = 0.02; sn[7] = 0.01
    ln = np.zeros(20); ln[2] = -1.0; ln[8] = 0.015; ln[5] = 0.01
    sd = np.zeros(20); sd[0] = 1.0; sd[2] = 0.002
    ld = np.zeros(20); ld[0] = 1.0; ld[1] = 0.001
    co = {
        "long_off": 10.0, "long_scale": 1.0, "lat_off": 45.0, "lat_scale": 1.0,
        "height_off": 0.0, "height_scale": 100.0,
        "samp_off": 5000.0, "samp_scale": 5000.0,
        "line_off": 5000.0, "line_scale": 5000.0,
        "samp_num_coeff": sn, "line_num_coeff": ln,
        "samp_den_coeff": sd, "line_den_coeff": ld,
    }
    lon = 10 + rng.uniform(-0.5, 0.5, 30)
    lat = 45 + rng.uniform(-0.5, 0.5, 30)
    px, ln_ = rpc_forward(co, lon, lat, 0.0)
    lon2, lat2 = rpc_inverse(co, px, ln_, 0.0)
    assert np.abs(lon2 - lon).max() < 1e-9
    assert np.abs(lat2 - lat).max() < 1e-9


def test_homography_dlt_recovers_integer_matrix():
    from gdal_spark.geo.homography import apply_homography, fit_homography

    H = np.array([[3, 1, 7], [1, 2, 9], [1, 1, 8]], dtype=np.float64)
    k = np.arange(10)
    gx = ((k * 13) % 23).astype(np.float64)
    gy = ((k * 19) % 29).astype(np.float64)
    den = gx + gy + 8
    dx = (3 * gx + gy + 7) / den
    dy = (gx + 2 * gy + 9) / den
    fit = fit_homography(gx, gy, dx, dy)
    assert np.abs(np.rint(fit * 8) - H).max() == 0
    qx = np.arange(40.0)
    qy = (qx * 3) % 31
    ex, ey = apply_homography(H / 8, qx, qy)
    gx2, gy2 = apply_homography(fit, qx, qy)
    assert np.abs(gx2 - ex).max() < 1e-9 and np.abs(gy2 - ey).max() < 1e-9


def test_lcc_forward_inverse_and_origin():
    from gdal_spark.geo import crs

    lon = np.array([-100.0, -96.0, -90.5, -120.0])
    lat = np.array([35.0, 40.2, 44.9, 25.0])
    x, y = crs.lcc_forward(lon, lat, 33.0, 45.0, 39.0, -96.0)
    lon2, lat2 = crs.lcc_inverse(x, y, 33.0, 45.0, 39.0, -96.0)
    assert np.abs(lon2 - lon).max() < 1e-10
    assert np.abs(lat2 - lat).max() < 1e-10
    # false origin: (lat0, lon0) -> (0, 0); central meridian -> x = 0
    x0, y0 = crs.lcc_forward(np.array([-96.0]), np.array([39.0]), 33.0, 45.0, 39.0, -96.0)
    assert abs(x0[0]) < 1e-6 and abs(y0[0]) < 1e-6
    xm, _ = crs.lcc_forward(np.array([-96.0]), np.array([44.0]), 33.0, 45.0, 39.0, -96.0)
    assert abs(xm[0]) < 1e-6
    # standard parallels are distortion-free: local scale ~ 1
    for lat_sp in (33.0, 45.0):
        e = 1e-6
        xa, ya = crs.lcc_forward(np.array([-96.0 + e]), np.array([lat_sp]), 33.0, 45.0, 39.0, -96.0)
        ground = np.radians(e) * crs.WGS84_A * np.cos(np.radians(lat_sp)) / np.sqrt(
            1 - crs.LCC_E**2 * np.sin(np.radians(lat_sp)) ** 2
        )
        assert abs(xa[0] / ground - 1.0) < 1e-6
