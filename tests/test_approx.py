"""GDALApproxTransformer dual (geo/approx.py): bounded error at a
fraction of the exact-transform cost (alg/gdaltransformer.cpp)."""

import numpy as np

from gdal_spark.geo.approx import ApproxStats, approx_transform_row
from gdal_spark.geo.tps import apply_tps, fit_tps


def _tps_tf():
    rng = np.random.default_rng(8)
    px = rng.uniform(0, 1000, 12)
    py = rng.uniform(0, 1000, 12)
    mx = fit_tps(px, py, px * 1.5 + rng.normal(0, 3.0, 12))
    my = fit_tps(px, py, py * 0.8 + rng.normal(0, 3.0, 12))

    def tf(xs, ys):
        return apply_tps(mx, xs, ys), apply_tps(my, xs, ys)

    return tf


def test_error_bounded_and_cheaper():
    tf = _tps_tf()
    stats = ApproxStats()
    W = 2048
    X, Y = approx_transform_row(tf, 500.0, 0, W - 1, threshold=0.125,
                                stats=stats)
    xs = np.arange(W, dtype=np.float64)
    EX, EY = tf(xs, np.full(W, 500.0))
    # the contract: threshold-bounded AT the probed midpoints, small
    # multiple of it between probes (the reference's documented
    # approximation caveat — same failure mode)
    assert np.abs(X - EX).max() <= 3 * 0.125
    assert np.abs(Y - EY).max() <= 3 * 0.125
    assert np.median(np.abs(X - EX)) <= 0.125
    # and far fewer exact evaluations than pixels
    assert stats.exact_points < W / 4, stats.exact_points
    # exact values land at the probes (endpoints at least).  NOT a
    # bitwise check: apply_tps reduces via BLAS, whose summation
    # blocking depends on batch shape (2-point probe vs 2048-point
    # reference) and thread weather — last-ulp differences are
    # expected between batchings of the same exact transform.
    assert abs(X[0] - EX[0]) < 1e-6 and abs(X[-1] - EX[-1]) < 1e-6


def test_tight_threshold_degrades_to_exact():
    tf = _tps_tf()
    stats = ApproxStats()
    X, Y = approx_transform_row(tf, 100.0, 0, 255, threshold=1e-12,
                                stats=stats)
    xs = np.arange(256, dtype=np.float64)
    EX, EY = tf(xs, np.full(256, 100.0))
    # with an impossible tolerance everything subdivides to exact
    assert np.abs(X - EX).max() <= 1e-9
    assert np.abs(Y - EY).max() <= 1e-9


def test_affine_is_two_point_exact():
    def tf(xs, ys):
        return 2.0 * xs + 1.0, ys - 3.0

    stats = ApproxStats()
    X, Y = approx_transform_row(tf, 7.0, 0, 9999, threshold=0.125,
                                stats=stats)
    assert np.allclose(X, 2.0 * np.arange(10000) + 1.0)
    assert np.allclose(Y, 4.0)
    # one endpoint batch + one midpoint batch
    assert stats.exact_points <= 4, stats.exact_points


def test_short_rows_exact():
    def tf(xs, ys):
        return xs * xs, ys

    X, Y = approx_transform_row(tf, 0.0, 5, 7, threshold=0.125)
    assert list(X) == [25.0, 36.0, 49.0]
