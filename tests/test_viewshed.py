"""Viewshed (Wang/XDraw reference-plane propagation) tests."""

import numpy as np

from gdal_spark.raster.viewshed import viewshed


def test_flat_plane_all_visible():
    v = viewshed(np.zeros((41, 41)), 20, 20, 2.0)
    assert v.all()


def test_wall_casts_shadow():
    dem = np.zeros((41, 41))
    dem[:, 28] = 50.0
    v = viewshed(dem, 20, 20, 2.0)
    assert v[20, 28]            # the wall face is visible
    assert not v[20, 30:].any() # everything behind it is not
    assert v[20, :28].all()     # the near side is clear


def test_peak_reappears_downhill():
    """A ridge hides the valley behind it but a taller far peak
    re-emerges above the sightline."""
    dem = np.zeros((1 + 0 + 41, 41))
    dem = np.zeros((41, 41))
    dem[:, 26] = 10.0   # near ridge
    dem[:, 36] = 40.0   # taller far ridge
    v = viewshed(dem, 20, 20, 2.0)
    assert v[20, 26] and not v[20, 30] and v[20, 36]


def test_agreement_with_bruteforce_los():
    n = 61
    yy, xx = np.mgrid[0:n, 0:n]
    dem = 8 * np.cos(xx / 7.0) + 6 * np.sin(yy / 9.0) + 4 * np.cos((xx + yy) / 11.0)
    ox = oy = 30
    v = viewshed(dem, ox, oy, 2.0)
    z0 = dem[oy, ox] + 2.0
    bf = np.zeros((n, n), dtype=bool)
    for y in range(n):
        for x in range(n):
            if x == ox and y == oy:
                bf[y, x] = True
                continue
            d = max(abs(x - ox), abs(y - oy)) * 8
            ts = np.linspace(0, 1, d, endpoint=False)[1:]
            sx = ox + ts * (x - ox)
            sy = oy + ts * (y - oy)
            fx = np.clip(sx.astype(int), 0, n - 1)
            fy = np.clip(sy.astype(int), 0, n - 1)
            fx2 = np.clip(fx + 1, 0, n - 1)
            fy2 = np.clip(fy + 1, 0, n - 1)
            wxf = sx - fx
            wyf = sy - fy
            zi = (
                dem[fy, fx] * (1 - wxf) * (1 - wyf)
                + dem[fy, fx2] * wxf * (1 - wyf)
                + dem[fy2, fx] * (1 - wxf) * wyf
                + dem[fy2, fx2] * wxf * wyf
            )
            dist = np.hypot(sx - ox, sy - oy)
            own = (dem[y, x] - z0) / np.hypot(x - ox, y - oy)
            bf[y, x] = own >= ((zi - z0) / dist).max() - 1e-12
    assert (v == bf).mean() > 0.985  # Wang interpolation vs exact rays
