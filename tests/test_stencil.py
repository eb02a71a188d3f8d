"""DEM kernels + distributed halo-exchange stencil tests."""

import numpy as np

from gdal_spark.operators import stencil
from gdal_spark.raster import dem
from gdal_spark.raster.checksum import gdal_checksum


def test_slope_flat_and_ramp():
    flat = np.zeros((6, 6))
    assert (dem.slope_horn(flat) == 0).all()
    # unit ramp in x: dx = -8 (values increase east), slope = atan(1)
    ramp = np.tile(np.arange(6, dtype=float), (6, 1))
    s = dem.slope_horn(ramp)
    assert np.allclose(s, 45.0)


def test_aspect_azimuth_cardinal():
    # surface rising to the south (bottom rows highest): downhill
    # faces north -> azimuth 0
    ramp = np.tile(np.arange(6, dtype=float)[:, None], (1, 6))
    a = dem.aspect(ramp)
    assert np.allclose(a, 0.0)
    flat = np.ones((5, 5))
    assert (dem.aspect(flat) == dem.ASPECT_NODATA).all()


def test_tri_tpi_roughness_values():
    p = np.zeros((3, 3))
    p[1, 1] = 8.0
    assert dem.tri_wilson(p)[0, 0] == 8.0
    assert dem.tpi(p)[0, 0] == 8.0
    assert dem.roughness(p)[0, 0] == 8.0


def test_hillshade_range():
    rng = np.random.default_rng(5)
    p = rng.uniform(0, 50, (10, 10))
    h = dem.hillshade(p)
    assert h.dtype == np.uint8
    assert h.min() >= 1 and h.max() <= 255


def test_distributed_stencil_matches_local(spark):
    tiles = [(tx, ty) for tx in range(3, 6) for ty in range(2, 5)]
    df = stencil.surface_tiles(spark, tiles)
    out = stencil.stencil_metrics(df, ["slope", "tpi"]).collect()
    got = {(r["tile_x"], r["tile_y"], r["metric"]): r["checksum"] for r in out}
    # only the center tile has all 8 neighbors
    assert set(got) == {(4, 3, "slope"), (4, 3, "tpi")}
    gx = np.arange(-1, stencil.TILE + 1) + 4 * stencil.TILE
    gy = (np.arange(-1, stencil.TILE + 1) + 3 * stencil.TILE)[:, None]
    padded = stencil.surface_value(gx[None, :], gy)
    assert got[(4, 3, "slope")] == gdal_checksum(dem.slope_horn(padded))
    assert got[(4, 3, "tpi")] == gdal_checksum(dem.tpi(padded))


def test_hillshade_combined_flat_is_full_bright():
    """Flat terrain: acos(sin_alt) * atan(0) = 0 -> cang = 1 -> 255."""
    p = np.full((12, 12), 7.25)
    v = dem.hillshade_combined(p)
    assert np.allclose(v, 255.0)


def test_hillshade_multidirectional_flat_quirk():
    """The reference returns 1 + 254*sin(alt) on flat cells (the full
    two-fold scale, despite the 127 scale elsewhere)."""
    import math

    p = np.full((12, 12), 3.0)
    v = dem.hillshade_multidirectional(p, altitude_deg=45.0)
    assert np.allclose(v, 1.0 + 254.0 * math.sin(math.radians(45.0)))


def test_hillshade_igor_flat_and_slope_facing():
    """Flat -> 255; a slope FACING the light (aspect toward az) darkens
    less than the same slope facing away."""
    p = np.full((12, 12), 1.0)
    assert np.allclose(dem.hillshade_igor(p), 255.0)
    # planes along the light axis (az=315, NW): the slope whose aspect
    # points INTO the light keeps full brightness (aspectStrength 0 at
    # the half-pi fold), the opposite one darkens
    yy, xx = np.mgrid[0:12, 0:12]
    toward = dem.hillshade_igor((xx + yy) * 2.0)[5, 5]
    away = dem.hillshade_igor(-(xx + yy) * 2.0)[5, 5]
    assert toward == 255.0
    assert away < 60.0


def test_hillshade_igor_ignores_altitude_arg():
    """-igor has no altitude parameter (the reference rejects -alt)."""
    import inspect

    assert "altitude_deg" not in inspect.signature(dem.hillshade_igor).parameters


def test_hillshade_multidirectional_matches_manual_single_cell():
    """One hand-computed window against the USGS weighted formula."""
    import math

    p = np.zeros((3, 3))
    p[:, 2] = 8.0  # gradient in +x
    x = ((p[0, 0] + 2 * p[1, 0] + p[2, 0]) - (p[0, 2] + 2 * p[1, 2] + p[2, 2])) / 8.0
    y = 0.0
    alt = math.radians(45.0)
    v270 = max(0.0, math.sin(alt) - x * math.cos(alt))
    v225 = max(
        0.0, math.sin(alt) + (x - y) * math.cos(math.radians(225.0)) * math.cos(alt)
    )
    v315 = max(
        0.0, math.sin(alt) + (x + y) * math.cos(math.radians(225.0)) * math.cos(alt)
    )
    ss = x * x
    w225 = 0.5 * ss
    w315 = ss - w225
    want = 1.0 + 127.0 * (
        (w225 * v225 + ss * v270 + w315 * v315) / ss
    ) / math.sqrt(1.0 + ss)
    got = dem.hillshade_multidirectional(np.pad(p, 1, mode="edge"))[1, 1]
    # center cell of the padded 3x3 == our manual window
    assert abs(got - want) < 1e-12
