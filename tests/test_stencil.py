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
