"""Aperture-7 icosahedral hex index (tiles/hexcell.py)."""

import numpy as np
import pytest

from gdal_spark.tiles import hexcell as hx


def test_icosahedron_derivation():
    assert hx.FACE_CENTER.shape == (20, 3)
    np.testing.assert_allclose(
        np.linalg.norm(hx.FACE_CENTER, axis=1), 1.0, atol=1e-12
    )
    for c, u, v in zip(hx.FACE_CENTER, hx.FACE_U, hx.FACE_V):
        assert abs(np.dot(c, u)) < 1e-12
        assert abs(np.dot(c, v)) < 1e-12
        assert abs(np.dot(u, v)) < 1e-12
        assert abs(np.linalg.norm(u) - 1) < 1e-12
    # every unit vector is claimed by exactly one argmax face
    rng = np.random.default_rng(7)
    p = rng.normal(size=(500, 3))
    p /= np.linalg.norm(p, axis=1, keepdims=True)
    dots = p @ hx.FACE_CENTER.T
    assert (np.sort(dots, axis=1)[:, -1] > 0.75).all()  # covered


def _sample(n=2000, seed=3):
    rng = np.random.default_rng(seed)
    lat = np.degrees(np.arcsin(rng.uniform(-1, 1, n)))
    lon = rng.uniform(-180, 180, n)
    return lat, lon


def test_pack_unpack_roundtrip():
    lat, lon = _sample()
    for res in (0, 5, 15):
        cells = hx.encode(lat, lon, res)
        r, f, q, a = hx.unpack(cells)
        assert (r == res).all()
        assert ((f >= 0) & (f < 20)).all()
        repacked = (
            np.int64(res) * (1 << 57) + f * (1 << 52)
            + (q + hx.OFF) * (1 << 26) + (a + hx.OFF)
        )
        assert (repacked == cells).all()


def test_interior_fixed_point_and_boundary_face_flips():
    """encode(center(c)) == c exactly when the center stays on the
    cell's own face; every violation must be a face flip (the
    documented boundary-sliver caveat)."""
    lat, lon = _sample()
    cells = hx.encode(lat, lon, 6)
    la, lo = hx.cell_center(cells)
    cells2 = hx.encode(la, lo, 6)
    _, f1, _, _ = hx.unpack(cells)
    _, f2, _, _ = hx.unpack(cells2)
    mismatch = cells != cells2
    assert (f1[mismatch] != f2[mismatch]).all()  # only face flips
    assert mismatch.mean() < 0.10  # slivers are rare at res 6


def test_aperture_seven_scaling():
    """Mean cell occupancy grows ~7x per res step on dense points."""
    # dense grid over one face interior: distinct-cell counts scale
    # with cell area, i.e. ~7x per res step
    la, lo = np.meshgrid(
        np.linspace(18.0, 22.0, 300), np.linspace(28.0, 32.0, 300)
    )
    lat, lon = la.ravel(), lo.ravel()
    n5 = len(np.unique(hx.encode(lat, lon, 5)))
    n6 = len(np.unique(hx.encode(lat, lon, 6)))
    assert 5.0 < n6 / n5 < 9.0


def test_parent_containment_interior():
    lat, lon = _sample(500, seed=5)
    child = hx.encode(lat, lon, 7)
    par = hx.parent(child, 6)
    direct = hx.encode(lat, lon, 6)
    # parent-of-child equals direct coarse encode for most points
    # (divergence only for points near hex boundaries where the
    # aperture-7 child straddles two parents — H3 has the same
    # property).
    assert (par == direct).mean() > 0.75


def test_k_ring_sizes_interior():
    cell = int(hx.encode(np.array([20.0]), np.array([30.0]), 6)[0])
    assert len(hx.k_ring(cell, 1)) == 7
    assert len(hx.k_ring(cell, 2)) == 19
    assert cell in hx.k_ring(cell, 1)


def test_with_hex_cell_column(spark):
    lat, lon = _sample(50, seed=9)
    pdf = [(int(i), float(a), float(o)) for i, (a, o) in
           enumerate(zip(lat, lon))]
    df = spark.createDataFrame(pdf, "i long, lat double, lon double")
    from pyspark.sql import functions as F

    out = hx.with_hex_cell(df, F.col("lat"), F.col("lon"), 6).toPandas()
    exp = hx.encode(lat, lon, 6)
    got = out.sort_values("i")["hex_cell"].to_numpy()
    assert (got == exp).all()
