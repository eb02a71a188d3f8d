"""Median-cut palette + error-diffusion dither tests."""

import numpy as np

from gdal_spark.raster.dither import dither_rgb2pct, median_cut_palette


def test_palette_shape_and_determinism():
    rng = np.random.default_rng(4)
    img = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
    p1 = median_cut_palette(img, 16)
    p2 = median_cut_palette(img, 16)
    assert p1.shape == (16, 3) and (p1 == p2).all()


def test_flat_image_single_color():
    img = np.full((16, 16, 3), 200, dtype=np.uint8)
    pal = median_cut_palette(img, 8)
    idx = dither_rgb2pct(img, pal)
    assert len(np.unique(idx)) == 1
    assert np.abs(pal[idx[0, 0]].astype(int) - 200).max() <= 4  # 5-bit bin


def test_error_diffusion_approximates_gray():
    """A 25%-gray field dithered with a black/white palette must put
    ~25% white pixels (the whole point of error diffusion; plain
    nearest would output 0% white)."""
    img = np.full((64, 64, 3), 64, dtype=np.uint8)
    pal = np.array([[0, 0, 0], [255, 255, 255]], dtype=np.uint8)
    idx = dither_rgb2pct(img, pal)
    frac_white = idx.mean()
    assert 0.2 < frac_white < 0.3
    # plain nearest comparison
    assert not (idx == 0).all()


def test_dither_uses_c_truncated_sixths():
    from gdal_spark.raster.dither import _c_div6

    assert _c_div6(7) == 1 and _c_div6(-7) == -1  # C-truncation
    assert _c_div6(-5) == 0


def test_gradient_smoothness():
    gy = np.linspace(0, 255, 64).astype(np.uint8)
    img = np.repeat(gy[None, :, None], 32, axis=0).repeat(3, axis=2)
    pal = median_cut_palette(img, 8)
    idx = dither_rgb2pct(img, pal)
    recon = pal[idx].astype(np.float64)
    # reconstruction tracks the gradient within palette quantization
    assert np.abs(recon.mean(axis=(0, 2)) - gy).mean() < 12
