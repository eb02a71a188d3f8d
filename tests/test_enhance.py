"""gdalenhance histogram equalization (raster/enhance.py) vs
apps/gdalenhance.cpp integer LUT math."""

import numpy as np

from gdal_spark.raster.enhance import equalize_lut, equalize_u8


def test_extreme_bins_zeroed():
    hist = np.zeros(256, dtype=np.int64)
    hist[0] = 1000
    hist[255] = 1000
    hist[100] = 10
    lut = equalize_lut(hist)
    # extremes contribute nothing: total = 10, all mass at bin 100
    assert lut[99] == 0
    # cum[100] = 0 + 10//2 = 5 -> (5*256)//10 = 128
    assert lut[100] == 128
    assert lut[101] == 255  # (10*256)//10 = 256 -> clamped


def test_uniform_histogram_is_identityish():
    # perfectly uniform data maps near-linearly
    arr = np.tile(np.arange(256, dtype=np.uint8), (4, 1))
    eq = equalize_u8(arr)
    assert eq[0, 0] == 0
    d = np.diff(eq[0, 1:-1].astype(int))
    assert (d >= 0).all() and d.max() <= 2


def test_contrast_stretch_property():
    # data bunched in [100, 110] spreads across the full range
    rng = np.random.default_rng(1)
    arr = rng.integers(100, 111, size=(64, 64)).astype(np.uint8)
    eq = equalize_u8(arr)
    assert eq.min() < 32 and eq.max() > 192


def test_empty_total_guard():
    hist = np.zeros(256, dtype=np.int64)
    hist[0] = 5
    hist[255] = 5      # all mass in zeroed extremes -> nTotal = 1
    lut = equalize_lut(hist)
    assert (lut == 0).all() | (lut <= 255).all()


def test_cumulative_uses_half_own_bin():
    hist = np.zeros(256, dtype=np.int64)
    hist[10] = 4
    hist[20] = 4
    lut = equalize_lut(hist)
    # cum[10] = 0 + 2 -> (2*256)//8 = 64; cum[20] = 4+2 -> 192
    assert lut[10] == 64 and lut[20] == 192


def test_match_lut_cdf_rule():
    import numpy as np

    from gdal_spark.raster.enhance import match_lut, match_u8

    # dark source matched to a bright reference lands on its range
    rng = np.random.RandomState(0)
    src = rng.randint(0, 100, (50, 60)).astype(np.uint8)
    ref = rng.randint(100, 256, (40, 40)).astype(np.uint8)
    out = match_u8(src, ref)
    assert out.min() >= 100
    assert abs(float(out.mean()) - float(ref.mean())) < 5.0
    # self-match is the identity on occupied bins
    assert (match_u8(src, src) == src).all()
    # monotone LUT (CDF matching preserves ordering)
    lut = match_lut(np.bincount(src.ravel(), minlength=256),
                    np.bincount(ref.ravel(), minlength=256))
    assert (np.diff(lut) >= 0).all()
    # exact rule at one bin: smallest u with cr*n_src >= cs*n_ref
    cs = np.cumsum(np.bincount(src.ravel(), minlength=256))
    cr = np.cumsum(np.bincount(ref.ravel(), minlength=256))
    v = 50
    want = int(np.argmax(cr * cs[-1] >= cs[v] * cr[-1]))
    assert lut[v] == want
