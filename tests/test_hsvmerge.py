"""HSV color-merge kernel (raster/hsvmerge.py) vs a scalar
transcription of the reference's rgb_to_hs/hsv_to_rgb
(apps/gdalalg_raster_color_merge.cpp:128-232)."""

import numpy as np

from gdal_spark.raster.hsvmerge import hsv_merge, hsv_to_rgb, rgb_to_hs

F32 = np.float32


def _scalar_merge(r, g, b, v):
    """Direct structural transcription of the C kernel, float32."""
    minc, maxc = min(r, g, b), max(r, g, b)
    span = maxc - minc
    s = F32(span) / F32(max(1, maxc))
    div = F32(1.0) if span == 0 else F32(6.0) * F32(span)
    if maxc == b:
        h = F32(4.0 / 6.0) + F32(r - g) / div
    elif maxc == g:
        h = F32(2.0 / 6.0) + F32(b - r) / div
    else:
        tmp = F32(g - b) / div
        h = tmp + F32(1.0) if tmp < 0 else tmp
    i = int(F32(6.0) * h)
    f = F32(6.0) * h - F32(i)
    p = np.uint8(F32(v) * (F32(1.0) - s) + F32(0.5))
    q = np.uint8(F32(v) * (F32(1.0) - s * f) + F32(0.5))
    t = np.uint8(F32(v) * (F32(1.0) - s * (F32(1.0) - f)) + F32(0.5))
    ch = lambda a0, a1, a2, a3, a4, a5: (a0, a1, a2, a3, a4, a5)[min(i, 5)]
    return (
        ch(v, q, p, p, t, v),
        ch(t, v, v, q, p, p),
        ch(p, p, t, v, v, q),
    )


def test_matches_scalar_reference_transcription():
    rng = np.random.default_rng(5)
    rgb = rng.integers(0, 256, (40, 40, 3)).astype(np.uint8)
    gray = rng.integers(0, 256, (40, 40)).astype(np.uint8)
    out = hsv_merge(rgb, gray)
    for yy in range(0, 40, 7):
        for xx in range(0, 40, 7):
            want = _scalar_merge(
                int(rgb[yy, xx, 0]), int(rgb[yy, xx, 1]),
                int(rgb[yy, xx, 2]), int(gray[yy, xx]),
            )
            assert tuple(out[yy, xx]) == want, (yy, xx, rgb[yy, xx])


def test_gray_input_stays_gray():
    v = np.arange(256, dtype=np.uint8).reshape(16, 16)
    rgb = np.stack([v, v, v], axis=-1)
    gray = (255 - v).astype(np.uint8)
    out = hsv_merge(rgb, gray)
    # s == 0 everywhere -> all channels equal the new value
    assert (out[:, :, 0] == gray).all()
    assert (out[:, :, 1] == gray).all()
    assert (out[:, :, 2] == gray).all()


def test_value_replacement_exact():
    rng = np.random.default_rng(9)
    rgb = rng.integers(0, 256, (32, 32, 3)).astype(np.uint8)
    gray = rng.integers(0, 256, (32, 32)).astype(np.uint8)
    out = hsv_merge(rgb, gray)
    # the max channel of the result IS the grayscale value
    assert (out.max(axis=2) == gray).all()


def test_hue_roundtrip_close():
    rng = np.random.default_rng(11)
    rgb = rng.integers(0, 256, (64, 64, 3)).astype(np.uint8)
    h0, s0 = rgb_to_hs(rgb)
    v = rgb.max(axis=2).astype(np.uint8)
    out = hsv_to_rgb(h0, s0, v)
    # re-encoding with the original value reproduces the pixel within
    # byte rounding
    assert np.abs(out.astype(int) - rgb.astype(int)).max() <= 1
