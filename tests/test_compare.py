"""gdalcompare dual (operators/compare.py) — the diff classes the
driver oracle doesn't exercise: size, dtype, missing band, and the
pixel-compare gating rule."""

import numpy as np

from gdal_spark.operators.compare import compare_rasters
from gdal_spark.raster.checksum import gdal_checksum
from gdal_spark.raster.codecs import encode_image


def _img(arr):
    return encode_image(arr, "png")


def _run(spark, golden_rows, new_rows):
    g = spark.createDataFrame(
        golden_rows, "image_id string, bytes binary, fmt string")
    n = spark.createDataFrame(
        new_rows, "image_id string, bytes binary, fmt string")
    return {(r["image_id"], r["band"]): r
            for r in compare_rasters(g, n).collect()}


def _rgb(h, w, seed=0):
    y, x = np.mgrid[0:h, 0:w]
    return np.stack(
        [(x + y + seed + p) % 256 for p in (0, 85, 170)], axis=2
    ).astype(np.uint8)


def test_identical_images_report_no_diffs(spark):
    a = _rgb(8, 10)
    out = _run(spark, [("i0", _img(a), "png")], [("i0", _img(a), "png")])
    assert len(out) == 3
    for b in range(3):
        r = out[("i0", b)]
        assert r["found_diff"] == 0
        assert r["checksum_golden"] == r["checksum_new"]
        assert r["checksum_golden"] == gdal_checksum(a[:, :, b])
        assert r["pixels_differing"] == 0


def test_pixel_diff_counted_only_on_checksum_mismatch(spark):
    a = _rgb(8, 10)
    b = a.copy()
    b[3, 4, 1] = (int(b[3, 4, 1]) + 5) % 256
    out = _run(spark, [("i0", _img(a), "png")], [("i0", _img(b), "png")])
    assert out[("i0", 0)]["found_diff"] == 0
    r = out[("i0", 1)]
    assert r["found_diff"] == 1
    assert r["pixels_differing"] == 1
    assert r["max_pixel_diff"] == 5
    assert out[("i0", 2)]["found_diff"] == 0


def test_size_mismatch_gates_pixel_compare(spark):
    # gdalcompare.py:186-189 — an earlier diff suppresses the pixel
    # comparison even when checksums differ
    a, b = _rgb(8, 10), _rgb(6, 10)
    out = _run(spark, [("i0", _img(a), "png")], [("i0", _img(b), "png")])
    for band in range(3):
        r = out[("i0", band)]
        assert r["size_diff"] == 1
        assert r["pixels_differing"] == 0
        assert r["found_diff"] >= 1


def test_missing_band_flagged(spark):
    a = _rgb(4, 4)
    gray = a[:, :, 0].copy()          # single-band PNG
    out = _run(spark, [("i0", _img(a), "png")], [("i0", _img(gray), "png")])
    assert out[("i0", 0)]["band_missing"] == 0
    assert out[("i0", 1)]["band_missing"] == 1
    assert out[("i0", 1)]["found_diff"] == 1
    assert out[("i0", 2)]["band_missing"] == 1
