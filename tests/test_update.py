"""`gdal raster update` semantics (apps/gdalalg_raster_update.cpp)."""

import numpy as np
import pytest

from gdal_spark.operators.update import raster_update
from gdal_spark.raster.tiff import decode_tiff, encode_tiff, read_georef

R = 38.0


def _pair(dx_px=5.0, dy_px=7.0, src_epsg=3857):
    x = np.arange(40)[None, :]
    y = np.arange(30)[:, None]
    dst_arr = (((x + y)[:, :, None] + np.array([0, 85, 170])) % 256).astype(
        np.uint8
    )
    gt = (1000.0, R, 0.0, 5000.0, 0.0, -R)
    sx = np.arange(12)[None, :]
    sy = np.arange(9)[:, None]
    src_arr = ((2 * sx + 3 * sy) % 251)[:, :, None].repeat(3, 2).astype(
        np.uint8
    )
    sgt = (1000.0 + dx_px * R, R, 0.0, 5000.0 - dy_px * R, 0.0, -R)
    return (
        dst_arr,
        encode_tiff(dst_arr, geo=(gt, 3857)),
        src_arr,
        encode_tiff(src_arr, geo=(sgt, src_epsg)),
        gt,
    )


def test_update_replaces_exact_window_and_keeps_georef():
    dst_arr, dst, src_arr, src, gt = _pair()
    out_bytes = raster_update(dst, src)
    out = decode_tiff(out_bytes)
    want = dst_arr.copy()
    want[7:16, 5:17] = src_arr
    assert np.array_equal(out, want)
    assert read_georef(out_bytes) == (gt, 3857)


def test_update_clips_at_destination_edge():
    # source hangs off the right/bottom edges: only the intersection
    # is rewritten; nothing out of bounds is touched
    dst_arr, dst, src_arr, src, _ = _pair(dx_px=35.0, dy_px=25.0)
    out = decode_tiff(raster_update(dst, src))
    want = dst_arr.copy()
    want[25:30, 35:40] = src_arr[:5, :5]
    assert np.array_equal(out, want)


def test_update_half_pixel_offset_near_rule():
    # non-integer alignment: near picks floor(dfSrc) per GDAL's warp
    dst_arr, dst, src_arr, src, _ = _pair(dx_px=5.5, dy_px=7.0)
    out = decode_tiff(raster_update(dst, src))
    # dst x: dfx = x + 0.5 - 5.5 = x - 5 -> window x 5..16 covered
    want = dst_arr.copy()
    want[7:16, 5:17] = src_arr
    assert np.array_equal(out, want)


def test_update_guards():
    _dst_arr, dst, _src_arr, src, _ = _pair(src_epsg=32633)
    with pytest.raises(ValueError, match="CRS mismatch"):
        raster_update(dst, src)
    with pytest.raises(ValueError, match="unknown resampling"):
        _, d2, _, s2, _ = _pair()
        raster_update(d2, s2, resampling="mode")
