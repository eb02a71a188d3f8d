"""EXIF APP1 TIFF-IFD codec (gdal_spark/raster/exif.py) —
gcore/gdalexif.cpp + frmts/jpeg/jpgdataset.cpp ReadEXIFMetadata."""

import struct

import numpy as np
import pytest

from gdal_spark.raster.exif import (
    build_exif,
    exif_metadata,
    extract_app1,
    insert_app1,
    parse_exif,
)
from gdal_spark.raster.jpeg import decode_jpeg, encode_jpeg

TAGS = {
    "Make": "gdal_spark",
    "Model": "cam_2",
    "Orientation": 3,
    "DateTime": "2026:01:05 07:00:00",
    "ExposureTime": (1, 250),
    "FNumber": (28, 10),
    "ISOSpeedRatings": 400,
    "PixelXDimension": 256,
    "PixelYDimension": 100,
    "GPSLatitudeRef": "N",
    "GPSLatitude": ((12, 1), (30, 1), (4500, 100)),
    "GPSLongitudeRef": "W",
    "GPSLongitude": ((75, 1), (0, 1), (0, 1)),
}


def test_build_parse_roundtrip():
    assert parse_exif(build_exif(TAGS)) == TAGS


def test_subset_roundtrip_no_subifds():
    tags = {"Make": "m", "Orientation": 1}
    assert parse_exif(build_exif(tags)) == tags


def test_jpeg_splice_and_decode_unchanged():
    arr = np.arange(20 * 20 * 3, dtype=np.uint8).reshape(20, 20, 3)
    plain = encode_jpeg(arr, 90)
    tagged = insert_app1(plain, build_exif(TAGS))
    assert extract_app1(plain) is None
    assert parse_exif(extract_app1(tagged)) == TAGS
    # entropy-coded pixels untouched by the splice
    assert np.array_equal(decode_jpeg(tagged), decode_jpeg(plain))


def test_exif_metadata_gdal_names():
    jpg = insert_app1(
        encode_jpeg(np.zeros((8, 8, 3), np.uint8), 90), build_exif(TAGS)
    )
    md = exif_metadata(jpg)
    assert md["EXIF_Make"] == "gdal_spark"
    assert md["EXIF_Orientation"] == "3"
    assert exif_metadata(encode_jpeg(np.zeros((8, 8, 3), np.uint8))) == {}


def test_big_endian_parse():
    # hand-built MM stream: one SHORT Orientation entry
    t = (b"MM" + struct.pack(">HI", 42, 8)
         + struct.pack(">H", 1)
         + struct.pack(">HHI", 0x0112, 3, 1) + struct.pack(">H", 5) + b"\x00\x00"
         + b"\x00\x00\x00\x00")
    assert parse_exif(b"Exif\x00\x00" + t) == {"Orientation": 5}


def test_unknown_tag_raises():
    with pytest.raises(KeyError):
        build_exif({"NotATag": 1})


def test_bad_headers_raise():
    with pytest.raises(ValueError):
        parse_exif(b"JFIF\x00\x00II")
    with pytest.raises(ValueError):
        parse_exif(b"Exif\x00\x00XX" + b"\x00" * 8)
    with pytest.raises(ValueError):
        insert_app1(b"\x00\x00", b"Exif\x00\x00")


def test_geotiff_georef_roundtrip():
    # GeoTIFF tags (gt_wkt_srs.cpp): scale+tiepoint+geokeys roundtrip
    from gdal_spark.raster.tiff import encode_tiff, decode_tiff, read_georef

    arr = np.arange(12 * 10 * 3, dtype=np.uint8).reshape(12, 10, 3)
    gt = (-20037508.34, 152.87, 0.0, 20037508.34, 0.0, -152.87)
    buf = encode_tiff(arr, geo=(gt, 3857))
    assert np.array_equal(decode_tiff(buf), arr)
    got_gt, epsg = read_georef(buf)
    assert epsg == 3857
    assert max(abs(a - b) for a, b in zip(gt, got_gt)) < 1e-9
    # geographic model type
    g3, e3 = read_georef(
        encode_tiff(arr[:, :, 0], geo=((5.0, 0.001, 0, 50.0, 0, -0.001),
                                       4326)))
    assert e3 == 4326 and abs(g3[0] - 5.0) < 1e-12
    # plain TIFF has no georef; rotation is refused loudly
    assert read_georef(encode_tiff(arr)) is None
    with pytest.raises(ValueError):
        encode_tiff(arr, geo=((0, 1, 0.5, 0, 0, -1), 3857))


def test_cog_georef_tags():
    # COG IFD0 carries the same GeoTIFF tags (cogdriver.cpp keeps
    # georeferencing on the full-res IFD); overviews decode unchanged
    from gdal_spark.raster.cog import decode_cog, encode_cog
    from gdal_spark.raster.tiff import read_georef

    lv0 = (np.arange(300 * 520 * 3).reshape(300, 520, 3) % 256).astype(
        np.uint8)
    lv1 = lv0[::2, ::2].copy()
    gt = (-1000.0, 2.5, 0.0, 4000.0, 0.0, -2.5)
    buf = encode_cog([lv0, lv1], geo=(gt, 32633))
    assert np.array_equal(decode_cog(buf)[0][:300, :520], lv0)
    got_gt, epsg = read_georef(buf)
    assert epsg == 32633
    assert max(abs(a - b) for a, b in zip(gt, got_gt)) < 1e-12
    assert read_georef(encode_cog([lv0, lv1])) is None
    with pytest.raises(ValueError):
        encode_cog([lv0], geo=((0, 1, 0.5, 0, 0, -1), 3857))


def test_tiff_internal_overviews():
    # gdaladdo layout (apps/gdaladdo.cpp): chained IFDs in one classic
    # TIFF; IFD0 keeps georef; decode_tiff still reads level 0
    from gdal_spark.raster.tiff import (
        decode_tiff,
        decode_tiff_levels,
        encode_tiff_levels,
        read_georef,
    )

    lv0 = (np.arange(37 * 53 * 3).reshape(37, 53, 3) % 256).astype(np.uint8)
    lv1 = lv0[::2, ::2].copy()
    lv2 = lv1[::2, ::2].copy()
    gt = (10.0, 0.5, 0.0, 99.0, 0.0, -0.5)
    buf = encode_tiff_levels([lv0, lv1, lv2], geo=(gt, 4326))
    levels = decode_tiff_levels(buf)
    assert [lv.shape for lv in levels] == [lv0.shape, lv1.shape, lv2.shape]
    assert all(np.array_equal(a, b) for a, b in zip(levels, [lv0, lv1, lv2]))
    assert np.array_equal(decode_tiff(buf), lv0)
    got_gt, epsg = read_georef(buf)
    assert epsg == 4326 and abs(got_gt[0] - 10.0) < 1e-12
    # grayscale single-level degenerates to a plain file
    gray = lv0[:, :, 0].copy()
    assert np.array_equal(
        decode_tiff_levels(encode_tiff_levels([gray]))[0], gray)


def test_encode_tiles_gtiff(spark):
    # georeferenced tile sink: --output-format GTiff analog
    # (gdalalg_raster_tile.cpp) — payload is a GeoTIFF whose
    # geotransform equals the tile's EPSG:3857 bounds
    from pyspark.sql import functions as F

    from gdal_spark.fixtures.images import build_images
    from gdal_spark.operators.render import encode_tiles, render_tiles
    from gdal_spark.raster.tiff import decode_tiff, read_georef
    from gdal_spark.tiles import tilemath as tm

    ids = spark.range(1, 40).select((F.col("id") * 499).alias("i"))
    images = build_images(spark, ids_df=ids, with_payload=False)
    tiles = render_tiles(images, 12, with_data=True)
    out = encode_tiles(tiles, 12, fmt="gtiff").limit(3).collect()
    assert out
    res = tm.resolution(12)
    for r in out:
        assert r.path.endswith(".tif")
        payload = bytes(r.payload)
        assert decode_tiff(payload).shape == (256, 256, 3)
        gt, epsg = read_georef(payload)
        assert epsg == 3857
        assert abs(gt[0] - (-tm.ORIGIN + r.tile_x * res * 256)) < 1e-6
        assert abs(gt[3] - (tm.ORIGIN - r.tile_y * res * 256)) < 1e-6
        assert gt[1] == res and gt[5] == -res
