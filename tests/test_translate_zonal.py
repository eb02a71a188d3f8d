"""gdal_translate ops, pixel functions, zonal stats, point query."""

import numpy as np
from pyspark.sql import functions as F

from gdal_spark.fixtures import georef
from gdal_spark.fixtures.images import build_images
from gdal_spark.fixtures.sites import build_sites
from gdal_spark.fixtures.zones import build_zones
from gdal_spark.operators import translate as trans
from gdal_spark.operators import zonal
from gdal_spark.raster.checksum import gdal_checksum
from gdal_spark.tiles import tilemath as tm


def test_scale_to_byte_rounding():
    arr = np.array([0, 10, 125, 240, 255], dtype=np.uint8)
    out = trans.scale_to_byte(arr, 10.0, 240.0, 0.0, 255.0)
    # (v-10)*255/230 + 0.5 floored, clamped
    expect = np.clip(np.floor((arr - 10.0) * (255.0 / 230.0) + 0.5), 0, 255)
    assert (out == expect.astype(np.uint8)).all()


def test_translate_crop_band_reorder(spark):
    ids = spark.range(1).selectExpr("id * 3 as i")  # i=0 -> png 20x20
    images = build_images(spark, ids_df=ids, with_payload=True)
    rows = trans.translate(
        images, srcwin=(3, 2, 12, 9), bands=[2, 0]
    ).collect()
    assert len(rows) == 2
    by_band = {r["band"]: r for r in rows}
    src = georef.np_image_pixels(0, 20, 20)
    crop = src[2:11, 3:15]
    assert by_band[0]["checksum"] == gdal_checksum(crop[:, :, 2])
    assert by_band[1]["checksum"] == gdal_checksum(crop[:, :, 0])
    assert by_band[0]["out_w"] == 12 and by_band[0]["out_h"] == 9


def test_pixel_calc_ops(spark):
    ids = spark.range(1).selectExpr("id + 3 as i")  # i=3 -> png 257x100
    images = build_images(spark, ids_df=ids, with_payload=True)
    rows = {r["op"]: r for r in trans.pixel_calc(images).collect()}
    src = georef.np_image_pixels(3, 257, 100).astype(np.int64)
    assert rows["sum"]["vsum"] == int((src[:, :, 0] + src[:, :, 1] + src[:, :, 2]).sum())
    assert rows["diff"]["checksum"] == gdal_checksum(src[:, :, 0] - src[:, :, 1])
    assert rows["reclassify"]["vsum"] == int(np.where(src[:, :, 0] < 128, 0, 255).sum())


def test_zonal_stats_square(spark):
    from gdal_spark.operators.rasterize import rasterize_burn_counts

    zones = build_zones(spark, n=8)
    stats = {r["fid"]: r for r in zonal.zonal_stats(zones, 5).collect()}
    counts = {r["fid"]: r["burned_px"] for r in rasterize_burn_counts(zones, 5).collect()}
    for fid in range(8):
        assert stats[fid]["n_px"] == counts[fid]
        assert 0 <= stats[fid]["vmin"] <= stats[fid]["vmax"] <= 255
        assert stats[fid]["mean_e2"] == (100 * stats[fid]["vsum"]) // stats[fid]["n_px"]


def test_interpolate_at_point_center_value(spark):
    """A site exactly at a source-pixel center returns that pixel's
    value under bilinear."""
    ids = spark.range(1).selectExpr("id + 2 as i")  # 256x256 image
    img = build_images(spark, ids_df=ids, with_payload=False)
    g = img.collect()[0]
    res4 = tm.resolution(4)
    # recompute footprint at z=4 like the entry query does
    img4 = (
        img.withColumn("xmin", F.col("cx") - F.col("w") * F.lit(res4 / 2))
        .withColumn("xmax", F.col("cx") + F.col("w") * F.lit(res4 / 2))
        .withColumn("ymin", F.col("cy") - F.col("h") * F.lit(res4 / 2))
        .withColumn("ymax", F.col("cy") + F.col("h") * F.lit(res4 / 2))
    )
    # world coord of source pixel center (100, 40)
    ulx = g["cx"] - g["w"] * res4 / 2
    uly = g["cy"] + g["h"] * res4 / 2
    wx = ulx + (100 + 0.5) * res4
    wy = uly - (40 + 0.5) * res4
    lon = float(np.degrees(wx / tm.EARTH_RADIUS))
    lat = float(np.degrees(2 * np.arctan(np.exp(wy / tm.EARTH_RADIUS)) - np.pi / 2))
    sites = spark.createDataFrame(
        [("s0", lon, lat)], ["site_id", "slon", "slat"]
    )
    out = zonal.interpolate_at_points(sites, img4, 4).collect()
    assert len(out) == 1
    expect = (100 + 40 + 2) % 256
    assert out[0]["v_e2"] == expect * 100
