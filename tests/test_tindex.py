"""gdaltindex builder semantics (apps/gdaltindex_lib.cpp)."""

import math

import pytest
from pyspark.sql import functions as F

from gdal_spark.fixtures.georef import RES0, with_image_geo
from gdal_spark.operators.tindex import build_tile_index


@pytest.fixture(scope="module")
def geo(spark):
    ids = spark.range(10).withColumnRenamed("id", "i")
    return with_image_geo(ids, "i")


def test_one_feature_per_source_with_envelope(spark, geo):
    rows = {r["location"]: r for r in build_tile_index(geo).collect()}
    assert len(rows) == 10
    src = {r["image_id"]: r for r in geo.collect()}
    for iid, s in src.items():
        r = rows[iid + ".tif"]
        assert r["src_srs"] == "EPSG:3857"
        assert (r["rx"], r["ry"]) == (s["w"], s["h"])
        # envelope == geotransform corner min/max (gdaltindex_lib.cpp
        # :1120-1126); pixel size = sqrt(area / px) (:1128) == RES0
        assert r["xmin"] == s["xmin"] and r["ymax"] == s["ymax"]
        assert math.isclose(r["res"], RES0, rel_tol=1e-12)


def test_min_max_pixel_size_skip_rules(spark, geo):
    # factor-4 overviews of the 20/64/256/512-wide images land at
    # exactly 4*RES0; 257x100 ceil-decimates to 65x25 -> 3.977*RES0
    idx = build_tile_index(geo, overview_factors=(4,),
                           max_pixel_size=RES0 * 3.99)
    locs = {r["location"] for r in idx.collect()}
    assert all(loc.endswith(".tif") for loc in locs)
    kept_ovr = {loc for loc in locs if "_ovr4" in loc}
    # ids 3 and 8 are the 257x100 images (i % 5 == 3)
    assert kept_ovr == {"img_000000000003_ovr4.tif",
                        "img_000000000008_ovr4.tif"}
    assert sum(1 for loc in locs if "_ovr4" not in loc) == 10
    # min side: a floor above RES0 drops every base raster
    only_ovr = build_tile_index(geo, overview_factors=(4,),
                                min_pixel_size=RES0 * 1.5)
    assert all("_ovr4" in r["location"] for r in only_ovr.collect())


def test_duplicate_locations_skipped(spark, geo):
    # the reference skips sources already present in the index
    twice = geo.unionByName(geo.where(F.col("i") % 2 == 0))
    assert build_tile_index(twice).count() == 10
    kept = build_tile_index(twice, drop_duplicate_locations=False)
    assert kept.count() == 15


def test_vector_tile_index(spark):
    from gdal_spark.fixtures.zones import build_zones, zone_rings
    from gdal_spark.operators.tindex import build_vector_tile_index

    zones = build_zones(spark, n=12).withColumn("shard", F.col("fid") % 3)
    rows = {
        r["location"]: r
        for r in build_vector_tile_index(
            zones, "shard", location_fmt="z_{}.gpkg,0"
        ).collect()
    }
    assert set(rows) == {"z_0.gpkg,0", "z_1.gpkg,0", "z_2.gpkg,0"}
    # exact GetExtent(TRUE) envelope per shard from the real rings
    import numpy as np

    for shard in range(3):
        pts = np.vstack(
            [zone_rings(f)[0] for f in range(12) if f % 3 == shard]
        )
        r = rows[f"z_{shard}.gpkg,0"]
        assert r["n_features"] == 4
        assert abs(r["minx"] - pts[:, 0].min()) < 1e-12
        assert abs(r["maxy"] - pts[:, 1].max()) < 1e-12
