"""Z-order layout tests."""

import numpy as np
from pyspark.sql import functions as F

from gdal_spark.operators.layout import morton_key, write_spatially_clustered


def _morton_ref(x: int, y: int) -> int:
    out = 0
    for b in range(16):
        out |= ((x >> b) & 1) << (2 * b)
        out |= ((y >> b) & 1) << (2 * b + 1)
    return out


def test_morton_key_matches_reference(spark):
    rng = np.random.default_rng(11)
    pts = [(int(a), int(b)) for a, b in rng.integers(0, 1 << 16, size=(50, 2))]
    df = spark.createDataFrame(pts, "tx long, ty long")
    got = {
        (r["tx"], r["ty"]): r["k"]
        for r in df.select("tx", "ty", morton_key(F.col("tx"), F.col("ty")).alias("k")).collect()
    }
    for (x, y), k in got.items():
        assert k == _morton_ref(x, y)


def test_clustered_write_sorted(tmp_path, spark):
    from gdal_spark.fixtures import georef

    images = georef.with_image_geo(spark.range(5000).selectExpr("id as i"), "i")
    out = str(tmp_path / "clustered")
    write_spatially_clustered(
        images.select("i", "lon_c", "lat_c"), out, "lon_c", "lat_c",
        zoom=8, partitions=4,
    )
    back = spark.read.parquet(out)
    assert back.count() == 5000
    # keys are globally range-partitioned + sorted within partitions
    rows = back.select(F.spark_partition_id().alias("p"), "_zkey").collect()
    by_part = {}
    for r in rows:
        by_part.setdefault(r["p"], []).append(r["_zkey"])
    for ks in by_part.values():
        assert ks == sorted(ks)


def test_tile_tree_write_read(spark, tmp_path):
    """write_tile_tree / read_tile_tree: the gdal2tiles directory
    layout roundtrips payload bytes and path-derived ids."""
    from gdal_spark.operators.render import read_tile_tree, write_tile_tree

    rows = [
        (12, 100, 200, "12/100/200.png", bytearray(b"p1")),
        (12, 100, 201, "12/100/201.png", bytearray(b"p2")),
        (12, 101, 200, "12/101/200.png", bytearray(b"p3")),
    ]
    df = spark.createDataFrame(
        rows,
        "tile_z int, tile_x int, tile_y int, path string, payload binary",
    )
    root = str(tmp_path / "tree")
    assert write_tile_tree(df, root) == 3
    import os

    assert sorted(os.listdir(os.path.join(root, "12"))) == ["100", "101"]
    back = read_tile_tree(spark, root, z=12).toPandas()
    back = back.sort_values(["tile_x", "file_y"]).reset_index(drop=True)
    assert list(back["tile_x"]) == [100, 100, 101]
    assert list(back["file_y"]) == [200, 201, 200]
    assert list(back["fmt"]) == ["png", "png", "png"]
    assert bytes(back.loc[0, "payload"]) == b"p1"


def test_tile_tree_resume(spark, tmp_path):
    """resume=True skips complete files (checkpoint-resume contract)."""
    from gdal_spark.operators.render import read_tile_tree, write_tile_tree

    df1 = spark.createDataFrame(
        [(12, 1, 1, "12/1/1.png", bytearray(b"v1"))],
        "tile_z int, tile_x int, tile_y int, path string, payload binary",
    )
    root = str(tmp_path / "r")
    assert write_tile_tree(df1, root) == 1
    df2 = spark.createDataFrame(
        [
            (12, 1, 1, "12/1/1.png", bytearray(b"OVERWRITE")),
            (12, 2, 2, "12/2/2.png", bytearray(b"v2")),
        ],
        "tile_z int, tile_x int, tile_y int, path string, payload binary",
    )
    assert write_tile_tree(df2, root, resume=True) == 1   # only the new one
    back = read_tile_tree(spark, root, z=12).toPandas()
    got = {(r["tile_x"], r["file_y"]): bytes(r["payload"])
           for _, r in back.iterrows()}
    assert got[(1, 1)] == b"v1"     # finished work untouched
    assert got[(2, 2)] == b"v2"
