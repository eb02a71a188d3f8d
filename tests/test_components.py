"""Connected components / sieve / fillnodata / polygonize / footprint."""

import numpy as np

from gdal_spark.raster.components import (
    component_sizes,
    fill_nodata,
    label_components,
    sieve_filter,
)


def test_label_components_4conn():
    arr = np.array(
        [
            [1, 1, 2, 2],
            [1, 3, 3, 2],
            [4, 4, 3, 2],
            [4, 1, 1, 2],
        ]
    )
    labels = label_components(arr, 4)
    # the two 1-regions are separate; 2/3/4 regions are single
    ids = {}
    for v in [1, 2, 3, 4]:
        ids[v] = set(labels[arr == v].tolist())
    assert len(ids[1]) == 2
    assert len(ids[2]) == 1 and len(ids[3]) == 1 and len(ids[4]) == 1
    assert component_sizes(labels).sum() == 16


def test_label_components_8conn_diagonal():
    arr = np.array([[1, 0], [0, 1]])
    assert len(set(label_components(arr, 4)[arr == 1].tolist())) == 2
    assert len(set(label_components(arr, 8)[arr == 1].tolist())) == 1


def test_sieve_removes_small():
    arr = np.zeros((6, 6), dtype=np.int64)
    arr[2, 2] = 9  # single-pixel speck
    out = sieve_filter(arr, threshold=2)
    assert (out == 0).all()
    # threshold 1 keeps everything
    arr2 = np.zeros((4, 4), dtype=np.int64)
    arr2[0, 0] = 5
    assert (sieve_filter(arr2, threshold=1) == arr2).all()


def test_fill_nodata_idw():
    arr = np.full((5, 5), 10.0)
    arr[2, 2] = -1.0
    out = fill_nodata(arr, nodata=-1.0, max_search_dist=2)
    assert out[2, 2] == 10.0
    # unreachable hole stays nodata
    big = np.full((40, 40), -1.0)
    big[0, 0] = 7.0
    out2 = fill_nodata(big, nodata=-1.0, max_search_dist=2)
    assert out2[30, 30] == -1.0
    assert out2[1, 1] == 7.0


def test_footprint_hull_and_bbox(spark):
    from pyspark.sql import functions as F

    from gdal_spark.fixtures.images import build_images
    from gdal_spark.geo.geom import polygon_area
    from gdal_spark.geo.wkb import parse_wkb
    from gdal_spark.operators.vectorize import footprint

    ids = spark.range(1).selectExpr("id + 3 as i")  # png 257x100
    images = build_images(spark, ids_df=ids, with_payload=True)
    r = footprint(images).collect()[0]
    # zeros lie on (x+y+3) % 256 == 0 diagonals; most pixels valid
    assert r["n_valid"] > 0.98 * 257 * 100
    assert (r["vxmin"], r["vymin"]) == (0, 0)
    assert (r["vxmax"], r["vymax"]) == (256, 99)
    hull = parse_wkb(bytes(r["hull"]))
    area = polygon_area([hull.parts[0]])
    assert 0.9 * 257 * 100 < area <= 257 * 100
