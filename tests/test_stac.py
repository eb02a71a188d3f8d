"""STAC ItemCollection scan (sources/stac.py) vs hand-built goldens.

Reference semantics: /root/reference/frmts/stacit/stacitdataset.cpp
(ParseAsset skip rules :185-425, SetupDataset mosaic math :430-520,
ascending-datetime compositing :582).
"""

import json
import os

import pytest
from pyspark.sql import functions as F

from gdal_spark.fixtures import stacfix
from gdal_spark.sources.stac import (
    latest_item_per_point,
    mosaic_params,
    read_stac_items,
    write_stac_pages,
)


def _write_doc(path, features):
    with open(path, "w") as fh:
        json.dump({"type": "FeatureCollection", "features": features}, fh)


def _item(i, coll="c1", asset="data", dt="2021-01-01T00:00:00Z", **kw):
    """One hand-built STAC feature; kw merges into the asset dict and
    props_extra into properties."""
    props = {"datetime": dt}
    props.update(kw.pop("props_extra", {}))
    a = {
        "href": f"s3://b/item_{i}/x.tif",
        "type": "image/tiff; application=geotiff",
    }
    a.update(kw)
    return {
        "type": "Feature",
        "id": f"item_{i}",
        "collection": coll,
        "properties": props,
        "assets": {asset: a},
    }


@pytest.fixture(scope="module")
def catalog_dir(tmp_path_factory):
    return str(tmp_path_factory.mktemp("stac"))


def test_skip_rules_and_extents(spark, catalog_dir):
    feats = [
        # valid: bbox + shape
        _item(0, **{"proj:epsg": 32633, "proj:bbox": [10, 20, 40, 60],
                    "proj:shape": [20, 30]}),
        # valid: bbox + transform (consistent origin)
        _item(1, **{"proj:epsg": 32633, "proj:bbox": [0, 0, 30, 40],
                    "proj:transform": [3, 0, 0, 0, -4, 40]}),
        # valid: shape + 9-element transform
        _item(2, **{"proj:epsg": 32633, "proj:shape": [5, 6],
                    "proj:transform": [2, 0, 100, 0, -2, 200, 0, 0, 1]}),
        # skipped: json type
        _item(3, type="application/json",
              **{"proj:epsg": 32633, "proj:bbox": [0, 0, 1, 1],
                 "proj:shape": [1, 1]}),
        # skipped: thumbnail role
        _item(4, roles=["thumbnail"],
              **{"proj:epsg": 32633, "proj:bbox": [0, 0, 1, 1],
                 "proj:shape": [1, 1]}),
        # skipped: no CRS member
        _item(5, **{"proj:bbox": [0, 0, 1, 1], "proj:shape": [1, 1]}),
        # skipped: inconsistent bbox/transform origin
        _item(6, **{"proj:epsg": 32633, "proj:bbox": [5, 0, 10, 10],
                    "proj:transform": [1, 0, 4, 0, -1, 10]}),
        # skipped: invalid transform (positive y-res), shape only
        _item(7, **{"proj:epsg": 32633, "proj:shape": [2, 2],
                    "proj:transform": [1, 0, 0, 0, 1, 0]}),
        # skipped: only one member
        _item(8, **{"proj:epsg": 32633, "proj:shape": [2, 2]}),
        # valid: proj members on feature properties, proj:code form
        _item(9, props_extra={"proj:code": "EPSG:4326",
                              "proj:bbox": [1, 2, 3, 4],
                              "proj:shape": [2, 2]}),
    ]
    _write_doc(os.path.join(catalog_dir, "page_0.json"), feats)
    items = read_stac_items(spark, catalog_dir).toPandas()
    got = {
        r.href: (r.crs, r.xmin, r.ymin, r.xmax, r.ymax, r.w, r.h)
        for r in items.itertuples()
    }
    assert set(got) == {f"s3://b/item_{i}/x.tif" for i in (0, 1, 2, 9)}
    assert got["s3://b/item_0/x.tif"] == ("EPSG:32633", 10, 20, 40, 60, 30, 20)
    # bbox+transform: w = (30-0)/3, h = (40-0)/4
    assert got["s3://b/item_1/x.tif"] == ("EPSG:32633", 0, 0, 30, 40, 10, 10)
    # shape+transform: xmax = 100+6*2, ymin = 200-5*2
    assert got["s3://b/item_2/x.tif"] == ("EPSG:32633", 100, 190, 112, 200, 6, 5)
    assert got["s3://b/item_9/x.tif"] == ("EPSG:4326", 1, 2, 3, 4, 2, 2)


def test_asset_overrides_feature_property(spark, tmp_path):
    f = _item(
        0,
        props_extra={"proj:epsg": 4326, "proj:bbox": [0, 0, 8, 8],
                     "proj:shape": [8, 8]},
        **{"proj:epsg": 32633},
    )
    _write_doc(str(tmp_path / "page_0.json"), [f])
    row = read_stac_items(spark, str(tmp_path)).collect()[0]
    # asset-level epsg wins; bbox/shape fall back to the feature
    assert row["crs"] == "EPSG:32633"
    assert (row["xmax"], row["w"]) == (8, 8)


def test_mosaic_resolution_modes(spark, tmp_path):
    feats = [
        _item(0, dt="2021-01-01T00:00:00Z",
              **{"proj:epsg": 1, "proj:bbox": [0, 0, 10, 10],
                 "proj:shape": [10, 10]}),       # res 1
        _item(1, dt="2021-01-01T00:00:01Z",
              **{"proj:epsg": 1, "proj:bbox": [10, 10, 40, 40],
                 "proj:shape": [10, 10]}),       # res 3
    ]
    _write_doc(str(tmp_path / "page_0.json"), feats)
    items = read_stac_items(spark, str(tmp_path))
    avg = mosaic_params(items, "AVERAGE").collect()[0]
    # bounds union 0..40; avg res (1+3)/2 = 2 -> 20 px
    assert (avg["xmin"], avg["ymax"], avg["nx"], avg["ny"]) == (0, 40, 20, 20)
    hi = mosaic_params(items, "HIGHEST").collect()[0]
    assert (hi["nx"], hi["ny"]) == (40, 40)
    lo = mosaic_params(items, "LOWEST").collect()[0]
    assert (lo["nx"], lo["ny"]) == (13, 13)  # round(40/3)


def test_latest_item_wins(spark, tmp_path):
    feats = [
        _item(0, dt="2021-01-02T00:00:00Z",
              **{"proj:epsg": 1, "proj:bbox": [0, 0, 10, 10],
                 "proj:shape": [10, 10]}),
        _item(1, dt="2021-01-03T00:00:00Z",
              **{"proj:epsg": 1, "proj:bbox": [5, 5, 15, 15],
                 "proj:shape": [10, 10]}),
    ]
    _write_doc(str(tmp_path / "page_0.json"), feats)
    items = read_stac_items(spark, str(tmp_path))
    probes = spark.createDataFrame(
        [(0, 7, 7), (1, 2, 2), (2, 14, 14), (3, 30, 30)],
        "p long, px long, py long",
    )
    top = {
        r["p"]: (r["top_href"], r["n_cover"])
        for r in latest_item_per_point(items, probes, cell=8).collect()
    }
    assert top[0] == ("s3://b/item_1/x.tif", 2)  # overlap: newest wins
    assert top[1] == ("s3://b/item_0/x.tif", 1)
    assert top[2] == ("s3://b/item_1/x.tif", 1)
    assert 3 not in top  # uncovered probe emits no row


def test_fixture_pages_roundtrip(spark, tmp_path):
    """The fixture writer + scan: every non-skip row comes back with
    the closed-form extent; every planted skip row is dropped."""
    ids = spark.range(0, 120).select(F.col("id").alias("i"))
    params = stacfix.item_params(ids)
    write_stac_pages(stacfix.feature_json(params), str(tmp_path))
    # pages exist and carry next-links
    assert os.path.exists(str(tmp_path / "page_0.json"))
    back = read_stac_items(spark, str(tmp_path))
    got = back.select(
        F.regexp_extract("href", r"item_(\d+)", 1).cast("long").alias("i"),
        "xmin", "ymax", "w", "h", "crs",
    ).toPandas().set_index("i")
    exp = params.filter(~F.col("skip").isin(1, 2, 3, 4, 5)).toPandas()
    assert set(got.index) == set(exp["i"])
    for r in exp.itertuples():
        g = got.loc[r.i]
        assert (g.xmin, g.ymax, g.w, g.h) == (r.x0, r.y0, r.w, r.h)
        assert g.crs == f"EPSG:{r.epsg}"
