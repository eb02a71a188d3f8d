"""gdal raster pipeline grammar (operators/raster_pipeline.py)."""

import numpy as np
import pytest

from gdal_spark.operators import raster_pipeline as rp
from gdal_spark.raster import dem
from gdal_spark.raster.png import encode_png


def _images(spark, arrs):
    rows = [
        (f"img{i}", "png", bytearray(encode_png(a)))
        for i, a in enumerate(arrs)
    ]
    return spark.createDataFrame(
        rows, "image_id string, fmt string, bytes binary"
    )


def test_parse_accepts_both_arg_spellings():
    steps = rp.parse_pipeline(
        "read ! clip --srcwin=1,2,3,4 ! set-type Byte ! write"
    )
    assert [s[0] for s in steps] == ["read", "clip", "set-type", "write"]
    assert steps[1][1]["srcwin"] == "1,2,3,4"
    assert steps[2][1]["_positional"] == "Byte"


def test_parse_requires_read_and_write():
    with pytest.raises(ValueError, match="read"):
        rp.parse_pipeline("clip --srcwin 0,0,2,2 ! write")
    with pytest.raises(ValueError, match="read"):
        rp.parse_pipeline("read ! clip --srcwin 0,0,2,2")


def test_unknown_step_raises():
    with pytest.raises(ValueError, match="unknown step"):
        rp.parse_pipeline("read ! fizz ! write")
        rp.run_raster_pipeline(None, "read ! fizz ! write")


def test_chain_matches_numpy(spark):
    a = (np.arange(20 * 16 * 3) % 256).reshape(20, 16, 3).astype(np.uint8)
    out = rp.run_raster_pipeline(
        _images(spark, [a]),
        "read ! clip --srcwin 2,1,10,8 ! select --band 2,1 "
        "! calc --expr 'A*3+B' ! scale --src-min 0 --src-max 1020 "
        "--dst-max 200 ! set-type Byte ! write",
    ).collect()
    assert len(out) == 1
    r = out[0]
    ref = a[1:9, 2:12].astype(np.float64)
    v = ref[:, :, 1] * 3 + ref[:, :, 0]
    v = np.clip(np.floor(v * 200.0 / 1020.0 + 0.5), 0, 255)
    assert (r["out_w"], r["out_h"]) == (10, 8)
    assert r["vsum"] == int(v.sum())


def test_dem_step_uses_edge_padding(spark):
    a = (np.add.outer(np.arange(12), np.arange(12)) * 7 % 200).astype(
        np.uint8
    )
    out = rp.run_raster_pipeline(
        _images(spark, [a]),
        "read ! hillshade --azimuth 315 --altitude 45 ! write",
    ).collect()[0]
    padded = np.pad(a.astype(np.float64), 1, mode="edge")
    ref = dem.hillshade(padded, 315.0, 45.0)
    assert out["vsum"] == int(ref.astype(np.int64).sum())
    assert (out["out_w"], out["out_h"]) == (12, 12)


def test_dem_step_rejects_multiband(spark):
    a = (np.arange(8 * 8 * 3) % 250).reshape(8, 8, 3).astype(np.uint8)
    with pytest.raises(Exception, match="single band"):
        rp.run_raster_pipeline(
            _images(spark, [a]), "read ! slope ! write"
        ).collect()


def test_reclassify_step(spark):
    a = (np.arange(10 * 10) % 256).reshape(10, 10).astype(np.uint8)
    out = rp.run_raster_pipeline(
        _images(spark, [a]),
        'read ! reclassify --mapping "[0,127]=0;[128,255]=1" ! write',
    ).collect()[0]
    assert out["vsum"] == int((a >= 128).sum())


def test_color_map_emits_three_bands(spark):
    a = (np.arange(6 * 6) % 256).reshape(6, 6).astype(np.uint8)
    out = rp.run_raster_pipeline(
        _images(spark, [a]), "read ! color-map ! write"
    ).collect()
    assert sorted(r["band"] for r in out) == [0, 1, 2]


# --- vector pipeline grammar --------------------------------------------------

def test_vector_pipeline_grammar(spark):
    from gdal_spark.geo.wkb import wkb_polygon
    from gdal_spark.operators.vector_pipeline import run_vector_pipeline

    def sq(x, y, s=2.0):
        return bytearray(
            wkb_polygon([[(x, y), (x + s, y), (x + s, y + s), (x, y + s),
                          (x, y)]])
        )

    rows = [
        (0, "park", sq(5.0, 30.0)),
        (1, "lot", sq(6.0, 31.0)),
        (2, "park", sq(200.0, 200.0)),
    ]
    df = spark.createDataFrame(
        rows, "fid long, kind string, geometry binary"
    )
    out = run_vector_pipeline(
        df,
        'read ! filter --where "kind = \'park\'" ! swap-xy '
        "! clip --bbox 0,0,50,50 ! write",
    ).collect()
    # fid 1 filtered out; fid 2 swaps to (200,200), outside the bbox;
    # fid 0 swaps to (30,5), inside
    assert [r["fid"] for r in out] == [0]


def test_vector_pipeline_unknown_step(spark):
    import pytest as _pt

    from gdal_spark.operators.vector_pipeline import run_vector_pipeline

    df = spark.createDataFrame([(0,)], "fid long")
    with _pt.raises(ValueError, match="unknown step"):
        run_vector_pipeline(df, "read ! fizzbuzz ! write")


def test_driver_registry_modules_exist():
    import os

    from gdal_spark.operators.info import DRIVERS

    root = os.path.join(os.path.dirname(__file__), "..", "gdal_spark")
    for *_, mod in DRIVERS:
        assert os.path.exists(os.path.join(root, mod)), mod
    names = [n for n, *_ in DRIVERS]
    assert len(names) == len(set(names))


def test_unscale_step(spark):
    a = (np.arange(8 * 8) % 256).reshape(8, 8, 1).astype(np.uint8)
    out = rp.run_raster_pipeline(
        _images(spark, [a]),
        "read ! unscale --scale 0.25 --offset -3.5 ! write",
    ).collect()
    want = a[:, :, 0].astype(np.float64) * 0.25 - 3.5
    # the stats sink truncates to int64 per pixel before summing
    assert out[0]["vsum"] == int(want.astype(np.int64).sum())
    assert (out[0]["out_w"], out[0]["out_h"]) == (8, 8)
