"""STACTA tiled-asset items (frmts/stacta/stactadataset.cpp)."""

import json
import os
import tempfile

import numpy as np

from gdal_spark.sources.stacta import read_stacta, write_stacta


def _tiles(spark):
    from gdal_spark.raster.png import encode_png

    rows = []
    for z, x, y in [(5, 10, 11), (5, 12, 11), (6, 20, 22)]:
        arr = np.full((8, 8, 3), z * 7 + x + y, np.uint8)
        rows.append((z, x, y, bytearray(encode_png(arr))))
    return spark.createDataFrame(
        rows, "tile_z int, tile_x int, tile_y int, payload binary"
    )


def test_item_structure_and_roundtrip(spark):
    root = os.path.join(tempfile.mkdtemp(), "stacta")
    item_path = write_stacta(_tiles(spark), root)
    item = json.load(open(item_path))
    tmpl = item["asset_templates"]["bands"]["href"]
    assert "{TileMatrix}" in tmpl and "{TileRow}" in tmpl \
        and "{TileCol}" in tmpl
    lim = item["properties"]["tiles:tile_matrix_links"][
        "WebMercatorQuad"]["limits"]
    assert lim["5"] == {"min_tile_col": 10, "max_tile_col": 12,
                        "min_tile_row": 11, "max_tile_row": 11}
    tms = item["properties"]["tiles:tile_matrix_sets"][
        "WebMercatorQuad"]
    ids = [m["identifier"] for m in tms["tileMatrix"]]
    assert ids == ["5", "6"]
    # tiles live at {TMS}/{z}/{row}/{col}.png
    assert os.path.exists(
        os.path.join(root, "WebMercatorQuad", "5", "11", "10.png"))
    back = {
        (r["tile_z"], r["tile_x"], r["tile_y"])
        for r in read_stacta(spark, item_path).collect()
    }
    assert back == {(5, 10, 11), (5, 12, 11), (6, 20, 22)}


def test_limits_filter_excludes_out_of_range_files(spark):
    root = os.path.join(tempfile.mkdtemp(), "stacta2")
    item_path = write_stacta(_tiles(spark), root)
    # plant a file outside the declared limits: must be ignored
    stray = os.path.join(root, "WebMercatorQuad", "5", "40")
    os.makedirs(stray)
    with open(os.path.join(stray, "40.png"), "wb") as fh:
        fh.write(b"not-a-tile")
    back = read_stacta(spark, item_path).collect()
    assert len(back) == 3
    assert all(r["tile_y"] != 40 for r in back)
