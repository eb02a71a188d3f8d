"""Esri Compact Cache V2 bundles (frmts/esric/esric_dataset.cpp)."""

import os
import struct
import tempfile

import numpy as np

from gdal_spark.sources.esric import BSZ, read_esric, write_esric


def _tiles_df(spark):
    from gdal_spark.raster.png import encode_png

    rows = []
    # spread across two bundles at z=9 (x 5 vs x 130) and one at z=3
    for z, x, y in [(9, 5, 7), (9, 130, 7), (9, 6, 7), (3, 1, 2)]:
        arr = np.full((8, 8, 3), (z * 41 + x * 3 + y) % 256, np.uint8)
        rows.append((z, x, y, bytearray(encode_png(arr))))
    return spark.createDataFrame(
        rows, "tile_z int, tile_x int, tile_y int, payload binary"
    )


def test_bundle_tree_and_roundtrip(spark):
    root = os.path.join(tempfile.mkdtemp(), "cache")
    conf = write_esric(_tiles_df(spark), root, tile_size=8)
    assert conf.endswith("conf.xml")
    doc = open(conf).read()
    assert "esriMapCacheStorageModeCompactV2" in doc
    assert "<PacketSize>128</PacketSize>" in doc
    # bundle naming: 128-aligned groups, hex row/col (R%04xC%04x)
    l9 = sorted(os.listdir(os.path.join(root, "_alllayers", "L09")))
    assert l9 == ["R0000C0000.bundle", "R0000C0080.bundle"]
    back = {
        (r["tile_z"], r["tile_x"], r["tile_y"])
        for r in read_esric(spark, root).collect()
    }
    assert back == {(9, 5, 7), (9, 130, 7), (9, 6, 7), (3, 1, 2)}


def test_bundle_header_and_index_fields(spark):
    root = os.path.join(tempfile.mkdtemp(), "cache")
    write_esric(_tiles_df(spark), root, tile_size=8)
    path = os.path.join(root, "_alllayers", "L09", "R0000C0000.bundle")
    blob = open(path, "rb").read()
    # checked header slots (Bundle::Init :127-133)
    for off, want in ((0, 3), (4, BSZ * BSZ), (12, 5), (32, 40),
                      (36, 0), (60, BSZ * BSZ * 8)):
        assert struct.unpack_from("<I", blob, off)[0] == want, off
    # record for tile (x=5, y=7): low 40 bits offset, high bits size
    (v,) = struct.unpack_from("<Q", blob, 64 + 8 * (7 * BSZ + 5))
    off, size = v & 0xFFFFFFFFFF, v >> 40
    assert size > 0 and off >= 64 + 8 * BSZ * BSZ
    assert blob[off : off + 8].startswith(b"\x89PNG")
    # absent tile record is zero
    (v0,) = struct.unpack_from("<Q", blob, 64 + 8 * (0 * BSZ + 0))
    assert v0 == 0


def test_payload_fidelity(spark):
    from gdal_spark.raster.png import decode_png

    root = os.path.join(tempfile.mkdtemp(), "cache")
    write_esric(_tiles_df(spark), root, tile_size=8)
    for r in read_esric(spark, root).collect():
        arr = decode_png(bytes(r["payload"]))
        want = (r["tile_z"] * 41 + r["tile_x"] * 3 + r["tile_y"]) % 256
        assert (arr == want).all()
