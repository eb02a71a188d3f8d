"""PMTiles v3 archive (sources/pmtiles.py) — Hilbert addressing,
varint directories, header layout (published v3 spec)."""

import gzip
import struct

import pytest

from gdal_spark.sources.pmtiles import (
    _parse_dir,
    _serialize_dir,
    read_pmtiles,
    tileid_to_zxy,
    write_pmtiles,
    zxy_to_tileid,
)


def test_tileid_spec_vectors():
    # the published spec's worked values
    assert zxy_to_tileid(0, 0, 0) == 0
    assert [zxy_to_tileid(1, *p) for p in
            [(0, 0), (0, 1), (1, 1), (1, 0)]] == [1, 2, 3, 4]
    assert zxy_to_tileid(2, 0, 0) == 5
    assert zxy_to_tileid(12, 3423, 1763) == 19078479


def test_tileid_bijection():
    for z in range(0, 8):
        step = max(1, (1 << z) // 3)
        for x in range(0, 1 << z, step):
            for y in range(0, 1 << z, step):
                assert tileid_to_zxy(zxy_to_tileid(z, x, y)) == (z, x, y)


def test_directory_roundtrip_clustered_and_not():
    ents = [(5, 0, 100, 1), (9, 100, 50, 2), (30, 150, 7, 1),
            (31, 300, 3, 1)]  # last entry breaks the cluster
    assert _parse_dir(_serialize_dir(ents)) == ents


def test_archive_roundtrip(spark, tmp_path):
    rows = [
        (3, 1, 2, bytearray(b"tile-a")),
        (3, 5, 5, bytearray(b"tile-b")),
        (4, 0, 0, bytearray(b"tile-c")),
    ]
    df = spark.createDataFrame(
        rows, "tile_z int, tile_x int, tile_y int, payload binary"
    )
    path = str(tmp_path / "a.pmtiles")
    assert write_pmtiles(df, path, fmt="png") == 3
    with open(path, "rb") as f:
        hdr = f.read(127)
    assert hdr[:7] == b"PMTiles" and hdr[7] == 3
    assert hdr[96] == 1 and hdr[97] == 2      # clustered, gzip dirs
    assert hdr[99] == 2                       # png tile type
    assert (hdr[100], hdr[101]) == (3, 4)     # zoom range
    root_off, root_len = struct.unpack_from("<QQ", hdr, 8)
    gzip.decompress(open(path, "rb").read()[root_off:root_off + root_len])
    back = read_pmtiles(spark, path).toPandas()
    back = back.sort_values(["tile_z", "tile_x"]).reset_index(drop=True)
    assert list(back["tile_z"]) == [3, 3, 4]
    got = {(r["tile_z"], r["tile_x"], r["tile_y"]): bytes(r["payload"])
           for _, r in back.iterrows()}
    assert got[(3, 1, 2)] == b"tile-a"
    assert got[(3, 5, 5)] == b"tile-b"
    assert got[(4, 0, 0)] == b"tile-c"
    assert set(back["fmt"]) == {"png"}


def test_empty_refuses(spark, tmp_path):
    df = spark.createDataFrame(
        [], "tile_z int, tile_x int, tile_y int, payload binary"
    )
    with pytest.raises(ValueError, match="empty"):
        write_pmtiles(df, str(tmp_path / "e.pmtiles"))


def test_leaf_directories_roundtrip(spark, tmp_path):
    """Archives past the root bound pack gzip leaf directories with
    run_length=0 root pointers; the reader resolves them."""
    import struct as _struct

    rows = [
        (10, i % 1024, i // 1024, bytearray(f"t{i}".encode()))
        for i in range(900)
    ]
    df = spark.createDataFrame(
        rows, "tile_z int, tile_x int, tile_y int, payload binary"
    )
    path = str(tmp_path / "leafy.pmtiles")
    assert write_pmtiles(df, path, root_max=100) == 900
    hdr = open(path, "rb").read(127)
    _lo, leaf_len = _struct.unpack_from("<QQ", hdr, 40)
    assert leaf_len > 0                      # leaves actually present
    back = read_pmtiles(spark, path).toPandas()
    assert len(back) == 900
    got = {(r["tile_x"], r["tile_y"]): bytes(r["payload"])
           for _, r in back.iterrows()}
    assert got[(5, 0)] == b"t5"
    assert got[(899 % 1024, 0)] == b"t899"
