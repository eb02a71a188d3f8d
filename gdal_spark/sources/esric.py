"""ESRIC — Esri Compact Cache V2 bundles (frmts/esric/esric_dataset.cpp).

Layout re-derived from the reference:

- ``conf.xml``: a ``CacheInfo`` document — CacheStorageInfo
  (StorageFormat esriMapCacheStorageModeCompactV2, PacketSize 128,
  :247-256), TileCacheInfo (TileOrigin + one LODInfo Resolution per
  level), TileImageInfo CacheTileFormat (:314);
- bundles live at ``_alllayers/L{lod:02d}/R{row:04x}C{col:04x}.bundle``
  where row/col are the 128-aligned tile-group origins (:854-855);
- a bundle is a 64-byte header whose checked fields are u32 LE
  ``[0]=3, [4]=BSZ*BSZ, [12]=5, [32]=40, [36]=0, [60]=BSZ*BSZ*8``
  (Bundle::Init :127-133), then 128*128 u64 LE index records —
  ``offset = v & 0xFFFFFFFFFF`` (low 40 bits), ``size = v >> 40``
  (:864-865) — then the tile payloads; record index =
  ``(row % 128) * 128 + (col % 128)`` (:863); size 0 = missing tile
  reads as empty (:866-870).

Scale shape: the bundle is the format's parallel unit — reads run
one task per bundle (each task opens only its bundle, walks the
index, emits its tiles); the writer streams bundle-sorted tiles so
exactly one bundle is in memory at a time.
"""

from __future__ import annotations

import os
import struct

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["write_esric", "read_esric"]

BSZ = 128


def _bundle_bytes(tiles: dict[int, bytes]) -> bytes:
    """{record index -> payload} -> one V2 bundle file."""
    header = bytearray(64)
    struct.pack_into("<I", header, 0, 3)
    struct.pack_into("<I", header, 4, BSZ * BSZ)
    struct.pack_into("<I", header, 12, 5)
    struct.pack_into("<I", header, 32, 40)
    struct.pack_into("<I", header, 36, 0)
    struct.pack_into("<I", header, 60, BSZ * BSZ * 8)
    index = bytearray(8 * BSZ * BSZ)
    data = bytearray()
    base = 64 + len(index)
    for rec, payload in sorted(tiles.items()):
        off = base + len(data)
        if off >= 1 << 40:
            raise ValueError("esric: bundle exceeds 40-bit offsets")
        struct.pack_into("<Q", index, 8 * rec,
                         (len(payload) << 40) | off)
        data += payload
    return bytes(header) + bytes(index) + bytes(data)


def write_esric(
    df: DataFrame,
    out_dir: str,
    fmt: str = "PNG",
    tile_size: int = 256,
) -> str:
    """Stream (tile_z, tile_x, tile_y XYZ, payload) rows into a
    compact cache V2 tree over the web-mercator tiling; returns the
    conf.xml path."""
    from gdal_spark.tiles import tilemath as tm

    zs = sorted(int(r["tile_z"]) for r in
                df.select("tile_z").distinct().toLocalIterator())
    lods = "".join(
        f"<LODInfo><LevelID>{z}</LevelID>"
        f"<Scale>{1.0}</Scale>"
        f"<Resolution>{tm.resolution(z, tile_size)!r}</Resolution>"
        f"</LODInfo>"
        for z in zs
    )
    conf = (
        "<CacheInfo>"
        "<TileCacheInfo>"
        f"<TileOrigin><X>{-tm.ORIGIN!r}</X><Y>{tm.ORIGIN!r}</Y>"
        "</TileOrigin>"
        f"<TileCols>{tile_size}</TileCols>"
        f"<TileRows>{tile_size}</TileRows>"
        f"<LODInfos>{lods}</LODInfos>"
        "</TileCacheInfo>"
        "<CacheStorageInfo>"
        "<StorageFormat>esriMapCacheStorageModeCompactV2"
        "</StorageFormat><PacketSize>128</PacketSize>"
        "</CacheStorageInfo>"
        "<TileImageInfo>"
        f"<CacheTileFormat>{fmt}</CacheTileFormat>"
        "</TileImageInfo>"
        "</CacheInfo>"
    )
    os.makedirs(out_dir, exist_ok=True)
    conf_path = os.path.join(out_dir, "conf.xml")
    with open(conf_path, "w") as fh:
        fh.write(conf)

    ordered = df.orderBy(
        "tile_z",
        (F.col("tile_y") / BSZ).cast("int"),
        (F.col("tile_x") / BSZ).cast("int"),
    )
    cur_key = None
    cur: dict[int, bytes] = {}

    def flush():
        if cur_key is None:
            return
        z, by, bx = cur_key
        d = os.path.join(out_dir, "_alllayers", f"L{z:02d}")
        os.makedirs(d, exist_ok=True)
        with open(os.path.join(d, f"R{by:04x}C{bx:04x}.bundle"),
                  "wb") as fh:
            fh.write(_bundle_bytes(cur))

    for r in ordered.toLocalIterator():
        z, x, y = int(r["tile_z"]), int(r["tile_x"]), int(r["tile_y"])
        key = (z, (y // BSZ) * BSZ, (x // BSZ) * BSZ)
        if key != cur_key:
            flush()
            cur_key, cur = key, {}
        cur[(y % BSZ) * BSZ + (x % BSZ)] = bytes(r["payload"])
    flush()
    return conf_path


_READ_SCHEMA = T.StructType(
    [
        T.StructField("tile_z", T.IntegerType()),
        T.StructField("tile_x", T.IntegerType()),
        T.StructField("tile_y", T.IntegerType()),
        T.StructField("payload", T.BinaryType()),
    ]
)


def read_esric(spark: SparkSession, cache_dir: str) -> DataFrame:
    """Distributed compact-cache scan: one task per bundle."""
    root = os.path.join(cache_dir, "_alllayers")
    bundles = []
    for lvl in sorted(os.listdir(root)):
        if not lvl.startswith("L"):
            continue
        z = int(lvl[1:])
        for fn in sorted(os.listdir(os.path.join(root, lvl))):
            if fn.endswith(".bundle"):
                by = int(fn[1:5], 16)
                bx = int(fn[6:10], 16)
                bundles.append(
                    (z, by, bx, os.path.join(root, lvl, fn)))
    if not bundles:
        return spark.createDataFrame([], _READ_SCHEMA)
    bdf = spark.createDataFrame(
        bundles, "z int, by int, bx int, path string"
    )

    def scan(batches):
        for pdf in batches:
            recs = []
            for z, by, bx, path in zip(
                pdf["z"], pdf["by"], pdf["bx"], pdf["path"]
            ):
                with open(path, "rb") as fh:
                    blob = fh.read()
                if len(blob) < 64 + 8 * BSZ * BSZ:
                    raise ValueError(f"esric: short bundle {path}")
                if (struct.unpack_from("<I", blob, 0)[0] != 3
                        or struct.unpack_from("<I", blob, 32)[0] != 40):
                    raise ValueError(f"esric: bad bundle header {path}")
                for rec in range(BSZ * BSZ):
                    (v,) = struct.unpack_from("<Q", blob, 64 + 8 * rec)
                    size = v >> 40
                    if size == 0:
                        continue
                    off = v & 0xFFFFFFFFFF
                    recs.append(
                        {
                            "tile_z": int(z),
                            "tile_x": int(bx) + rec % BSZ,
                            "tile_y": int(by) + rec // BSZ,
                            "payload": blob[off : off + size],
                        }
                    )
            yield pd.DataFrame(
                recs, columns=[f.name for f in _READ_SCHEMA.fields]
            )

    return bdf.mapInPandas(scan, _READ_SCHEMA)
