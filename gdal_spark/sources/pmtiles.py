"""PMTiles v3 tile-archive source/sink — the reference's PMTiles
driver surface (ogr/ogrsf_frmts/pmtiles + frmts/mbtiles family;
format re-derived from the published PMTiles v3 specification,
https://github.com/protomaps/PMTiles/blob/main/spec/v3):

- 127-byte header (magic, section offsets/lengths, compression and
  tile-type enums, zoom/bounds/center)
- Hilbert tile addressing: tile_id = (4^z - 1)/3 + hilbert_d(z,x,y)
- root directory of (tile_id delta, run_length, length, offset)
  varint columns, gzip-compressed; offset 0-varint means "previous
  entry's offset + length" (clustered layout)
- gzip JSON metadata section

Write: single-file funnel (the archive is one seekable file by
design) — entries stream through sorted toLocalIterator; payload
bytes land clustered in tile_id order.  Read: header + directory
parse driver-side (metadata-sized by design), then DISTRIBUTED
byte-range payload reads (each task seeks its slice — the
netcdf/zarr slab-read pattern).

Directories: root-only up to 16384 entries (the spec's one-request
guidance); larger archives pack entries into gzip leaf directories
with run_length=0 root pointers, and the reader resolves both
layouts.
"""

from __future__ import annotations

import gzip
import json
import os
import struct

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

__all__ = [
    "write_pmtiles", "read_pmtiles", "zxy_to_tileid", "tileid_to_zxy",
]

_MAGIC = b"PMTiles"
_ROOT_MAX = 16384    # spec guidance: the root fits one request
_LEAF_SIZE = 4096    # entries per leaf directory
_TILE_TYPES = {"mvt": 1, "png": 2, "jpeg": 3, "webp": 4}
_TILE_TYPE_NAMES = {v: k for k, v in _TILE_TYPES.items()}


def zxy_to_tileid(z: int, x: int, y: int) -> int:
    """PMTiles Hilbert tile id: pyramid offset + Hilbert d at level z
    (spec: 0 -> z0, 1..4 -> z1 in  (0,0),(0,1),(1,1),(1,0) order)."""
    acc = (4 ** z - 1) // 3
    s = 2 ** z // 2
    d = 0
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x = s - 1 - x
                y = s - 1 - y
            x, y = y, x
        s //= 2
    return acc + d


def tileid_to_zxy(tile_id: int) -> tuple[int, int, int]:
    z = 0
    acc = 0
    while acc + 4 ** z <= tile_id:
        acc += 4 ** z
        z += 1
    d = tile_id - acc
    n = 2 ** z
    x = y = 0
    s = 1
    while s < n:
        rx = 1 & (d // 2)
        ry = 1 & (d ^ rx)
        if ry == 0:
            if rx == 1:
                x = s - 1 - x
                y = s - 1 - y
            x, y = y, x
        x += s * rx
        y += s * ry
        d //= 4
        s *= 2
    return z, x, y


def _varint(v: int) -> bytes:
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _read_varint(buf: bytes, pos: int) -> tuple[int, int]:
    shift = 0
    val = 0
    while True:
        b = buf[pos]
        pos += 1
        val |= (b & 0x7F) << shift
        if not b & 0x80:
            return val, pos
        shift += 7


def _serialize_dir(entries: list[tuple[int, int, int, int]]) -> bytes:
    """entries: (tile_id, offset, length, run_length) sorted by id."""
    out = bytearray(_varint(len(entries)))
    last = 0
    for tid, _off, _ln, _rl in entries:
        out += _varint(tid - last)
        last = tid
    for _tid, _off, _ln, rl in entries:
        out += _varint(rl)
    for _tid, _off, ln, _rl in entries:
        out += _varint(ln)
    prev_end = None
    for _tid, off, ln, _rl in entries:
        if prev_end is not None and off == prev_end:
            out += _varint(0)  # clustered: previous offset + length
        else:
            out += _varint(off + 1)
        prev_end = off + ln
    return bytes(out)


def _parse_dir(buf: bytes) -> list[tuple[int, int, int, int]]:
    n, pos = _read_varint(buf, 0)
    tids = []
    last = 0
    for _ in range(n):
        d, pos = _read_varint(buf, pos)
        last += d
        tids.append(last)
    rls = []
    for _ in range(n):
        v, pos = _read_varint(buf, pos)
        rls.append(v)
    lns = []
    for _ in range(n):
        v, pos = _read_varint(buf, pos)
        lns.append(v)
    entries = []
    prev_end = 0
    for i in range(n):
        v, pos = _read_varint(buf, pos)
        off = prev_end if v == 0 else v - 1
        entries.append((tids[i], off, lns[i], rls[i]))
        prev_end = off + lns[i]
    return entries


def write_pmtiles(tiles: DataFrame, path: str, fmt: str = "png",
                  metadata: dict | None = None,
                  root_max: int = _ROOT_MAX) -> int:
    """Archive encode_tiles rows (tile_z, tile_x, tile_y, payload)
    into one .pmtiles file; returns the tile count.

    Scale shape: tile ids compute in an Arrow batch kernel and the
    CLUSTER ORDER comes from a distributed sort — the driver streams
    the sorted iterator and spools payload bytes straight to a temp
    data file (memory O(one partition + the 16-byte-per-tile entry
    list), never the payload bytes)."""
    import pandas as pd
    from pyspark.sql import types as T

    tile_type = _TILE_TYPES[fmt]
    id_schema = T.StructType(
        [
            T.StructField("tile_id", T.LongType()),
            T.StructField("tile_z", T.IntegerType()),
            T.StructField("payload", T.BinaryType()),
        ]
    )

    def with_ids(batches):
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "tile_id": [
                        zxy_to_tileid(int(z), int(x), int(y))
                        for z, x, y in zip(pdf["tile_z"], pdf["tile_x"],
                                           pdf["tile_y"])
                    ],
                    "tile_z": pdf["tile_z"],
                    "payload": pdf["payload"],
                }
            )

    ordered = (
        tiles.select("tile_z", "tile_x", "tile_y", "payload")
        .mapInPandas(with_ids, id_schema)
        .sort("tile_id")
    )
    entries = []
    zmin, zmax = 99, 0
    data_tmp = path + ".data.tmp"
    data_len = 0
    with open(data_tmp, "wb") as df_out:
        for r in ordered.toLocalIterator():
            payload = bytes(r["payload"])
            entries.append((int(r["tile_id"]), data_len, len(payload), 1))
            df_out.write(payload)
            data_len += len(payload)
            zmin = min(zmin, int(r["tile_z"]))
            zmax = max(zmax, int(r["tile_z"]))
    if not entries:
        os.remove(data_tmp)
        raise ValueError("pmtiles: empty tile set")
    n_tiles = len(entries)
    # root-only up to the spec's guidance bound; beyond it, entries
    # pack into gzip leaf directories and the root carries
    # run_length=0 pointers (tile_id = leaf's first id, offset/length
    # into the leaf section)
    leaves = b""
    if len(entries) > root_max:
        root_entries = []
        leaf_parts = []
        leaf_off = 0
        for i in range(0, len(entries), _LEAF_SIZE):
            group = entries[i:i + _LEAF_SIZE]
            blob = gzip.compress(_serialize_dir(group), mtime=0)
            root_entries.append((group[0][0], leaf_off, len(blob), 0))
            leaf_parts.append(blob)
            leaf_off += len(blob)
        leaves = b"".join(leaf_parts)
        entries = root_entries
    root = gzip.compress(_serialize_dir(entries), mtime=0)
    meta = gzip.compress(
        json.dumps(metadata or {"name": "gdal_spark"}).encode(), mtime=0
    )
    hdr_len = 127
    root_off = hdr_len
    meta_off = root_off + len(root)
    leaf_off = meta_off + len(meta)
    data_off = leaf_off + len(leaves)
    hdr = bytearray()
    hdr += _MAGIC + bytes([3])
    hdr += struct.pack("<QQ", root_off, len(root))
    hdr += struct.pack("<QQ", meta_off, len(meta))
    hdr += struct.pack("<QQ", leaf_off, len(leaves))
    hdr += struct.pack("<QQ", data_off, data_len)
    hdr += struct.pack("<QQQ", n_tiles, n_tiles, n_tiles)
    hdr += bytes([1, 2, 1, tile_type])  # clustered, gzip dirs, raw tiles
    hdr += bytes([zmin, zmax])
    hdr += struct.pack("<4i", -1800000000, -850000000,
                       1800000000, 850000000)
    hdr += bytes([zmin])
    hdr += struct.pack("<2i", 0, 0)
    assert len(hdr) == hdr_len, len(hdr)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(bytes(hdr))
        f.write(root)
        f.write(meta)
        f.write(leaves)
        with open(data_tmp, "rb") as src:
            while True:
                block = src.read(1 << 20)
                if not block:
                    break
                f.write(block)
    os.remove(data_tmp)
    os.replace(tmp, path)
    return n_tiles


def read_pmtiles(spark: SparkSession, path: str) -> DataFrame:
    """-> (tile_z, tile_x, tile_y, fmt, payload); directory parses
    driver-side, payload byte-ranges read distributed."""
    with open(path, "rb") as f:
        hdr = f.read(127)
        if hdr[:7] != _MAGIC or hdr[7] != 3:
            raise ValueError("pmtiles: not a PMTiles v3 archive")
        root_off, root_len = struct.unpack_from("<QQ", hdr, 8)
        leaf_off, leaf_len = struct.unpack_from("<QQ", hdr, 40)
        data_off, _data_len = struct.unpack_from("<QQ", hdr, 56)
        internal_comp = hdr[97]
        tile_comp = hdr[98]
        tile_type = hdr[99]
        f.seek(root_off)
        root = f.read(root_len)

        def inflate_dir(blob: bytes) -> bytes:
            if internal_comp == 2:
                return gzip.decompress(blob)
            if internal_comp != 1:
                raise ValueError(
                    f"pmtiles: internal compression {internal_comp}")
            return blob

        entries = _parse_dir(inflate_dir(root))
        # run_length=0 root entries point into the leaf section
        if any(rl == 0 for _t, _o, _l, rl in entries):
            expanded = []
            for tid, off, ln, rl in entries:
                if rl == 0:
                    f.seek(leaf_off + off)
                    expanded.extend(_parse_dir(inflate_dir(f.read(ln))))
                else:
                    expanded.append((tid, off, ln, rl))
            entries = expanded
    fmt = _TILE_TYPE_NAMES.get(tile_type, "unknown")
    recs = []
    for tid, off, ln, rl in entries:
        for k in range(max(1, rl)):  # run-length: consecutive ids
            z, x, y = tileid_to_zxy(tid + k)
            recs.append((z, x, y, data_off + off, ln))
    rdf = spark.createDataFrame(
        recs, "tile_z int, tile_x int, tile_y int, off long, ln long"
    )
    schema = T.StructType(
        [
            T.StructField("tile_z", T.IntegerType()),
            T.StructField("tile_x", T.IntegerType()),
            T.StructField("tile_y", T.IntegerType()),
            T.StructField("fmt", T.StringType()),
            T.StructField("payload", T.BinaryType()),
        ]
    )

    def fetch(batches):
        for pdf in batches:
            rows = []
            with open(path, "rb") as f:
                for z, x, y, off, ln in zip(
                    pdf["tile_z"], pdf["tile_x"], pdf["tile_y"],
                    pdf["off"], pdf["ln"],
                ):
                    f.seek(int(off))
                    payload = f.read(int(ln))
                    if tile_comp == 2:
                        payload = gzip.decompress(payload)
                    rows.append(
                        {
                            "tile_z": int(z), "tile_x": int(x),
                            "tile_y": int(y), "fmt": fmt,
                            "payload": payload,
                        }
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in schema.fields])

    return rdf.mapInPandas(fetch, schema)
