"""OSM PBF source/sink — the reference's OSM driver binary path
(ogr/ogrsf_frmts/osm/osm_parser.cpp; format per the published PBF
specification, wiki.openstreetmap.org/wiki/PBF_Format): length-
prefixed BlobHeader/Blob frames, zlib-compressed PrimitiveBlocks,
string tables, DenseNodes with zigzag delta coding, delta-coded way
refs and relation members.

Protobuf wire primitives are hand-rolled (varint, zigzag, packed
fields) — no protobuf dependency.

Scale shape: PBF is blob-chunked BY DESIGN — every OSMData blob
decodes independently.  The reader indexes blob extents with one
cheap driver-side header walk, then DECODES BLOBS DISTRIBUTED
(byte-range mapInPandas tasks — the sozip/netcdf slab pattern).
Downstream geometry assembly is the same node-id equi-join as the
XML model (sources/osmxml.py).

Precision note: PBF coordinates are fixed-point (granularity 100 =
1e-7 degrees).  Exact roundtrips need 1e-7-grid inputs; arbitrary
doubles quantize, exactly as in the reference.
"""

from __future__ import annotations

import os
import struct
import zlib

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

__all__ = [
    "write_osm_pbf", "read_pbf_nodes", "read_pbf_ways",
    "read_pbf_relations",
]

_GRAN = 100  # nano-degrees per unit -> 1e-7 degree grid


# --- protobuf wire primitives ----------------------------------------------

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


def _zig(v: int) -> int:
    return (v << 1) ^ (v >> 63)


def _unzig(v: int) -> int:
    return (v >> 1) ^ -(v & 1)


def _read_varint(buf: bytes, pos: int):
    shift = 0
    val = 0
    while True:
        b = buf[pos]
        pos += 1
        val |= (b & 0x7F) << shift
        if not b & 0x80:
            return val, pos
        shift += 7


def _field(fid: int, wire: int) -> bytes:
    return _varint((fid << 3) | wire)


def _ld(fid: int, payload: bytes) -> bytes:
    """Length-delimited field."""
    return _field(fid, 2) + _varint(len(payload)) + payload


def _packed(fid: int, values) -> bytes:
    body = b"".join(_varint(v) for v in values)
    return _ld(fid, body)


def _iter_fields(buf: bytes):
    pos = 0
    n = len(buf)
    while pos < n:
        key, pos = _read_varint(buf, pos)
        fid, wire = key >> 3, key & 7
        if wire == 0:
            val, pos = _read_varint(buf, pos)
        elif wire == 2:
            ln, pos = _read_varint(buf, pos)
            val = buf[pos:pos + ln]
            pos += ln
        elif wire == 5:
            val = buf[pos:pos + 4]
            pos += 4
        elif wire == 1:
            val = buf[pos:pos + 8]
            pos += 8
        else:
            raise ValueError(f"pbf: wire type {wire}")
        yield fid, wire, val


def _unpack_varints(buf: bytes):
    out = []
    pos = 0
    while pos < len(buf):
        v, pos = _read_varint(buf, pos)
        out.append(v)
    return out


# --- write ------------------------------------------------------------------

def _blob(type_name: str, payload: bytes) -> bytes:
    comp = zlib.compress(payload)
    blob = _field(2, 0) + _varint(len(payload)) + _ld(3, comp)
    hdr = _ld(1, type_name.encode()) + _field(3, 0) + _varint(len(blob))
    return struct.pack(">I", len(hdr)) + hdr + blob


def write_osm_pbf(path: str, nodes, ways=(), relations=()) -> None:
    """nodes: iterable of (id, lon, lat); ways: (id, [refs], {tags});
    relations: (id, [(type, ref, role)], {tags}) with type in
    ('node','way','relation').  One OSMHeader + one OSMData blob per
    call (callers stream multiple calls' output via file append for
    planet-scale writes; each blob is independently decodable)."""
    strings = [b""]  # index 0 must be the empty string
    sidx: dict[bytes, int] = {b"": 0}

    def s(v) -> int:
        b = str(v).encode()
        if b not in sidx:
            sidx[b] = len(strings)
            strings.append(b)
        return sidx[b]

    # DenseNodes: delta-coded ids/lats/lons
    dn = b""
    last_id = last_lat = last_lon = 0
    ids, lats, lons = [], [], []
    for nid, lon, lat in nodes:
        ilat = round(lat * 1e9) // _GRAN
        ilon = round(lon * 1e9) // _GRAN
        ids.append(_zig(nid - last_id))
        lats.append(_zig(ilat - last_lat))
        lons.append(_zig(ilon - last_lon))
        last_id, last_lat, last_lon = nid, ilat, ilon
    if ids:
        dn = _packed(1, ids) + _packed(8, lats) + _packed(9, lons)
    group = _ld(2, dn) if dn else b""
    for wid, refs, tags in ways:
        keys = [s(k) for k in tags]
        vals = [s(v) for v in tags.values()]
        deltas = []
        last = 0
        for r in refs:
            deltas.append(_zig(r - last))
            last = r
        way = _field(1, 0) + _varint(wid)
        if keys:
            way += _packed(2, keys) + _packed(3, vals)
        way += _packed(8, deltas)
        group += _ld(3, way)
    type_code = {"node": 0, "way": 1, "relation": 2}
    for rid, members, tags in relations:
        keys = [s(k) for k in tags]
        vals = [s(v) for v in tags.values()]
        roles = [s(role) for _t, _r, role in members]
        memids = []
        last = 0
        for _t, ref, _role in members:
            memids.append(_zig(ref - last))
            last = ref
        types = [type_code[t] for t, _r, _role in members]
        rel = _field(1, 0) + _varint(rid)
        if keys:
            rel += _packed(2, keys) + _packed(3, vals)
        rel += _packed(8, roles) + _packed(9, memids) + _packed(10, types)
        group += _ld(4, rel)
    st = b"".join(_ld(1, x) for x in strings)
    block = _ld(1, st) + _ld(2, group) + _field(17, 0) + _varint(_GRAN)
    header_block = _ld(4, b"OsmSchema-V0.6") + _ld(4, b"DenseNodes")
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(_blob("OSMHeader", header_block))
        f.write(_blob("OSMData", block))
    os.replace(tmp, path)


# --- read -------------------------------------------------------------------

def _index_blobs(path: str):
    """One driver-side header walk -> [(type, offset, length)] of the
    raw Blob messages (the distributed tasks re-read those ranges)."""
    out = []
    size = os.path.getsize(path)
    with open(path, "rb") as f:
        while f.tell() < size:
            (hlen,) = struct.unpack(">I", f.read(4))
            hdr = f.read(hlen)
            btype = ""
            blen = 0
            for fid, _w, val in _iter_fields(hdr):
                if fid == 1:
                    btype = val.decode()
                elif fid == 3:
                    blen = val
            off = f.tell()
            out.append((btype, off, blen))
            f.seek(off + blen)
    return out


def _decode_blob(raw: bytes) -> bytes:
    raw_bytes = None
    for fid, _w, val in _iter_fields(raw):
        if fid == 1:
            raw_bytes = val
        elif fid == 3:
            raw_bytes = zlib.decompress(val)
    if raw_bytes is None:
        raise ValueError("pbf: blob without raw/zlib payload")
    return raw_bytes


def _parse_block(block: bytes):
    """PrimitiveBlock -> (strings, groups, granularity, lat_off,
    lon_off)."""
    strings = []
    groups = []
    gran, lat_off, lon_off = 100, 0, 0
    for fid, _w, val in _iter_fields(block):
        if fid == 1:
            strings = [v for f2, _w2, v in _iter_fields(val) if f2 == 1]
        elif fid == 2:
            groups.append(val)
        elif fid == 17:
            gran = val
        elif fid == 19:
            lat_off = val
        elif fid == 20:
            lon_off = val
    return strings, groups, gran, lat_off, lon_off


def _blob_scan(spark: SparkSession, path: str, schema, emit):
    blobs = [(off, ln) for t, off, ln in _index_blobs(path)
             if t == "OSMData"]
    rdf = spark.createDataFrame(blobs, "off long, ln long")

    def scan(batches):
        for pdf in batches:
            rows = []
            with open(path, "rb") as f:
                for off, ln in zip(pdf["off"], pdf["ln"]):
                    f.seek(int(off))
                    block = _decode_blob(f.read(int(ln)))
                    strings, groups, gran, lat_o, lon_o = _parse_block(
                        block)
                    for g in groups:
                        emit(rows, g, strings, gran, lat_o, lon_o)
            yield pd.DataFrame(rows, columns=[f2.name for f2 in schema])

    return rdf.mapInPandas(scan, schema)


def read_pbf_nodes(spark: SparkSession, path: str) -> DataFrame:
    schema = T.StructType([
        T.StructField("node_id", T.LongType()),
        T.StructField("lon", T.DoubleType()),
        T.StructField("lat", T.DoubleType()),
    ])

    def emit(rows, group, strings, gran, lat_o, lon_o):
        for fid, _w, val in _iter_fields(group):
            if fid != 2:  # DenseNodes
                continue
            ids = lats = lons = []
            for f2, _w2, v in _iter_fields(val):
                if f2 == 1:
                    ids = [_unzig(x) for x in _unpack_varints(v)]
                elif f2 == 8:
                    lats = [_unzig(x) for x in _unpack_varints(v)]
                elif f2 == 9:
                    lons = [_unzig(x) for x in _unpack_varints(v)]
            cid = clat = clon = 0
            for di, dla, dlo in zip(ids, lats, lons):
                cid += di
                clat += dla
                clon += dlo
                rows.append({
                    "node_id": cid,
                    "lon": 1e-9 * (lon_o + gran * clon),
                    "lat": 1e-9 * (lat_o + gran * clat),
                })

    return _blob_scan(spark, path, schema, emit)


def read_pbf_ways(spark: SparkSession, path: str) -> DataFrame:
    schema = T.StructType([
        T.StructField("way_id", T.LongType()),
        T.StructField("refs", T.ArrayType(T.LongType())),
        T.StructField("tags", T.MapType(T.StringType(), T.StringType())),
    ])

    def emit(rows, group, strings, gran, lat_o, lon_o):
        for fid, _w, val in _iter_fields(group):
            if fid != 3:
                continue
            wid = 0
            keys = vals = []
            refs = []
            for f2, _w2, v in _iter_fields(val):
                if f2 == 1:
                    wid = v
                elif f2 == 2:
                    keys = _unpack_varints(v)
                elif f2 == 3:
                    vals = _unpack_varints(v)
                elif f2 == 8:
                    acc = 0
                    for d in _unpack_varints(v):
                        acc += _unzig(d)
                        refs.append(acc)
            rows.append({
                "way_id": wid,
                "refs": refs,
                "tags": {strings[k].decode(): strings[x].decode()
                         for k, x in zip(keys, vals)},
            })

    return _blob_scan(spark, path, schema, emit)


def read_pbf_relations(spark: SparkSession, path: str) -> DataFrame:
    schema = T.StructType([
        T.StructField("rel_id", T.LongType()),
        T.StructField("member_types", T.ArrayType(T.IntegerType())),
        T.StructField("member_refs", T.ArrayType(T.LongType())),
        T.StructField("member_roles", T.ArrayType(T.StringType())),
        T.StructField("tags", T.MapType(T.StringType(), T.StringType())),
    ])

    def emit(rows, group, strings, gran, lat_o, lon_o):
        for fid, _w, val in _iter_fields(group):
            if fid != 4:
                continue
            rid = 0
            keys = vals = roles = types = []
            refs = []
            for f2, _w2, v in _iter_fields(val):
                if f2 == 1:
                    rid = v
                elif f2 == 2:
                    keys = _unpack_varints(v)
                elif f2 == 3:
                    vals = _unpack_varints(v)
                elif f2 == 8:
                    roles = _unpack_varints(v)
                elif f2 == 9:
                    acc = 0
                    for d in _unpack_varints(v):
                        acc += _unzig(d)
                        refs.append(acc)
                elif f2 == 10:
                    types = _unpack_varints(v)
            rows.append({
                "rel_id": rid,
                "member_types": types,
                "member_refs": refs,
                "member_roles": [strings[r].decode() for r in roles],
                "tags": {strings[k].decode(): strings[x].decode()
                         for k, x in zip(keys, vals)},
            })

    return _blob_scan(spark, path, schema, emit)
