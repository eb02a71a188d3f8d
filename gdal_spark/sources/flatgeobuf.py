"""FlatGeobuf source/sink — the reference's most-used binary vector
format beyond GeoPackage, re-derived from struct level:

- file layout (ogr/ogrsf_frmts/flatgeobuf/ogr_flatgeobuf.h:38): the
  8 magic bytes 66 67 62 03 66 67 62 01, a size-prefixed flatbuffers
  Header, the packed Hilbert R-tree index, then size-prefixed
  flatbuffers Feature records;
- flatbuffers wire format implemented directly (vtable-based tables,
  uoffset vectors/strings, little-endian) — the schema subset the
  engine needs: Header (name, envelope, geometry_type, columns,
  features_count, index_node_size; header_generated.h:521-533),
  Column (name, type; :162-163), Feature (geometry, properties;
  feature_generated.h:221-222), Geometry (ends, xy, type, parts;
  :32-39);
- packed Hilbert R-tree (packedrtree.h:78-121): 40-byte NodeItems
  (4 doubles + uint64 offset), level bounds bottom-up with
  node-size fan-in, nodes stored top-down, leaf offsets = feature
  byte offsets; the 16-bit Hilbert curve is the exact bit-twiddling
  of packedrtree.cpp:74-130, and features are sorted by DESCENDING
  hilbert value (hilbertSort's `ha > hb` comparator,
  packedrtree.h:101-117);
- geometry encoding per geometrywriter.cpp: flat xy vector with the
  closing vertex, `ends` = cumulative ring point counts (omitted for
  a single ring, :84-95), MultiPolygon as parts of Polygon
  geometries;
- properties per the FGB spec: (uint16 column index, value) pairs;
  Long/Double inline, String as uint32 length + utf8.

Scale shape: the HILBERT SORT RUNS IN SPARK (bbox + hilbert key as
vectorized columns, one global sort) — the driver funnel only
streams the pre-sorted iterator into the single file, holding the
leaf NodeItems (40 B/feature, the index that must be materialized to
write the file — same as the reference's writer). Reads are
distributed: tasks seek to leaf-sampled byte ranges and parse their
feature runs independently.
"""

from __future__ import annotations

import os
import struct

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from gdal_spark.geo.wkb import (
    parse_wkb,
    wkb_linestring,
    wkb_multipolygon,
    wkb_point,
    wkb_polygon,
)

__all__ = ["write_fgb", "read_fgb", "hilbert_u32"]

MAGIC = bytes([0x66, 0x67, 0x62, 0x03, 0x66, 0x67, 0x62, 0x01])
NODE_SIZE = 16
HILBERT_MAX = (1 << 16) - 1

_GEOM_TYPE = {"Point": 1, "LineString": 2, "Polygon": 3, "MultiPolygon": 6}
_COL_LONG, _COL_DOUBLE, _COL_STRING = 7, 10, 11


# ---------------------------------------------------------------------------
# minimal flatbuffers builder (back-to-front chunks, from-end offsets)
# ---------------------------------------------------------------------------

_SIZES = {"u8": 1, "u16": 2, "u32": 4, "i32": 4, "u64": 8, "off": 4}
_FMTS = {"u8": "<B", "u16": "<H", "u32": "<I", "i32": "<i", "u64": "<Q",
         "off": "<I"}


class _Builder:
    def __init__(self):
        self.chunks: list[bytes] = []
        self.size = 0  # bytes accumulated, measured from the buffer END

    def _push(self, b: bytes) -> None:
        self.chunks.append(b)
        self.size += len(b)

    def vector(self, data: bytes, elem_size: int) -> int:
        """Push a scalar vector; `data` is the packed element bytes.
        Returns the vector's from-end offset (position of the count
        word). The final buffer is padded to 8 bytes total, so
        from-end alignment == absolute alignment."""
        count = len(data) // elem_size
        align = max(4, elem_size)
        pad = (-(self.size + len(data))) % align
        if pad:
            self._push(b"\x00" * pad)
        self._push(data)
        self._push(struct.pack("<I", count))
        return self.size

    def string(self, s: str) -> int:
        data = s.encode("utf-8")
        pad = (-(self.size + 1 + len(data))) % 4
        if pad:
            self._push(b"\x00" * pad)
        self._push(b"\x00")  # NUL terminator (not counted)
        self._push(data)
        self._push(struct.pack("<I", len(data)))
        return self.size

    def offset_vector(self, offsets: list[int]) -> int:
        """Vector of uoffsets to already-built objects (from-end)."""
        n = len(offsets)
        pad = (-(self.size + 4 * n)) % 4
        if pad:
            self._push(b"\x00" * pad)
        # element i sits at from-end position: S + 4*(n - i) after all
        # elements are pushed; uoffset value = elem_pos - target_pos
        base = self.size + pad if False else self.size
        base = self.size + 4 * n  # from-end pos of element 0 after push
        vals = []
        for i, t in enumerate(offsets):
            p_end = base - 4 * i
            vals.append(struct.pack("<I", p_end - t))
        self._push(b"".join(vals))
        self._push(struct.pack("<I", n))
        return self.size

    def table(self, fields: list[tuple[int, str, int]]) -> int:
        """fields: (field_id, kind, value); kind 'off' values are
        from-end offsets of already-built objects. Returns the
        table's from-end offset."""
        pos = 4  # after the i32 vtable soffset
        slots: dict[int, int] = {}
        for fid, kind, _v in fields:
            sz = _SIZES[kind]
            pos += (-pos) % sz
            slots[fid] = pos
            pos += sz
        tsize = pos
        nslots = (max(f[0] for f in fields) + 1) if fields else 0
        vt = struct.pack("<HH", 4 + 2 * nslots, tsize) + b"".join(
            struct.pack("<H", slots.get(i, 0)) for i in range(nslots)
        )
        chunk_len = len(vt) + tsize
        need8 = any(_SIZES[k] == 8 for _f, k, _v in fields)
        align = 8 if need8 else 4
        # table start (from end) must be `align`-aligned
        pad = (-(self.size + chunk_len - len(vt))) % align
        t_end = self.size + pad + chunk_len - len(vt)  # table's from-end pos
        area = bytearray(tsize)
        struct.pack_into("<i", area, 0, len(vt))  # soffset: vtable right before
        for fid, kind, val in fields:
            s = slots[fid]
            if kind == "off":
                p_end = t_end - s
                struct.pack_into("<I", area, s, p_end - val)
            else:
                struct.pack_into(_FMTS[kind], area, s, val)
        if pad:
            self._push(b"\x00" * pad)
        self._push(bytes(area))
        self._push(vt)
        return t_end

    def finish(self, root: int) -> bytes:
        pad = (-(4 + self.size)) % 8
        # root uoffset = absolute address of the root table: the head
        # is 4+pad bytes, then chunks in reverse push order — the root
        # table sits (self.size - root) bytes into that region
        head = struct.pack("<I", 4 + pad + (self.size - root)) + b"\x00" * pad
        return head + b"".join(reversed(self.chunks))


# ---------------------------------------------------------------------------
# flatbuffers parser (vtable navigation)
# ---------------------------------------------------------------------------

def _u16(b, p):
    return struct.unpack_from("<H", b, p)[0]


def _u32(b, p):
    return struct.unpack_from("<I", b, p)[0]


def _field_pos(buf: bytes, tpos: int, fid: int) -> int | None:
    vtpos = tpos - struct.unpack_from("<i", buf, tpos)[0]
    vtsize = _u16(buf, vtpos)
    slot = 4 + 2 * fid
    if slot + 2 > vtsize:
        return None
    fo = _u16(buf, vtpos + slot)
    return tpos + fo if fo else None


def _read_scalar(buf, tpos, fid, fmt, default):
    p = _field_pos(buf, tpos, fid)
    return struct.unpack_from(fmt, buf, p)[0] if p is not None else default


def _read_offset(buf, tpos, fid):
    p = _field_pos(buf, tpos, fid)
    return p + _u32(buf, p) if p is not None else None


def _read_vector(buf, vpos):
    n = _u32(buf, vpos)
    return n, vpos + 4


def _read_string(buf, spos) -> str:
    n, dp = _read_vector(buf, spos)
    return buf[dp:dp + n].decode("utf-8")


# ---------------------------------------------------------------------------
# geometry <-> flatbuffers
# ---------------------------------------------------------------------------

def _geom_fields(fb: _Builder, g, gtype: int) -> list[tuple[int, str, int]]:
    """Build xy/ends (+parts) for one geometry; returns Geometry table
    fields. ends = cumulative ring point counts, omitted for a single
    ring (geometrywriter.cpp:84-95)."""
    if gtype == 6:  # MultiPolygon: parts of Polygon geometries
        parts = []
        for rings in g.all_rings():
            pf = _rings_fields(fb, rings)
            pf.append((6, "u8", 3))
            parts.append(fb.table(pf))
        return [(7, "off", fb.offset_vector(parts)), (6, "u8", gtype)]
    if gtype == 3:
        fields = _rings_fields(fb, g.all_rings()[0])
    else:
        pts = g.parts[0]
        xy = np.ascontiguousarray(pts, dtype="<f8").tobytes()
        fields = [(1, "off", fb.vector(xy, 8))]
    fields.append((6, "u8", gtype))
    return fields


def _rings_fields(fb: _Builder, rings) -> list[tuple[int, str, int]]:
    xy = np.concatenate(rings, axis=0)
    fields = [(1, "off", fb.vector(
        np.ascontiguousarray(xy, dtype="<f8").tobytes(), 8))]
    if len(rings) > 1:
        ends = np.cumsum([len(r) for r in rings]).astype("<u4")
        # ends vector is field 0; order in `fields` list is free
        fields.insert(0, (0, "off", fb.vector(ends.tobytes(), 4)))
    return fields


def _parse_geometry(buf: bytes, gpos: int, gtype_default: int) -> bytes:
    gtype = _read_scalar(buf, gpos, 6, "<B", 0) or gtype_default
    if gtype == 6:
        pv = _read_offset(buf, gpos, 7)
        n, dp = _read_vector(buf, pv)
        polys = []
        for i in range(n):
            ppos = dp + 4 * i
            part = ppos + _u32(buf, ppos)
            polys.append(_parse_rings(buf, part))
        return wkb_multipolygon(polys)
    if gtype == 3:
        return wkb_polygon(_parse_rings(buf, gpos))
    xyv = _read_offset(buf, gpos, 1)
    n, dp = _read_vector(buf, xyv)
    pts = np.frombuffer(buf, "<f8", n, dp).reshape(-1, 2)
    if gtype == 1:
        return wkb_point(float(pts[0, 0]), float(pts[0, 1]))
    return wkb_linestring(pts.copy())


def _parse_rings(buf: bytes, gpos: int):
    xyv = _read_offset(buf, gpos, 1)
    n, dp = _read_vector(buf, xyv)
    pts = np.frombuffer(buf, "<f8", n, dp).reshape(-1, 2)
    ev = _read_offset(buf, gpos, 0)
    if ev is None:
        return [pts.copy()]
    ne, ep = _read_vector(buf, ev)
    ends = np.frombuffer(buf, "<u4", ne, ep)
    rings = []
    start = 0
    for e in ends:
        rings.append(pts[start:e].copy())
        start = int(e)
    return rings


# ---------------------------------------------------------------------------
# Hilbert curve (packedrtree.cpp:74-130, exact)
# ---------------------------------------------------------------------------

def hilbert_u32(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Vectorized 16-bit -> 32-bit Hilbert index (uint32 in/out)."""
    x = x.astype(np.uint32)
    y = y.astype(np.uint32)
    M = np.uint32(0xFFFF)
    a = x ^ y
    b = M ^ a
    c = M ^ (x | y)
    d = x & (y ^ M)
    A = a | (b >> 1)
    B = (a >> 1) ^ a
    C = ((c >> 1) ^ (b & (d >> 1))) ^ c
    D = ((a & (c >> 1)) ^ (d >> 1)) ^ d
    a, b, c, d = A, B, C, D
    A = (a & (a >> 2)) ^ (b & (b >> 2))
    B = (a & (b >> 2)) ^ (b & ((a ^ b) >> 2))
    C = c ^ ((a & (c >> 2)) ^ (b & (d >> 2)))
    D = d ^ ((b & (c >> 2)) ^ ((a ^ b) & (d >> 2)))
    a, b, c, d = A, B, C, D
    A = (a & (a >> 4)) ^ (b & (b >> 4))
    B = (a & (b >> 4)) ^ (b & ((a ^ b) >> 4))
    C = c ^ ((a & (c >> 4)) ^ (b & (d >> 4)))
    D = d ^ ((b & (c >> 4)) ^ ((a ^ b) & (d >> 4)))
    a, b, c, d = A, B, C, D
    C = c ^ ((a & (c >> 8)) ^ (b & (d >> 8)))
    D = d ^ ((b & (c >> 8)) ^ ((a ^ b) & (d >> 8)))
    a = C ^ (C >> 1)
    b = D ^ (D >> 1)
    i0 = x ^ y
    i1 = b | (M ^ (i0 | a))
    i0 = (i0 | (i0 << 8)) & np.uint32(0x00FF00FF)
    i0 = (i0 | (i0 << 4)) & np.uint32(0x0F0F0F0F)
    i0 = (i0 | (i0 << 2)) & np.uint32(0x33333333)
    i0 = (i0 | (i0 << 1)) & np.uint32(0x55555555)
    i1 = (i1 | (i1 << 8)) & np.uint32(0x00FF00FF)
    i1 = (i1 | (i1 << 4)) & np.uint32(0x0F0F0F0F)
    i1 = (i1 | (i1 << 2)) & np.uint32(0x33333333)
    i1 = (i1 | (i1 << 1)) & np.uint32(0x55555555)
    return (i1 << 1) | i0


# ---------------------------------------------------------------------------
# packed R-tree (packedrtree.h/.cpp)
# ---------------------------------------------------------------------------

_NODE_DT = np.dtype(
    [("minx", "<f8"), ("miny", "<f8"), ("maxx", "<f8"), ("maxy", "<f8"),
     ("off", "<u8")]
)


def _level_bounds(num_items: int, node_size: int):
    level_num = []
    n = num_items
    num_nodes = n
    level_num.append(n)
    while n != 1:
        n = -(-n // node_size)
        num_nodes += n
        level_num.append(n)
    bounds = []
    acc = num_nodes
    for sz in level_num:
        acc -= sz
        bounds.append((acc, acc + sz))
    return bounds, num_nodes  # bottom-up order; [0] = leaf level


def _build_rtree(leaves: np.ndarray, node_size: int = NODE_SIZE) -> bytes:
    """leaves: structured _NODE_DT array in hilbert-sorted order with
    feature byte offsets. -> packed index bytes (nodes top-down)."""
    bounds, num_nodes = _level_bounds(len(leaves), node_size)
    nodes = np.zeros(num_nodes, dtype=_NODE_DT)
    lo, hi = bounds[0]
    nodes[lo:hi] = leaves
    for li in range(len(bounds) - 1):
        pos, end = bounds[li]
        newpos = bounds[li + 1][0]
        while pos < end:
            first = pos
            last = min(pos + node_size, end)
            chunk = nodes[first:last]
            nodes[newpos]["minx"] = chunk["minx"].min()
            nodes[newpos]["miny"] = chunk["miny"].min()
            nodes[newpos]["maxx"] = chunk["maxx"].max()
            nodes[newpos]["maxy"] = chunk["maxy"].max()
            nodes[newpos]["off"] = first * 40  # first child node offset
            newpos += 1
            pos = last
    return nodes.tobytes()


# ---------------------------------------------------------------------------
# writer
# ---------------------------------------------------------------------------

def _col_type(dt: str) -> int:
    if dt in ("bigint", "int", "smallint", "tinyint", "boolean"):
        return _COL_LONG
    if dt in ("double", "float"):
        return _COL_DOUBLE
    return _COL_STRING


def _encode_props(cols: list[tuple[str, int]], row) -> bytes:
    out = []
    for i, (name, ct) in enumerate(cols):
        v = row[name]
        if v is None:
            continue
        out.append(struct.pack("<H", i))
        if ct == _COL_LONG:
            out.append(struct.pack("<q", int(v)))
        elif ct == _COL_DOUBLE:
            out.append(struct.pack("<d", float(v)))
        else:
            s = str(v).encode("utf-8")
            out.append(struct.pack("<I", len(s)) + s)
    return b"".join(out)


def _encode_feature(wkb: bytes, props: bytes, gtype: int) -> bytes:
    fb = _Builder()
    g = parse_wkb(bytes(wkb))
    geom = fb.table(_geom_fields(fb, g, gtype))
    fields = [(0, "off", geom)]
    if props:
        fields.append((1, "off", fb.vector(props, 1)))
    root = fb.table(fields)
    buf = fb.finish(root)
    return struct.pack("<I", len(buf)) + buf


def write_fgb(
    df: DataFrame,
    path: str,
    layer_name: str = "layer",
    geom_col: str = "geometry",
    geometry_type: str = "Polygon",
) -> None:
    """Write (fid, <attrs>, geometry WKB) as a spatially-sorted,
    indexed FlatGeobuf. The Hilbert sort runs IN SPARK; the driver
    funnel streams the sorted iterator (single-file format), holding
    only the 40-byte-per-feature leaf index."""
    gtype = _GEOM_TYPE[geometry_type]
    attrs = [
        (f.name, _col_type(f.dataType.simpleString()))
        for f in df.schema.fields if f.name != geom_col
    ]

    bbox_schema = T.StructType(
        [T.StructField(c, T.DoubleType())
         for c in ("bxmin", "bymin", "bxmax", "bymax")]
    )

    @F.pandas_udf(bbox_schema)
    def bbox_of(wkb: pd.Series) -> pd.DataFrame:
        rows = [parse_wkb(bytes(b)).bounds() for b in wkb]
        return pd.DataFrame(rows, columns=["bxmin", "bymin", "bxmax", "bymax"])

    with_box = df.withColumn("_bb", bbox_of(F.col(geom_col))).select(
        "*", "_bb.*"
    ).drop("_bb")
    ext = with_box.agg(
        F.min("bxmin"), F.min("bymin"), F.max("bxmax"), F.max("bymax")
    ).first()
    exmin, eymin, exmax, eymax = (float(v) for v in ext)
    w = exmax - exmin
    h = eymax - eymin

    @F.pandas_udf(T.LongType())
    def hkey(bxmin, bymin, bxmax, bymax):
        cx = (bxmin.to_numpy() + bxmax.to_numpy()) / 2.0
        cy = (bymin.to_numpy() + bymax.to_numpy()) / 2.0
        hx = (np.floor(HILBERT_MAX * (cx - exmin) / w).astype(np.uint32)
              if w != 0.0 else np.zeros(len(cx), np.uint32))
        hy = (np.floor(HILBERT_MAX * (cy - eymin) / h).astype(np.uint32)
              if h != 0.0 else np.zeros(len(cy), np.uint32))
        return pd.Series(hilbert_u32(hx, hy).astype(np.int64))

    ordered = (
        with_box.withColumn(
            "_h", hkey("bxmin", "bymin", "bxmax", "bymax")
        )
        # hilbertSort's comparator is `ha > hb`: DESCENDING
        .orderBy(F.col("_h").desc())
    )

    feat_path = path + ".feat.tmp"
    leaves: list[tuple[float, float, float, float, int]] = []
    n_rows = 0
    with open(feat_path, "wb") as ff:
        offset = 0
        for row in ordered.toLocalIterator():
            rec = _encode_feature(
                row[geom_col], _encode_props(attrs, row), gtype
            )
            ff.write(rec)
            leaves.append(
                (row["bxmin"], row["bymin"], row["bxmax"], row["bymax"],
                 offset)
            )
            offset += len(rec)
            n_rows += 1

    fb = _Builder()
    col_offs = []
    for name, ct in attrs:
        nm = fb.string(name)
        col_offs.append(fb.table([(0, "off", nm), (1, "u8", ct)]))
    cols_vec = fb.offset_vector(col_offs)
    env = fb.vector(
        struct.pack("<4d", exmin, eymin, exmax, eymax), 8
    )
    name_off = fb.string(layer_name)
    header = fb.table(
        [
            (0, "off", name_off),
            (1, "off", env),
            (2, "u8", gtype),
            (7, "off", cols_vec),
            (8, "u64", n_rows),
            (9, "u16", NODE_SIZE),
        ]
    )
    hbuf = fb.finish(header)

    leaf_arr = np.array(leaves, dtype=_NODE_DT) if leaves else np.zeros(
        0, dtype=_NODE_DT
    )
    index = _build_rtree(leaf_arr) if n_rows else b""
    with open(path, "wb") as out:
        out.write(MAGIC)
        out.write(struct.pack("<I", len(hbuf)))
        out.write(hbuf)
        out.write(index)
        with open(feat_path, "rb") as ff:
            while True:
                chunk = ff.read(1 << 20)
                if not chunk:
                    break
                out.write(chunk)
    os.remove(feat_path)


# ---------------------------------------------------------------------------
# reader
# ---------------------------------------------------------------------------

def _read_header(path: str):
    with open(path, "rb") as f:
        if f.read(8) != MAGIC:
            raise ValueError("not a FlatGeobuf file")
        (hlen,) = struct.unpack("<I", f.read(4))
        hbuf = f.read(hlen)
    tpos = _u32(hbuf, 0)
    gtype = _read_scalar(hbuf, tpos, 2, "<B", 0)
    n_feat = _read_scalar(hbuf, tpos, 8, "<Q", 0)
    node_size = _read_scalar(hbuf, tpos, 9, "<H", NODE_SIZE)
    cols = []
    cv = _read_offset(hbuf, tpos, 7)
    if cv is not None:
        n, dp = _read_vector(hbuf, cv)
        for i in range(n):
            cpos = dp + 4 * i
            ct = cpos + _u32(hbuf, cpos)
            cols.append(
                (
                    _read_string(hbuf, _read_offset(hbuf, ct, 0)),
                    _read_scalar(hbuf, ct, 1, "<B", 0),
                )
            )
    idx_nodes = _level_bounds(n_feat, node_size)[1] if n_feat else 0
    idx_off = 12 + hlen
    feat_off = idx_off + idx_nodes * 40
    return gtype, n_feat, node_size, cols, idx_off, feat_off


def _parse_props(buf: bytes, ppos: int, cols) -> dict:
    n, dp = _read_vector(buf, ppos)
    end = dp + n
    out = {}
    p = dp
    while p < end:
        (ci,) = struct.unpack_from("<H", buf, p)
        p += 2
        name, ct = cols[ci]
        if ct == _COL_LONG:
            (out[name],) = struct.unpack_from("<q", buf, p)
            p += 8
        elif ct == _COL_DOUBLE:
            (out[name],) = struct.unpack_from("<d", buf, p)
            p += 8
        else:
            (sl,) = struct.unpack_from("<I", buf, p)
            p += 4
            out[name] = buf[p:p + sl].decode("utf-8")
            p += sl
    return out


def read_fgb(
    spark: SparkSession, path: str, n_partitions: int = 8
) -> DataFrame:
    """Distributed FlatGeobuf scan: the driver reads only the header
    plus n_partitions SAMPLED leaf offsets from the index (seek per
    boundary, never the whole index); each task then parses its run
    of size-prefixed features. -> (<attrs>, geometry WKB)."""
    gtype, n_feat, node_size, cols, idx_off, feat_off = _read_header(path)
    fields = []
    for name, ct in cols:
        if ct == _COL_LONG:
            fields.append(T.StructField(name, T.LongType()))
        elif ct == _COL_DOUBLE:
            fields.append(T.StructField(name, T.DoubleType()))
        else:
            fields.append(T.StructField(name, T.StringType()))
    schema = T.StructType(fields + [T.StructField("geometry", T.BinaryType())])
    names = [c[0] for c in cols]
    if n_feat == 0:
        return spark.createDataFrame([], schema)
    bounds, num_nodes = _level_bounds(n_feat, node_size)
    leaf_lo = bounds[0][0]
    step = max(1, -(-n_feat // n_partitions))
    ranges = []
    with open(path, "rb") as f:
        for start in range(0, n_feat, step):
            f.seek(idx_off + (leaf_lo + start) * 40 + 32)
            (off,) = struct.unpack("<Q", f.read(8))
            ranges.append((int(off), min(step, n_feat - start)))
    rdf = spark.createDataFrame(ranges, "off long, cnt long")

    def scan(batches):
        for pdf in batches:
            out = []
            with open(path, "rb") as f:
                for off, cnt in zip(pdf["off"], pdf["cnt"]):
                    f.seek(feat_off + int(off))
                    for _ in range(int(cnt)):
                        (flen,) = struct.unpack("<I", f.read(4))
                        buf = f.read(flen)
                        tpos = _u32(buf, 0)
                        rec = dict.fromkeys(names)
                        pp = _read_offset(buf, tpos, 1)
                        if pp is not None:
                            rec.update(_parse_props(buf, pp, cols))
                        gp = _read_offset(buf, tpos, 0)
                        rec["geometry"] = (
                            _parse_geometry(buf, gp, gtype)
                            if gp is not None else None
                        )
                        out.append(rec)
            yield pd.DataFrame(out, columns=names + ["geometry"])

    return rdf.mapInPandas(scan, schema)
