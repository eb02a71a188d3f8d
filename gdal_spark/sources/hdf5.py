"""HDF5 (classic subset) N-D array source/sink for the multidim model.

Wire format re-derived from the PUBLIC HDF5 File Format Specification
(v3; the format of the reference's HDF5 driver,
/root/reference/frmts/hdf5/hdf5dataset.cpp — opened there through
libhdf5; here parsed from scratch) covering the subset the reference's
tests exercise for gridded payloads:

- superblock v0 (the h5py/libver-earliest default) and v2
  (checksummed, points straight at the root object header);
- object headers v1 ("classic") and v2 ('OHDR', Jenkins lookup3
  checksummed) with continuation blocks;
- old-style groups: symbol-table message -> group B-tree v1 (type 0)
  -> SNOD symbol nodes + local heap ('HEAP') names;
- dataset messages: dataspace v1, datatype classes 0/1/3
  (fixed-point, IEEE float, fixed string), fill value, data layout v3
  (contiguous and chunked), filter pipeline v1 (deflate id 1,
  shuffle id 2), attributes v1;
- chunk index: B-tree v1 (type 1), any depth, keys carrying
  (nbytes, filter mask, chunk offsets).

Out of scope (loud errors): fractal-heap "new style" groups, v1/v2
B-tree v2 indexes, vlen / reference datatypes (and therefore real
netCDF-4 DIMENSION_LIST attributes — see netcdf4.py for the
dimension-scale subset used instead).

Spark mapping (the Zarr/NetCDF slab pattern, sources/zarr.py): the
driver parses only metadata (superblock, object headers, B-tree —
KB-sized), builds a DataFrame of chunk descriptors, and one task per
chunk opens the shared file, reads its own byte range, inflates and
un-shuffles, trims edge padding, and emits rows.  The WRITE packs
chunks distributed (one applyInPandas group per chunk), streams
payloads through toLocalIterator into a temp data blob, then composes
metadata + B-tree with the now-known compressed sizes — never a
collect.

Checksums: v2 superblocks / v2 object headers use Jenkins lookup3
(public domain algorithm, Bob Jenkins 2006); `lookup3` below is
pinned in tests against the published self-test vectors.
"""

from __future__ import annotations

import os
import struct
import zlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from gdal_spark.operators.multidim import MDArray

UNDEF = 0xFFFFFFFFFFFFFFFF
_SIG = b"\x89HDF\r\n\x1a\n"

_NP_OF = {
    "<i1": np.dtype("<i1"), "<i2": np.dtype("<i2"), "<i4": np.dtype("<i4"),
    "<i8": np.dtype("<i8"), "<u1": np.dtype("<u1"), "<u2": np.dtype("<u2"),
    "<u4": np.dtype("<u4"), "<f4": np.dtype("<f4"), "<f8": np.dtype("<f8"),
}
_SPARK_T = {
    "i1": T.IntegerType(), "i2": T.IntegerType(), "i4": T.IntegerType(),
    "i8": T.LongType(), "u1": T.IntegerType(), "u2": T.IntegerType(),
    "u4": T.LongType(), "f4": T.FloatType(), "f8": T.DoubleType(),
}


# ---------------------------------------------------------------------------
# Jenkins lookup3 (hashlittle) — HDF5's metadata checksum
# ---------------------------------------------------------------------------

def _rot(x: int, k: int) -> int:
    x &= 0xFFFFFFFF
    return ((x << k) | (x >> (32 - k))) & 0xFFFFFFFF


def lookup3(data: bytes, initval: int = 0) -> int:
    """Bob Jenkins' lookup3 hashlittle() (public domain, 2006) —
    exactly H5_checksum_lookup3.  Pinned against the published
    self-test vectors in tests/test_hdf5.py."""
    length = len(data)
    a = b = c = (0xDEADBEEF + length + initval) & 0xFFFFFFFF
    o = 0
    while length > 12:
        a = (a + int.from_bytes(data[o:o + 4], "little")) & 0xFFFFFFFF
        b = (b + int.from_bytes(data[o + 4:o + 8], "little")) & 0xFFFFFFFF
        c = (c + int.from_bytes(data[o + 8:o + 12], "little")) & 0xFFFFFFFF
        # mix
        a = (a - c) & 0xFFFFFFFF; a ^= _rot(c, 4); c = (c + b) & 0xFFFFFFFF
        b = (b - a) & 0xFFFFFFFF; b ^= _rot(a, 6); a = (a + c) & 0xFFFFFFFF
        c = (c - b) & 0xFFFFFFFF; c ^= _rot(b, 8); b = (b + a) & 0xFFFFFFFF
        a = (a - c) & 0xFFFFFFFF; a ^= _rot(c, 16); c = (c + b) & 0xFFFFFFFF
        b = (b - a) & 0xFFFFFFFF; b ^= _rot(a, 19); a = (a + c) & 0xFFFFFFFF
        c = (c - b) & 0xFFFFFFFF; c ^= _rot(b, 4); b = (b + a) & 0xFFFFFFFF
        o += 12
        length -= 12
    if length == 0:
        return c
    # the published switch adds the remaining 1..12 bytes as little-
    # endian partial words — zero-padding to 12 is arithmetically
    # identical
    tail = data[o:].ljust(12, b"\x00")
    a = (a + int.from_bytes(tail[0:4], "little")) & 0xFFFFFFFF
    b = (b + int.from_bytes(tail[4:8], "little")) & 0xFFFFFFFF
    c = (c + int.from_bytes(tail[8:12], "little")) & 0xFFFFFFFF
    # final
    c ^= b; c = (c - _rot(b, 14)) & 0xFFFFFFFF
    a ^= c; a = (a - _rot(c, 11)) & 0xFFFFFFFF
    b ^= a; b = (b - _rot(a, 25)) & 0xFFFFFFFF
    c ^= b; c = (c - _rot(b, 16)) & 0xFFFFFFFF
    a ^= c; a = (a - _rot(c, 4)) & 0xFFFFFFFF
    b ^= a; b = (b - _rot(a, 14)) & 0xFFFFFFFF
    c ^= b; c = (c - _rot(b, 24)) & 0xFFFFFFFF
    return c


# ---------------------------------------------------------------------------
# message encoders (writer)
# ---------------------------------------------------------------------------

def _pad8(b: bytes) -> bytes:
    return b + b"\x00" * ((8 - len(b) % 8) % 8)


def _dt_msg(dtype: np.dtype) -> bytes:
    """Datatype message body (classes 0 fixed / 1 float, LE)."""
    dt = np.dtype(dtype)
    if dt.kind in "iu":
        b1 = 0x08 if dt.kind == "i" else 0x00   # bit 3: signed
        return struct.pack("<BBBBIHH", 0x10, b1, 0, 0, dt.itemsize,
                           0, dt.itemsize * 8)
    if dt.kind == "f":
        if dt.itemsize == 4:
            sign, eloc, esz, mloc, msz, bias = 31, 23, 8, 0, 23, 127
        else:
            sign, eloc, esz, mloc, msz, bias = 63, 52, 11, 0, 52, 1023
        # bit field: order LE, mantissa norm 2 (bits 4-5), sign loc b2
        return struct.pack("<BBBBIHHBBBBI", 0x11, 0x20, sign, 0,
                           dt.itemsize, 0, dt.itemsize * 8,
                           eloc, esz, mloc, msz, bias)
    raise ValueError(f"hdf5: unsupported dtype {dt}")


def _dt_msg_str(n: int) -> bytes:
    """Fixed-length string datatype (class 3, null-terminated)."""
    return struct.pack("<BBBBI", 0x13, 0x00, 0, 0, n)


def _ds_msg(shape: tuple) -> bytes:
    """Dataspace v1 (simple, no maxdims)."""
    body = struct.pack("<BBBB", 1, len(shape), 0, 0) + b"\x00" * 4
    for s in shape:
        body += struct.pack("<Q", s)
    return body


def _attr_msg(name: str, value) -> bytes:
    """Attribute message v1.  str / int / int-list values."""
    nm = name.encode() + b"\x00"
    if isinstance(value, str):
        raw = value.encode() + b"\x00"
        dt = _dt_msg_str(len(raw))
        ds = _ds_msg(())
        data = raw
    elif isinstance(value, (list, tuple, np.ndarray)):
        arr = np.asarray(value, dtype="<i4")
        dt = _dt_msg(np.dtype("<i4"))
        ds = _ds_msg(arr.shape)
        data = arr.tobytes()
    else:
        dt = _dt_msg(np.dtype("<i4"))
        ds = _ds_msg(())
        data = np.int32(value).tobytes()
    return (struct.pack("<BBHHH", 1, 0, len(nm), len(dt), len(ds))
            + _pad8(nm) + _pad8(dt) + _pad8(ds) + data)


def _v1_header(msgs: list[tuple[int, bytes]]) -> bytes:
    """Object header v1: 12-byte prefix + 4 pad + 8-aligned messages."""
    body = b""
    for mtype, mbody in msgs:
        mb = _pad8(mbody)
        body += struct.pack("<HHBBBB", mtype, len(mb), 0, 0, 0, 0) + mb
    return (struct.pack("<BBHII", 1, 0, len(msgs), 1, len(body))
            + b"\x00" * 4 + body)


def _v2_header(msgs: list[tuple[int, bytes]]) -> bytes:
    """Object header v2 ('OHDR', flags=2: 2-byte chunk0 size,
    lookup3-checksummed)."""
    body = b""
    for mtype, mbody in msgs:
        body += struct.pack("<BHB", mtype, len(mbody), 0) + mbody
    hdr = b"OHDR" + struct.pack("<BBH", 2, 0x01, len(body)) + body
    return hdr + struct.pack("<I", lookup3(hdr))


def _heap(names: list[str]) -> tuple[bytes, list[int]]:
    """Local heap data segment: offset 0 = empty string, names at 8+."""
    seg = b"\x00" * 8
    offs = []
    for n in names:
        offs.append(len(seg))
        seg += _pad8(n.encode() + b"\x00")
    return seg, offs


def _chunk_btree(rank: int, entries: list[tuple[list[int], int, int]],
                 alloc) -> int:
    """Write a chunk B-tree v1 (type 1) of any depth for `entries` =
    [(chunk_offsets, nbytes, address)] in row-major chunk order.
    `alloc(b) -> addr` appends bytes to the file.  Returns root addr."""
    key_fmt = "<II" + "Q" * (rank + 1)

    def key(off, nbytes):
        return struct.pack(key_fmt, nbytes, 0, *off, 0)

    # leaf level
    per = 32
    level_nodes = []      # (first_key_off, first_nbytes, addr)
    i = 0
    nodes = [entries[i:i + per] for i in range(0, len(entries), per)]
    for node in nodes:
        blob = b"TREE" + struct.pack("<BBHQQ", 1, 0, len(node),
                                     UNDEF, UNDEF)
        for off, nb, addr in node:
            blob += key(off, nb) + struct.pack("<Q", addr)
        nxt_off, nxt_nb = ((node[-1][0], node[-1][1]))
        blob += key(nxt_off, nxt_nb)   # upper bound key (unused here)
        a = alloc(blob)
        level_nodes.append((node[0][0], node[0][1], a))
    level = 1
    while len(level_nodes) > 1:
        parents = []
        for i in range(0, len(level_nodes), per):
            grp = level_nodes[i:i + per]
            blob = b"TREE" + struct.pack("<BBHQQ", 1, level, len(grp),
                                         UNDEF, UNDEF)
            for koff, knb, addr in grp:
                blob += key(koff, knb) + struct.pack("<Q", addr)
            blob += key(grp[-1][0], grp[-1][1])
            a = alloc(blob)
            parents.append((grp[0][0], grp[0][1], a))
        level_nodes = parents
        level += 1
    return level_nodes[0][2]


# ---------------------------------------------------------------------------
# writer
# ---------------------------------------------------------------------------

def write_hdf5(
    md: MDArray,
    path: str,
    var_name: str = "data",
    dtype: str = "<i4",
    chunks: tuple | None = None,
    gzip: int = 6,
    shuffle: bool = False,
    fill_value=0,
    superblock: int = 0,
    oh_version: int = 1,
    attrs: dict | None = None,
    extra_datasets: list | None = None,
) -> None:
    """Write the MDArray as one HDF5 file.

    chunks=None -> contiguous layout; else chunked (+ deflate when
    gzip > 0, + shuffle filter when shuffle=True).  superblock 0 or 2;
    oh_version 1 or 2 for the DATASET headers (root group stays the
    old symbol-table style either way, which both superblocks allow).
    extra_datasets: [(name, np.ndarray, attrs_dict)] small driver-side
    arrays written contiguous (used for netCDF-4 dimension scales)."""
    if superblock not in (0, 2) or oh_version not in (1, 2):
        raise ValueError("hdf5: superblock must be 0 or 2, oh 1 or 2")
    np_dtype = _NP_OF[dtype]
    dims = md.dims
    names = [n for n, _ in dims]
    shape = tuple(int(s) for _, s in dims)
    rank = len(shape)
    value_col = md.value_col

    if chunks is not None and len(chunks) != rank:
        raise ValueError("hdf5: chunks rank mismatch")

    # ---- distributed chunk packing (zarr-writer pattern) ----------
    tmp = path + f".tmp{os.getpid()}"
    payloads: list[tuple[list[int], int, int]] = []  # (offsets, nbytes, pos)
    data_blob_len = 0
    if chunks is not None:
        grid = [int(np.ceil(s / c)) for s, c in zip(shape, chunks)]
        cshape = tuple(int(c) for c in chunks)
        csize = int(np.prod(cshape))
        fv = fill_value
        key_cols = [
            (F.col(n) / int(c)).cast("long").alias(f"_ck{i}")
            for i, (n, c) in enumerate(zip(names, chunks))
        ]
        strides = []
        acc = 1
        for c in reversed(cshape):
            strides.append(acc)
            acc *= c
        strides = list(reversed(strides))
        lvl = gzip
        do_shuf = shuffle
        isz = np_dtype.itemsize

        def pack(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
            buf = np.full(csize, fv, dtype=np_dtype)
            lin = np.zeros(len(pdf), dtype=np.int64)
            for i, (n, st) in enumerate(zip(names, strides)):
                lin += (pdf[n].to_numpy(np.int64)
                        - int(key[i]) * cshape[i]) * st
            buf[lin] = pdf[value_col].to_numpy()
            raw = buf.tobytes()
            if do_shuf:
                raw = (np.frombuffer(raw, np.uint8)
                       .reshape(csize, isz).T.tobytes())
            if lvl > 0:
                raw = zlib.compress(raw, lvl)
            lidx = 0
            for i, g in enumerate(grid):
                lidx = lidx * g + int(key[i])
            return pd.DataFrame(
                [{"lidx": lidx,
                  "coff": [int(key[i]) * cshape[i] for i in range(rank)],
                  "payload": raw}])

        packed = (
            md.df.select(*names, value_col)
            .groupBy(*key_cols)
            .applyInPandas(
                pack, "lidx long, coff array<long>, payload binary")
            .orderBy("lidx")
        )
        n_chunks = int(np.prod(grid))
        fill_raw = np.full(csize, fill_value, dtype=np_dtype).tobytes()
        if shuffle:
            fill_raw = (np.frombuffer(fill_raw, np.uint8)
                        .reshape(csize, np_dtype.itemsize).T.tobytes())
        if gzip > 0:
            fill_raw = zlib.compress(fill_raw, gzip)

        def coff_of(lidx: int) -> list[int]:
            out = []
            for g, c in zip(reversed(grid), reversed(cshape)):
                out.append((lidx % g) * c)
                lidx //= g
            return list(reversed(out))

        with open(tmp, "wb") as fh:
            cur = 0
            for row in packed.toLocalIterator():
                lidx = int(row["lidx"])
                while cur < lidx:      # wholly-missing chunks = fill
                    payloads.append((coff_of(cur), len(fill_raw),
                                     fh.tell()))
                    fh.write(fill_raw)
                    cur += 1
                pl = bytes(row["payload"])
                payloads.append((list(row["coff"]), len(pl), fh.tell()))
                fh.write(pl)
                cur += 1
            while cur < n_chunks:
                payloads.append((coff_of(cur), len(fill_raw), fh.tell()))
                fh.write(fill_raw)
                cur += 1
            data_blob_len = fh.tell()
    else:
        # contiguous: stream row-major outer slabs (netcdf pattern)
        inner_shape = shape[1:]
        inner = int(np.prod(inner_shape)) if inner_shape else 1
        strides = []
        acc = 1
        for s in reversed(inner_shape):
            strides.append(acc)
            acc *= s
        strides = list(reversed(strides))
        fv = fill_value

        def pack_c(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
            buf = np.full(inner, fv, dtype=np_dtype)
            lin = np.zeros(len(pdf), dtype=np.int64)
            for n, st in zip(names[1:], strides):
                lin += pdf[n].to_numpy(np.int64) * st
            buf[lin] = pdf[value_col].to_numpy()
            return pd.DataFrame(
                [{"rec": int(key[0]), "payload": buf.tobytes()}])

        packed = (
            md.df.select(*names, value_col)
            .groupBy(names[0])
            .applyInPandas(pack_c, "rec long, payload binary")
            .orderBy("rec")
        )
        fill_blob = np.full(inner, fill_value, dtype=np_dtype).tobytes()
        with open(tmp, "wb") as fh:
            cur = 0
            for row in packed.toLocalIterator():
                rec = int(row["rec"])
                while cur < rec:
                    fh.write(fill_blob)
                    cur += 1
                fh.write(bytes(row["payload"]))
                cur += 1
            while cur < (shape[0] if shape else 1):
                fh.write(fill_blob)
                cur += 1
            data_blob_len = fh.tell()

    # ---- metadata composition (driver-side, KB-sized) -------------
    out = bytearray()

    def alloc(b: bytes) -> int:
        a = len(out)
        out.extend(b)
        return a

    # reserve the superblock (patched at the end)
    alloc(b"\x00" * (96 if superblock == 0 else 48))

    # dataset object headers come AFTER we know the data start; but
    # their size depends only on message content -> compose bodies
    # first with placeholder addresses, patch later.
    ds_specs = [(var_name, None)]
    for ex in (extra_datasets or []):
        ds_specs.append((ex[0], ex))

    # local heap + SNOD + group btree need names sorted
    names_sorted = sorted(n for n, _ in ds_specs)
    heap_seg, name_offs = _heap(names_sorted)
    name_off_of = dict(zip(names_sorted, name_offs))

    # 1) data region address comes after all metadata; compute sizes
    #    by dry-running the dataset headers with dummy addresses.
    def ds_header(name, ex, data_addr, btree_addr) -> bytes:
        msgs = []
        if ex is None:
            msgs.append((0x0001, _ds_msg(shape)))
            msgs.append((0x0003, _dt_msg(np_dtype)))
            msgs.append((0x0005, struct.pack("<BBBB", 2, 2, 0, 0)))
            if chunks is not None:
                if gzip > 0 or shuffle:
                    filt = b""
                    nf = 0
                    if shuffle:
                        filt += struct.pack("<HHHH", 2, 0, 0, 1)
                        filt += struct.pack("<I", np_dtype.itemsize)
                        filt += b"\x00" * 4
                        nf += 1
                    if gzip > 0:
                        filt += struct.pack("<HHHH", 1, 0, 0, 1)
                        filt += struct.pack("<I", gzip) + b"\x00" * 4
                        nf += 1
                    msgs.append((0x000B,
                                 struct.pack("<BB", 1, nf)
                                 + b"\x00" * 6 + filt))
                lay = struct.pack("<BBB", 3, 2, rank + 1)
                lay += struct.pack("<Q", btree_addr)
                for c in chunks:
                    lay += struct.pack("<I", int(c))
                lay += struct.pack("<I", np_dtype.itemsize)
                msgs.append((0x0008, lay))
            else:
                nbytes = int(np.prod(shape)) * np_dtype.itemsize
                msgs.append((0x0008, struct.pack("<BBQQ", 3, 1,
                                                 data_addr, nbytes)))
        else:
            _nm, arr, ex_attrs = ex
            arr = np.asarray(arr)
            msgs.append((0x0001, _ds_msg(arr.shape)))
            msgs.append((0x0003, _dt_msg(arr.dtype)))
            msgs.append((0x0005, struct.pack("<BBBB", 2, 2, 0, 0)))
            msgs.append((0x0008, struct.pack("<BBQQ", 3, 1, data_addr,
                                             arr.nbytes)))
            for k, v in (ex_attrs or {}).items():
                msgs.append((0x000C, _attr_msg(k, v)))
        if ex is None:
            for k, v in (attrs or {}).items():
                msgs.append((0x000C, _attr_msg(k, v)))
        return (_v1_header(msgs) if oh_version == 1 else _v2_header(msgs))

    # dry run to fix header sizes (addresses don't change sizes:
    # always packed <Q)
    dummy = {n: len(ds_header(n, ex, 0, 0)) for n, ex in ds_specs}

    oh_addr = {}
    for n, ex in ds_specs:
        oh_addr[n] = len(out)
        alloc(b"\x00" * dummy[n])

    # SNOD with sorted entries
    snod = b"SNOD" + struct.pack("<BBH", 1, 0, len(ds_specs))
    for n in names_sorted:
        snod += struct.pack("<QQII", name_off_of[n], oh_addr[n], 0, 0)
        snod += b"\x00" * 16
    snod_addr = alloc(_pad8(snod))

    # group B-tree v1 (type 0): one SNOD child
    gbt = b"TREE" + struct.pack("<BBHQQ", 0, 0, 1, UNDEF, UNDEF)
    gbt += struct.pack("<Q", 0)                 # key 0: before-first
    gbt += struct.pack("<Q", snod_addr)
    gbt += struct.pack("<Q", name_off_of[names_sorted[-1]])
    gbt_addr = alloc(gbt)

    # local heap
    heap_hdr_addr = len(out)
    heap_data_addr = heap_hdr_addr + 32
    alloc(b"HEAP" + struct.pack("<BBBBQQQ", 0, 0, 0, 0, len(heap_seg),
                                UNDEF, heap_data_addr))
    alloc(heap_seg)

    # root group object header (v1, symbol table message)
    root_oh = _v1_header(
        [(0x0011, struct.pack("<QQ", gbt_addr, heap_hdr_addr))])
    root_addr = alloc(root_oh)

    # chunk B-tree (needs final data base address)
    meta_end_guess = len(out)
    if chunks is not None:
        # btree nodes appended now; chunk addresses = data_base + pos
        # where data_base = len(out) + btree size.  Btree size is
        # data-independent: compute by writing with addr 0 into a
        # scratch, then rewrite with real addresses.
        scratch = bytearray()

        def salloc(b: bytes) -> int:
            a = len(scratch)
            scratch.extend(b)
            return a

        _chunk_btree(rank, [(o, nb, 0) for o, nb, _p in payloads], salloc)
        data_base = meta_end_guess + len(scratch)
        real = [(o, nb, data_base + pos) for o, nb, pos in payloads]
        scratch2 = bytearray()

        def salloc2(b: bytes) -> int:
            # absolute file addresses: node children must point at
            # final positions, not scratch offsets
            a = meta_end_guess + len(scratch2)
            scratch2.extend(b)
            return a

        btree_root = _chunk_btree(rank, real, salloc2)
        assert len(scratch2) == len(scratch)
        alloc(bytes(scratch2))
    else:
        btree_root = UNDEF
        data_base = meta_end_guess

    # patch dataset headers with real addresses
    extra_cursor = data_base + data_blob_len
    extra_blobs = []
    for n, ex in ds_specs:
        if ex is None:
            hdr = ds_header(n, None, data_base, btree_root)
        else:
            arr = np.asarray(ex[1])
            hdr = ds_header(n, ex, extra_cursor, 0)
            extra_blobs.append(arr.tobytes())
            extra_cursor += arr.nbytes
        assert len(hdr) == dummy[n]
        out[oh_addr[n]:oh_addr[n] + len(hdr)] = hdr

    eof = data_base + data_blob_len + sum(len(b) for b in extra_blobs)

    # superblock (patched in place)
    if superblock == 0:
        sb = _SIG + struct.pack("<BBBBBBBBHHI", 0, 0, 0, 0, 0, 8, 8, 0,
                                4, 16, 0)
        sb += struct.pack("<QQQQ", 0, UNDEF, eof, UNDEF)
        sb += struct.pack("<QQII", 0, root_addr, 0, 0) + b"\x00" * 16
    else:
        sb = _SIG + struct.pack("<BBBB", 2, 8, 8, 0)
        sb += struct.pack("<QQQQ", 0, UNDEF, eof, root_addr)
        sb += struct.pack("<I", lookup3(sb))
    out[0:len(sb)] = sb

    final = path + f".fin{os.getpid()}"
    with open(final, "wb") as fh:
        fh.write(bytes(out))
        with open(tmp, "rb") as dat:
            while True:
                blk = dat.read(1 << 20)
                if not blk:
                    break
                fh.write(blk)
        for b in extra_blobs:
            fh.write(b)
    os.remove(tmp)
    os.replace(final, path)


# ---------------------------------------------------------------------------
# reader
# ---------------------------------------------------------------------------

class _F:
    def __init__(self, fh):
        self.fh = fh

    def read(self, addr: int, n: int) -> bytes:
        self.fh.seek(addr)
        return self.fh.read(n)


def _parse_superblock(f: _F) -> dict:
    head = f.read(0, 64)
    if head[:8] != _SIG:
        raise ValueError("hdf5: bad signature")
    ver = head[8]
    if ver == 0:
        (szoff, szlen) = head[13], head[14]
        if (szoff, szlen) != (8, 8):
            raise ValueError("hdf5: only 8-byte offsets/lengths")
        base, _fs, eof, _drv = struct.unpack_from("<QQQQ", head, 24)
        # root symbol table entry at 24+32
        ste = f.read(24 + 32, 40)
        root = struct.unpack_from("<Q", ste, 8)[0]
        return dict(version=0, base=base, eof=eof, root=root)
    if ver == 2 or ver == 3:
        szoff, szlen = head[9], head[10]
        if (szoff, szlen) != (8, 8):
            raise ValueError("hdf5: only 8-byte offsets/lengths")
        base, _ext, eof, root = struct.unpack_from("<QQQQ", head, 12)
        blob = f.read(0, 44)
        (want,) = struct.unpack_from("<I", f.read(44, 4), 0)
        if lookup3(blob) != want:
            raise ValueError("hdf5: superblock v2 checksum mismatch")
        return dict(version=ver, base=base, eof=eof, root=root)
    raise ValueError(f"hdf5: unsupported superblock v{ver}")


def _parse_oh(f: _F, addr: int) -> list[tuple[int, bytes]]:
    """Object header v1 or v2 -> [(msg type, body)] (continuations
    followed)."""
    sig = f.read(addr, 4)
    msgs: list[tuple[int, bytes]] = []
    if sig == b"OHDR":
        head = f.read(addr, 12)
        ver, flags = head[4], head[5]
        o = addr + 6
        if flags & 0x20:
            o += 16      # access/mod/change/birth times, 4 bytes each
        if flags & 0x10:
            o += 4       # max compact/dense attrs
        szbytes = 1 << (flags & 0x3)
        raw = f.read(o, szbytes)
        chunk0 = int.from_bytes(raw, "little")
        o += szbytes
        blocks = [(o, chunk0)]
        tracked = bool(flags & 0x04)
        while blocks:
            bo, blen = blocks.pop(0)
            body = f.read(bo, blen)
            p = 0
            while p + 4 <= blen:
                mtype = body[p]
                msize = struct.unpack_from("<H", body, p + 1)[0]
                p += 4
                if tracked:
                    p += 2
                mb = body[p:p + msize]
                p += msize
                if mtype == 0x10:
                    caddr, clen = struct.unpack_from("<QQ", mb, 0)
                    # continuation block: 'OCHK' + msgs + checksum
                    blocks.append((caddr + 4, clen - 8))
                else:
                    msgs.append((mtype, mb))
        return msgs
    # v1
    head = f.read(addr, 16)
    ver = head[0]
    if ver != 1:
        raise ValueError(f"hdf5: object header v{ver} unsupported")
    nmsgs = struct.unpack_from("<H", head, 2)[0]
    hsize = struct.unpack_from("<I", head, 8)[0]
    blocks = [(addr + 16, hsize)]
    got = 0
    while blocks and got < nmsgs:
        bo, blen = blocks.pop(0)
        body = f.read(bo, blen)
        p = 0
        while p + 8 <= blen and got < nmsgs:
            mtype, msize = struct.unpack_from("<HH", body, p)
            mb = body[p + 8:p + 8 + msize]
            p += 8 + msize
            got += 1
            if mtype == 0x10:
                caddr, clen = struct.unpack_from("<QQ", mb, 0)
                blocks.append((caddr, clen))
            elif mtype != 0x0000:
                msgs.append((mtype, mb))
    return msgs


def _walk_group(f: _F, msgs) -> dict[str, int]:
    """Old-style group -> {name: object header address}."""
    stab = next((m for t, m in msgs if t == 0x0011), None)
    if stab is None:
        # v2 compact links: Link messages (0x0006)
        out = {}
        for t, m in msgs:
            if t != 0x0006:
                continue
            ver, flags = m[0], m[1]
            p = 2
            if flags & 0x08:
                p += 1    # link type (0 = hard assumed)
            if flags & 0x04:
                p += 8
            if flags & 0x10:
                p += 1
            lsz = 1 << (flags & 0x3)
            nlen = int.from_bytes(m[p:p + lsz], "little")
            p += lsz
            nm = m[p:p + nlen].decode()
            p += nlen
            out[nm] = struct.unpack_from("<Q", m, p)[0]
        if out:
            return out
        raise ValueError("hdf5: group without symbol table or links "
                         "(fractal-heap groups unsupported)")
    bt_addr, heap_addr = struct.unpack_from("<QQ", stab, 0)
    hh = f.read(heap_addr, 32)
    if hh[:4] != b"HEAP":
        raise ValueError("hdf5: bad local heap")
    seg_addr = struct.unpack_from("<Q", hh, 24)[0]
    seg_len = struct.unpack_from("<Q", hh, 8)[0]
    seg = f.read(seg_addr, seg_len)

    out = {}

    def walk(addr: int):
        head = f.read(addr, 24)
        if head[:4] == b"TREE":
            typ, level, n = head[4], head[5], struct.unpack_from(
                "<H", head, 6)[0]
            body = f.read(addr + 24, (2 * n + 1) * 8)
            for i in range(n):
                child = struct.unpack_from("<Q", body, (2 * i + 1) * 8)[0]
                walk(child)
        elif head[:4] == b"SNOD":
            n = struct.unpack_from("<H", head, 6)[0]
            body = f.read(addr + 8, n * 40)
            for i in range(n):
                noff, oaddr = struct.unpack_from("<QQ", body, i * 40)
                end = seg.index(b"\x00", noff)
                out[seg[noff:end].decode()] = oaddr
        else:
            raise ValueError("hdf5: bad group node signature")

    walk(bt_addr)
    return out


def _parse_dtype(m: bytes) -> np.dtype:
    cls = m[0] & 0x0F
    ver = m[0] >> 4
    size = struct.unpack_from("<I", m, 4)[0]
    if cls == 0:
        signed = bool(m[1] & 0x08)
        be = bool(m[1] & 0x01)
        ch = ("i" if signed else "u") + str(size)
        return np.dtype((">" if be else "<") + ch)
    if cls == 1:
        be = bool(m[1] & 0x01)
        return np.dtype((">" if be else "<") + f"f{size}")
    if cls == 3:
        return np.dtype(f"S{size}")
    raise ValueError(f"hdf5: datatype class {cls} unsupported "
                     "(vlen/reference/compound out of scope)")


def _parse_attr(m: bytes) -> tuple[str, object]:
    ver = m[0]
    if ver != 1:
        raise ValueError(f"hdf5: attribute v{ver} unsupported")
    nsz, dtsz, dssz = struct.unpack_from("<HHH", m, 2)
    p = 8

    def pad(x):
        return x + ((8 - x % 8) % 8)

    nm = m[p:p + nsz].split(b"\x00")[0].decode()
    p += pad(nsz)
    dt = _parse_dtype(m[p:p + dtsz])
    dtm = m[p:p + dtsz]
    p += pad(dtsz)
    ds = m[p:p + dssz]
    rank = ds[1]
    dims = [struct.unpack_from("<Q", ds, 8 + 8 * i)[0]
            for i in range(rank)]
    p += pad(dssz)
    n = int(np.prod(dims)) if dims else 1
    raw = m[p:p + n * dt.itemsize]
    if dt.kind == "S":
        return nm, raw.split(b"\x00")[0].decode()
    vals = np.frombuffer(raw, dtype=dt, count=n)
    if not dims:
        return nm, vals[0].item()
    return nm, vals.tolist()


def _collect_chunks(f: _F, addr: int, rank: int) -> list:
    """Walk a chunk B-tree v1 -> [(offsets, nbytes, mask, address)]."""
    out = []
    head = f.read(addr, 24)
    if head[:4] != b"TREE":
        raise ValueError("hdf5: bad chunk btree signature")
    typ, level = head[4], head[5]
    if typ != 1:
        raise ValueError("hdf5: expected chunk (type 1) btree")
    n = struct.unpack_from("<H", head, 6)[0]
    ksz = 8 + 8 * (rank + 1)
    body = f.read(addr + 24, (n + 1) * ksz + n * 8)
    p = 0
    for i in range(n):
        nbytes, mask = struct.unpack_from("<II", body, p)
        offs = [struct.unpack_from("<Q", body, p + 8 + 8 * j)[0]
                for j in range(rank)]
        p += ksz
        child = struct.unpack_from("<Q", body, p)[0]
        p += 8
        if level == 0:
            out.append((offs, nbytes, mask, child))
        else:
            out.extend(_collect_chunks(f, child, rank))
    return out


def describe_hdf5(path: str) -> dict:
    """Driver-side metadata parse -> {datasets: {name: spec}}."""
    with open(path, "rb") as fh:
        f = _F(fh)
        sb = _parse_superblock(f)
        root_msgs = _parse_oh(f, sb["root"])
        children = _walk_group(f, root_msgs)
        dsets = {}
        for name, oaddr in children.items():
            msgs = _parse_oh(f, oaddr)
            spec = dict(attrs={}, filters=[])
            for t, m in msgs:
                if t == 0x0001:
                    rank = m[1]
                    spec["shape"] = tuple(
                        struct.unpack_from("<Q", m, 8 + 8 * i)[0]
                        for i in range(rank))
                elif t == 0x0003:
                    spec["dtype"] = _parse_dtype(m)
                elif t == 0x0008:
                    ver, cls = m[0], m[1]
                    if ver != 3:
                        raise ValueError("hdf5: layout v%d unsupported"
                                         % ver)
                    if cls == 1:
                        a, nb = struct.unpack_from("<QQ", m, 2)
                        spec["layout"] = ("contiguous", a, nb)
                    elif cls == 2:
                        nd = m[2]
                        bt = struct.unpack_from("<Q", m, 3)[0]
                        cdims = [struct.unpack_from("<I", m, 11 + 4 * i)[0]
                                 for i in range(nd - 1)]
                        spec["layout"] = ("chunked", bt, tuple(cdims))
                    else:
                        raise ValueError("hdf5: compact layout "
                                         "unsupported")
                elif t == 0x000B:
                    nf = m[1]
                    p = 8
                    for _ in range(nf):
                        fid, nlen, _fl, nval = struct.unpack_from(
                            "<HHHH", m, p)
                        p += 8
                        if nlen:
                            p += nlen + ((8 - nlen % 8) % 8)
                        vals = [struct.unpack_from("<I", m, p + 4 * i)[0]
                                for i in range(nval)]
                        p += 4 * nval + (4 if nval % 2 else 0)
                        spec["filters"].append((fid, vals))
                elif t == 0x000C:
                    k, v = _parse_attr(m)
                    spec["attrs"][k] = v
            dsets[name] = spec
        return dict(superblock=sb["version"], datasets=dsets)


def read_hdf5(
    spark: SparkSession,
    path: str,
    var_name: str | None = None,
    dim_names: list[str] | None = None,
) -> MDArray:
    """-> MDArray over a distributed chunk/slab scan.  The driver
    parses metadata only; each task reads + inflates its own chunks."""
    info = describe_hdf5(path)
    dsets = info["datasets"]
    if var_name is None:
        # largest dataset = the payload variable
        var_name = max(dsets, key=lambda n: int(np.prod(
            dsets[n].get("shape", (0,)))))
    spec = dsets[var_name]
    shape = spec["shape"]
    rank = len(shape)
    dt = spec["dtype"]
    if dim_names is None:
        dim_names = [f"dim{i}" for i in range(rank)]
    names = list(dim_names)
    kind = dt.kind + str(dt.itemsize)
    schema = T.StructType(
        [T.StructField(n, T.LongType()) for n in names]
        + [T.StructField("value", _SPARK_T[kind])]
    )
    filters = spec["filters"]
    unsup = [fid for fid, _v in filters if fid not in (1, 2)]
    if unsup:
        raise ValueError(f"hdf5: unsupported filter ids {unsup}")

    if spec["layout"][0] == "contiguous":
        _, base, _nb = spec["layout"]
        # slab per outer index (netcdf pattern)
        inner_shape = shape[1:]
        inner = int(np.prod(inner_shape)) if inner_shape else 1
        outer = shape[0] if shape else 1
        item = dt.itemsize
        rows = [(k, base + k * inner * item) for k in range(outer)]
        sdf = spark.createDataFrame(rows, "k long, addr long").repartition(
            min(64, max(1, len(rows))))

        def scan_c(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            with open(path, "rb") as fh2:
                for pdf in batches:
                    for k, a in zip(pdf["k"], pdf["addr"]):
                        fh2.seek(int(a))
                        arr = np.frombuffer(fh2.read(inner * item),
                                            dtype=dt)
                        grids = np.meshgrid(
                            *[np.arange(s) for s in inner_shape],
                            indexing="ij") if inner_shape else []
                        rec = {names[0]: np.full(inner, int(k),
                                                 dtype=np.int64)}
                        for n, g in zip(names[1:], grids):
                            rec[n] = g.ravel()
                        rec["value"] = arr.astype(dt.newbyteorder("="))
                        yield pd.DataFrame(rec)

        df = sdf.mapInPandas(scan_c, schema)
        return MDArray(df=df, dims=tuple(zip(names, shape)),
                       value_col="value")

    _, bt_addr, cshape = spec["layout"]
    with open(path, "rb") as fh:
        chunks = _collect_chunks(_F(fh), bt_addr, rank)
    csize = int(np.prod(cshape))
    item = dt.itemsize
    has_shuffle = any(fid == 2 for fid, _v in filters)
    has_deflate = any(fid == 1 for fid, _v in filters)
    rows = [
        (list(offs), int(nb), int(addr)) for offs, nb, _m, addr in chunks
    ]
    sdf = spark.createDataFrame(
        rows, "coff array<long>, nbytes long, addr long"
    ).repartition(min(256, max(1, len(rows))))
    full_shape = tuple(shape)

    def scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        with open(path, "rb") as fh2:
            for pdf in batches:
                for coff, nb, addr in zip(pdf["coff"], pdf["nbytes"],
                                          pdf["addr"]):
                    fh2.seek(int(addr))
                    raw = fh2.read(int(nb))
                    if has_deflate:
                        raw = zlib.decompress(raw)
                    if has_shuffle:
                        raw = (np.frombuffer(raw, np.uint8)
                               .reshape(item, csize).T.tobytes())
                    arr = np.frombuffer(raw, dtype=dt).reshape(cshape)
                    # trim edge padding
                    sl = tuple(
                        slice(0, min(c, s - int(o)))
                        for c, s, o in zip(cshape, full_shape, coff))
                    sub = arr[sl]
                    grids = np.meshgrid(
                        *[int(o) + np.arange(sub.shape[i])
                          for i, o in enumerate(coff)], indexing="ij")
                    rec = {n: g.ravel() for n, g in zip(names, grids)}
                    rec["value"] = sub.ravel().astype(
                        dt.newbyteorder("="))
                    yield pd.DataFrame(rec)

    df = sdf.mapInPandas(scan, schema)
    return MDArray(df=df, dims=tuple(zip(names, shape)),
                   value_col="value")
