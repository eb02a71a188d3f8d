"""SOZip (Seek-Optimized ZIP) source/sink — the reference's own
invention (port/cpl_vsil_gzip.cpp SOZip writer, sozip.org published
specification; apps/sozip.cpp utility): a plain ZIP whose Deflate
member is flushed (Z_FULL_FLUSH) at fixed uncompressed chunk
boundaries, plus a hidden STORED index member
`.<name>.sozip.idx` recording the compressed offset of every chunk —
so ONE large compressed member becomes range-readable in parallel.

This is exactly the feature that matters at 100 TB: without the
index a zipped corpus member is a single-reader stream; with it,
every Spark task inflates its own chunk independently
(decompressobj(-15) restarts cleanly at a full-flush point).

Index layout (spec v1): u32 version=1, u32 skip=0, u32 chunk_size,
u32 offset_size=8, u64 uncompressed_size, u64 compressed_size, then
(n_chunks - 1) u64 offsets of chunks 1.. relative to the member's
compressed data start.

`read_sozip_lines` adds the classic text-split contract on top: each
task drops its leading partial line (it belongs to the previous
chunk) and completes its trailing line by inflating the NEXT
chunk(s) up to the first newline — the Hadoop text-split rule, here
inside a zip member.
"""

from __future__ import annotations

import os
import struct
import zlib

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

__all__ = ["write_sozip", "sozip_index", "read_sozip_lines"]

_DEFAULT_CHUNK = 32768


def _local_header(name: bytes, method: int, crc: int, csize: int,
                  usize: int) -> bytes:
    return struct.pack(
        "<IHHHHHIIIHH", 0x04034B50, 20, 0, method, 0, 0x21,
        crc, csize, usize, len(name), 0,
    ) + name


def _central_header(name: bytes, method: int, crc: int, csize: int,
                    usize: int, offset: int) -> bytes:
    return struct.pack(
        "<IHHHHHHIIIHHHHHII", 0x02014B50, 20, 20, 0, method, 0, 0x21,
        crc, csize, usize, len(name), 0, 0, 0, 0, 0, offset,
    ) + name


def write_sozip(path: str, member: str, data,
                chunk_size: int = _DEFAULT_CHUNK, level: int = 6) -> int:
    """Write `data` (bytes, or an ITERATOR of byte blocks — e.g. a
    streamed toLocalIterator) as a seek-optimized Deflate member +
    its hidden index.  Streaming shape: input blocks re-chunk on the
    fly, the compressed stream spools to a temp file, and only the
    8-byte-per-chunk offset list stays in memory.  Returns the chunk
    count."""
    if isinstance(data, (bytes, bytearray)):
        data = iter((bytes(data),))
    co = zlib.compressobj(level, zlib.DEFLATED, -15)
    offsets = []  # start of chunk i (i >= 1) in the compressed stream
    crc = 0
    usize = 0
    comp_len = 0
    comp_tmp = path + ".deflate.tmp"
    buf = bytearray()

    with open(comp_tmp, "wb") as cf:
        def emit_chunk(chunk: bytes) -> None:
            nonlocal crc, usize, comp_len
            crc = zlib.crc32(chunk, crc)
            usize += len(chunk)
            out = co.compress(chunk) + co.flush(zlib.Z_FULL_FLUSH)
            cf.write(out)
            comp_len += len(out)
            offsets.append(comp_len)

        for block in data:
            buf += block
            while len(buf) >= chunk_size:
                emit_chunk(bytes(buf[:chunk_size]))
                del buf[:chunk_size]
        if buf or usize == 0:
            emit_chunk(bytes(buf))
        tail = co.flush(zlib.Z_FINISH)
        cf.write(tail)
        comp_len += len(tail)
    offsets.pop()  # the last chunk's end is not an entry
    crc &= 0xFFFFFFFF
    n_chunks = len(offsets) + 1

    idx = struct.pack("<IIII", 1, 0, chunk_size, 8)
    idx += struct.pack("<QQ", usize, comp_len)
    for off in offsets:
        idx += struct.pack("<Q", off)
    idx_name = f".{member}.sozip.idx".encode()
    idx_crc = zlib.crc32(idx) & 0xFFFFFFFF

    mname = member.encode()
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        m_off = 0
        f.write(_local_header(mname, 8, crc, comp_len, usize))
        with open(comp_tmp, "rb") as src:
            while True:
                block = src.read(1 << 20)
                if not block:
                    break
                f.write(block)
        i_off = f.tell()
        f.write(_local_header(idx_name, 0, idx_crc, len(idx), len(idx)))
        f.write(idx)
        cd_off = f.tell()
        f.write(_central_header(mname, 8, crc, comp_len, usize, m_off))
        f.write(_central_header(idx_name, 0, idx_crc, len(idx),
                                len(idx), i_off))
        cd_len = f.tell() - cd_off
        f.write(struct.pack("<IHHHHIIH", 0x06054B50, 0, 0, 2, 2,
                            cd_len, cd_off, 0))
    os.remove(comp_tmp)
    os.replace(tmp, path)
    return n_chunks


def _find_member(path: str, name: str):
    """-> (data_start, csize, usize, method) via the central dir.
    Reads only the archive TAIL (EOCD scan window) + the central
    directory + one local header — never the payload (the archive
    may be far larger than driver memory)."""
    import os as _os

    size = _os.path.getsize(path)
    with open(path, "rb") as f:
        window = min(size, 66000)  # EOCD + max comment
        f.seek(size - window)
        tail = f.read(window)
        eocd = tail.rindex(struct.pack("<I", 0x06054B50))
        _sig, _d0, _d1, _n, total, cd_len, cd_off, _cl = struct.unpack_from(
            "<IHHHHIIH", tail, eocd)
        f.seek(cd_off)
        cd = f.read(cd_len)
        pos = 0
        for _ in range(total):
            (sig, _v, _vn, _fl, method, _t, _dt, crc, csize, usize,
             nlen, elen, clen, _dn, _ia, _ea, off) = struct.unpack_from(
                "<IHHHHHHIIIHHHHHII", cd, pos)
            if sig != 0x02014B50:
                raise ValueError("sozip: corrupt central directory")
            nm = cd[pos + 46:pos + 46 + nlen].decode()
            pos += 46 + nlen + elen + clen
            if nm == name:
                f.seek(off + 26)
                lnlen, lelen = struct.unpack("<HH", f.read(4))
                return off + 30 + lnlen + lelen, csize, usize, method
    raise KeyError(f"sozip: member {name!r} not in archive")


def sozip_index(path: str, member: str):
    """-> (chunk_size, usize, csize, [chunk start offsets…],
    member data_start). Offsets include chunk 0 at 0."""
    d_start, i_csize, _u, method = _find_member(
        path, f".{member}.sozip.idx")
    if method != 0:
        raise ValueError("sozip: index member must be STORED")
    with open(path, "rb") as f:
        f.seek(d_start)
        idx = f.read(i_csize)
    version, skip, chunk_size, osize = struct.unpack_from("<IIII", idx, 0)
    if version != 1 or osize != 8:
        raise ValueError("sozip: unsupported index version/layout")
    usize, csize = struct.unpack_from("<QQ", idx, 16 + skip)
    n_chunks = max(1, -(-usize // chunk_size))
    offsets = [0] + [
        struct.unpack_from("<Q", idx, 32 + skip + 8 * i)[0]
        for i in range(n_chunks - 1)
    ]
    data_start, m_csize, m_usize, m_method = _find_member(path, member)
    if m_method != 8 or m_csize != csize or m_usize != usize:
        raise ValueError("sozip: index disagrees with the member")
    return chunk_size, usize, csize, offsets, data_start


def read_sozip_lines(spark: SparkSession, path: str, member: str
                     ) -> DataFrame:
    """Distributed text-line scan INSIDE the zip member: one task per
    chunk, leading-partial dropped / trailing-partial completed from
    the next chunk(s)."""
    chunk_size, usize, csize, offsets, data_start = sozip_index(
        path, member)
    n = len(offsets)
    bounds = offsets + [csize]
    rows = [(i, data_start + bounds[i], data_start + bounds[i + 1])
            for i in range(n)]
    rdf = spark.createDataFrame(rows, "chunk int, c0 long, c1 long")
    schema = T.StructType([T.StructField("value", T.StringType())])

    def inflate(f, a: int, b: int) -> bytes:
        f.seek(a)
        return zlib.decompressobj(-15).decompress(f.read(b - a))

    def scan(batches):
        for pdf in batches:
            out = []
            with open(path, "rb") as f:
                for chunk, c0, c1 in zip(pdf["chunk"], pdf["c0"],
                                         pdf["c1"]):
                    chunk = int(chunk)
                    raw = inflate(f, int(c0), int(c1))
                    text = raw.decode("utf-8")
                    # ownership rule (the Hadoop text-split rule): a
                    # chunk owns the lines that START inside it.  The
                    # previous chunk's last byte tells whether our
                    # first byte is a line start.
                    at_line_start = chunk == 0
                    if chunk > 0:
                        prev = inflate(
                            f, data_start + bounds[chunk - 1],
                            data_start + bounds[chunk],
                        )
                        at_line_start = prev.endswith(b"\n")
                    if not at_line_start:
                        nl = text.find("\n")
                        text = "" if nl < 0 else text[nl + 1:]
                    # extend the trailing line into following chunks —
                    # but only when this chunk owns a line at all
                    if (at_line_start or text) and not text.endswith("\n"):
                        j = chunk + 1
                        while j < n:
                            nxt = inflate(
                                f, data_start + bounds[j],
                                data_start + bounds[j + 1],
                            ).decode("utf-8")
                            nl = nxt.find("\n")
                            if nl < 0:
                                text += nxt
                                j += 1
                                continue
                            text += nxt[:nl + 1]
                            break
                    out.extend(ln for ln in text.split("\n") if ln)
            yield pd.DataFrame({"value": out})

    return rdf.mapInPandas(scan, schema)
