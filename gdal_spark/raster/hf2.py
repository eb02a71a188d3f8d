"""HF2/HFZ heightfield codec.

Semantics re-derived from the reference driver
(/root/reference/frmts/hf2/hf2dataset.cpp):

- header: "HF2\\0" + int16 version(0) + int32 width/height + int16
  tile size + float32 vertical precision + float32 horiz scale +
  int32 extended-header length (CreateCopy, :179-190), all LE;
- extended header blocks: "bin\\0" + 16-byte zero-padded name +
  int32 length + payload; "georef-extents" carries int16 units +
  4 float64 (west, east, south, north edges) (:197-215);
- tiles run bottom block row first, left to right; each tile is
  float32 scale + float32 offset, then per ROW (bottom-up inside
  the tile): word-size byte (1/2/4), int32 first value, then
  (width-1) signed deltas of that word size; value = n*scale+offset
  (IReadBlock, :160-230);
- HFZ is the same stream gzip-compressed (the reference reads it
  through /vsigzip/).
"""

from __future__ import annotations

import gzip
import struct

import numpy as np

__all__ = ["encode_hf2", "decode_hf2"]


def _rows_to_stream(tile: np.ndarray) -> bytes:
    """int tile (rows top-down) -> per-row delta stream (bottom-up)."""
    out = bytearray()
    th, tw = tile.shape
    for k in range(th):
        row = tile[th - 1 - k, :].astype(np.int64)
        diffs = np.diff(row)
        if diffs.size and (np.abs(diffs).max() > 32767):
            ws, dt = 4, "<i4"
        elif diffs.size and (np.abs(diffs).max() > 127):
            ws, dt = 2, "<i2"
        else:
            ws, dt = 1, "<i1"
        out.append(ws)
        out += struct.pack("<i", int(row[0]))
        out += diffs.astype(dt).tobytes()
    return bytes(out)


def encode_hf2(arr: np.ndarray, geo: tuple | None = None,
               tile_size: int = 64, gz: bool = False) -> bytes:
    """(H,W) int elevations (row 0 = north) -> HF2 (or HFZ) bytes;
    written as int16-mode tiles (scale 1, offset 0)."""
    arr = np.asarray(arr)
    h, w = arr.shape
    out = bytearray()
    out += b"HF2\0"
    out += struct.pack("<h", 0)
    out += struct.pack("<ii", w, h)
    out += struct.pack("<h", tile_size)
    out += struct.pack("<f", 1.0)      # vertical precision
    gt = geo[0] if geo is not None else (0.0, 1.0, 0.0, float(h), 0.0, -1.0)
    out += struct.pack("<f", (abs(gt[1]) + abs(gt[5])) / 2.0)
    ext = bytearray()
    ext += b"bin\0"
    ext += b"georef-extents".ljust(16, b"\0")
    ext += struct.pack("<i", 34)
    ext += struct.pack("<h", 0)        # extent units
    ext += struct.pack(
        "<4d", gt[0], gt[0] + w * gt[1], gt[3] + h * gt[5], gt[3]
    )
    out += struct.pack("<i", len(ext))
    out += ext
    nxb = (w + tile_size - 1) // tile_size
    nyb = (h + tile_size - 1) // tile_size
    for j in range(nyb):               # bottom block row first
        for i in range(nxb):
            tw = min(tile_size, w - i * tile_size)
            th = min(tile_size, h - j * tile_size)
            y0 = max(0, h - (j + 1) * tile_size)
            tile = arr[y0:y0 + th, i * tile_size:i * tile_size + tw]
            out += struct.pack("<ff", 1.0, 0.0)
            out += _rows_to_stream(np.asarray(tile))
    return gzip.compress(bytes(out), mtime=0) if gz else bytes(out)


def decode_hf2(data: bytes):
    """HF2/HFZ bytes -> ((H,W) int64 north-up array, meta dict)."""
    if data[:2] == b"\x1f\x8b":
        data = gzip.decompress(data)
    if data[:4] != b"HF2\0":
        raise ValueError("hf2: bad magic")
    ver, = struct.unpack_from("<h", data, 4)
    w, h = struct.unpack_from("<ii", data, 6)
    tile_size, = struct.unpack_from("<h", data, 14)
    vert_pres, = struct.unpack_from("<f", data, 16)
    horiz, = struct.unpack_from("<f", data, 20)
    extlen, = struct.unpack_from("<i", data, 24)
    pos = 28
    meta: dict = {"version": ver, "vert_pres": vert_pres}
    end_ext = pos + extlen
    while pos < end_ext:
        btype = data[pos:pos + 4]
        name = data[pos + 4:pos + 20].rstrip(b"\0").decode()
        blen, = struct.unpack_from("<i", data, pos + 20)
        payload = data[pos + 24:pos + 24 + blen]
        if btype == b"bin\0" and name == "georef-extents":
            _units, = struct.unpack_from("<h", payload, 0)
            west, east, south, north = struct.unpack_from("<4d", payload, 2)
            meta["geotransform"] = (
                west, (east - west) / w, 0.0,
                north, 0.0, (south - north) / h,
            )
        pos += 24 + blen
    nxb = (w + tile_size - 1) // tile_size
    nyb = (h + tile_size - 1) // tile_size
    grid = np.zeros((h, w), dtype=np.float64)
    for j in range(nyb):
        for i in range(nxb):
            tw = min(tile_size, w - i * tile_size)
            th = min(tile_size, h - j * tile_size)
            scale, off = struct.unpack_from("<ff", data, pos)
            pos += 8
            y0 = max(0, h - (j + 1) * tile_size)
            for k in range(th):
                ws = data[pos]
                pos += 1
                first, = struct.unpack_from("<i", data, pos)
                pos += 4
                dt = {1: "<i1", 2: "<i2", 4: "<i4"}[ws]
                diffs = np.frombuffer(data, dtype=np.dtype(dt),
                                      count=tw - 1, offset=pos)
                pos += ws * (tw - 1)
                vals = np.concatenate(
                    [[first], diffs.astype(np.int64)]
                ).cumsum()
                grid[y0 + th - 1 - k,
                     i * tile_size:i * tile_size + tw] = (
                    vals * float(scale) + float(off)
                )
    if (grid == np.floor(grid)).all():
        grid = grid.astype(np.int64)
    return grid, meta
