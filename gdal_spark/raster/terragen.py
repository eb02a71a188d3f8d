"""Terragen TER heightfield codec.

Semantics re-derived from the reference driver
(/root/reference/frmts/terragen/terragendataset.cpp):

- "TERRAGENTERRAIN " 16-byte signature, then 4-char chunk tags:
  SIZE (int16 min(w,h)-1 + 2 pad bytes), XPTS/YPTS (int16 + pad,
  present when non-square, write_header :463-473), SCAL (3 float32,
  written when the ground scale differs from the 30 m default,
  :525-531), ALTW (int16 heightScale + int16 baseHeight + int16
  elevations, :534-614) — all little-endian;
- rows are stored BOTTOM-up (IReadBlock seeks
  (ySize-1-yoff)*rowbytes, :254-256);
- physical elevation = SCAL * (baseHeight + value * heightScale
  / 65536) — exposed as band scale/offset metadata, raw pixels are
  the int16 values (header comment :30-75).
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["encode_terragen", "decode_terragen"]

_SIG = b"TERRAGENTERRAIN "


def encode_terragen(arr: np.ndarray, height_scale: int = 1,
                    base_height: int = 0,
                    scal: float = 30.0) -> bytes:
    """(H,W) int16 raw elevations (row 0 = north) -> TER bytes."""
    arr = np.asarray(arr)
    if np.abs(arr).max(initial=0) > 0x7FFF:
        raise ValueError("terragen: values exceed int16")
    h, w = arr.shape
    out = bytearray(_SIG)
    out += b"SIZE" + struct.pack("<h", min(w, h) - 1) + b"\0\0"
    if w != h:
        out += b"XPTS" + struct.pack("<h", w) + b"\0\0"
        out += b"YPTS" + struct.pack("<h", h) + b"\0\0"
    if scal != 30.0:
        out += b"SCAL" + struct.pack("<fff", scal, scal, scal)
    out += b"ALTW" + struct.pack("<hh", height_scale, base_height)
    out += arr[::-1, :].astype("<i2").tobytes()
    out += b"EOF "
    return bytes(out)


def decode_terragen(data: bytes):
    """TER bytes -> ((H,W) int16 north-up raw array, meta dict with
    scale/offset like the reference's band metadata)."""
    if data[:16] != _SIG:
        raise ValueError("terragen: bad signature")
    pos = 16
    w = h = None
    size = None
    scal = 30.0
    hs, bh = 1, 0
    arr = None
    while pos + 4 <= len(data):
        tag = data[pos:pos + 4]
        pos += 4
        if tag == b"SIZE":
            size, = struct.unpack_from("<h", data, pos)
            pos += 4
        elif tag == b"XPTS":
            w, = struct.unpack_from("<h", data, pos)
            pos += 4
        elif tag == b"YPTS":
            h, = struct.unpack_from("<h", data, pos)
            pos += 4
        elif tag == b"SCAL":
            scal = struct.unpack_from("<f", data, pos)[0]
            pos += 12
        elif tag == b"ALTW":
            hs, bh = struct.unpack_from("<hh", data, pos)
            pos += 4
            if w is None:
                w = h = size + 1
            arr = np.frombuffer(data, dtype="<i2", count=h * w,
                                offset=pos).reshape(h, w)[::-1, :]
            pos += 2 * h * w
        elif tag in (b"EOF ", b"EOF\0"):
            break
        else:
            raise ValueError(f"terragen: unknown chunk {tag!r}")
    if arr is None:
        raise ValueError("terragen: no ALTW chunk")
    meta = {
        "scale": scal * hs / 65536.0,
        "offset": scal * bh,
        "ground_scale": scal,
    }
    return arr.astype(np.int16), meta
