"""Minimal pure-numpy PNG codec (8-bit gray / RGB / RGBA).

A from-scratch stand-in for the reference's libpng driver
(frmts/png/pngdataset.cpp): lossless, so parity is exact byte
equality of decoded pixels. Encoder emits filter-0 scanlines +
zlib; decoder handles all five standard filters.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"

_COLOR_TYPE = {1: 0, 3: 2, 4: 6}  # channels -> PNG color type
_CHANNELS = {0: 1, 2: 3, 6: 4}


def _chunk(tag: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + tag
        + data
        + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
    )


def encode_png(arr: np.ndarray, level: int = 6) -> bytes:
    if arr.ndim == 2:
        arr = arr[:, :, None]
    if arr.dtype != np.uint8:
        raise ValueError("png codec: uint8 only")
    h, w, c = arr.shape
    if c not in _COLOR_TYPE:
        raise ValueError(f"png codec: unsupported channel count {c}")
    ihdr = struct.pack(">IIBBBBB", w, h, 8, _COLOR_TYPE[c], 0, 0, 0)
    # filter byte 0 per scanline
    raw = np.empty((h, 1 + w * c), dtype=np.uint8)
    raw[:, 0] = 0
    raw[:, 1:] = arr.reshape(h, w * c)
    idat = zlib.compress(raw.tobytes(), level)
    return _SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat) + _chunk(b"IEND", b"")


def _unfilter(raw: np.ndarray, h: int, stride: int, bpp: int) -> np.ndarray:
    out = np.zeros((h, stride), dtype=np.uint8)
    for y in range(h):
        ftype = raw[y, 0]
        line = raw[y, 1:].astype(np.int32)
        prev = out[y - 1].astype(np.int32) if y > 0 else np.zeros(stride, np.int32)
        if ftype == 0:
            out[y] = line
        elif ftype == 2:  # Up
            out[y] = (line + prev) & 0xFF
        elif ftype in (1, 3, 4):  # Sub / Average / Paeth need left -> sequential
            cur = np.zeros(stride, np.int32)
            for x in range(stride):
                a = cur[x - bpp] if x >= bpp else 0
                b = prev[x]
                if ftype == 1:
                    v = line[x] + a
                elif ftype == 3:
                    v = line[x] + ((a + b) >> 1)
                else:
                    cc = prev[x - bpp] if x >= bpp else 0
                    p = a + b - cc
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                    pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else cc)
                    v = line[x] + pr
                cur[x] = v & 0xFF
            out[y] = cur
        else:
            raise ValueError(f"png codec: bad filter {ftype}")
    return out


def decode_png(data: bytes) -> np.ndarray:
    if data[:8] != _SIG:
        raise ValueError("png codec: bad signature")
    pos = 8
    w = h = None
    color_type = None
    idat = bytearray()
    while pos < len(data):
        (length,) = struct.unpack_from(">I", data, pos)
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            w, h, depth, color_type, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if depth != 8 or comp != 0 or filt != 0 or interlace != 0:
                raise ValueError("png codec: only 8-bit non-interlaced supported")
            if color_type not in _CHANNELS:
                raise ValueError(f"png codec: color type {color_type} unsupported")
        elif tag == b"IDAT":
            idat.extend(body)
        elif tag == b"IEND":
            break
    c = _CHANNELS[color_type]
    stride = w * c
    raw = np.frombuffer(zlib.decompress(bytes(idat)), dtype=np.uint8)
    raw = raw.reshape(h, 1 + stride)
    if np.all(raw[:, 0] == 0):  # fast path: our own encoder's output
        pixels = raw[:, 1:].copy()
    else:
        pixels = _unfilter(raw, h, stride, c)
    out = pixels.reshape(h, w, c)
    return out[:, :, 0] if c == 1 else out
