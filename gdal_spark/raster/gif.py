"""GIF87a/89a codec — the reference's GIF driver surface
(frmts/gif/gifdataset.cpp: single Byte band + color table, optional
interlace and GIF89a transparency), re-derived from the published
GIF89a specification (CompuServe, 1990) rather than giflib.

Wire format implemented:
- logical screen descriptor + global color table (2^n entries)
- image descriptor (interlace flag honored, both directions)
- GIF89a Graphic Control Extension (transparent index)
- variable-width LSB-first LZW with CLEAR/EOI codes, 12-bit cap,
  CLEAR-on-full reset, KwKwK case, 255-byte sub-block framing
- extension blocks skipped on decode (comment, application, GCE read)

The LZW symbol loop is per-pixel Python inside an Arrow batch kernel
— acceptable for the tile payload sizes the engine ships (≤512²);
everything around it (palette mapping, interlace shuffle) is numpy.

GDAL semantics notes: the reference exposes GIF as ONE Byte band
with a GDALColorTable (gifdataset.cpp GetColorTable); `decode_gif`
returns (index array, palette, transparent) to mirror that, and
`decode_gif_rgb` applies the palette the way the reference's
pct2rgb.py / gdal_translate -expand rgb does.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = [
    "encode_gif", "decode_gif", "encode_gif_rgb", "decode_gif_rgb",
    "lzw_encode", "lzw_decode",
]

_MAX_CODE = 4096


def lzw_encode(indices: np.ndarray, min_code_size: int) -> bytes:
    """GIF-variant LZW over a flat uint8 index stream (root codes
    0..2^mcs-1, CLEAR then data then EOI; width grows at
    next_code == 2^width + 1, table reset via CLEAR at 4096)."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    width = min_code_size + 1
    table: dict[tuple[int, int], int] = {}
    next_code = eoi + 1
    emit(clear, width)
    px = indices.ravel().tolist()
    if px:
        cur = px[0]
        for k in px[1:]:
            key = (cur, k)
            code = table.get(key)
            if code is not None:
                cur = code
                continue
            emit(cur, width)
            if next_code < _MAX_CODE:
                table[key] = next_code
                next_code += 1
                if next_code == (1 << width) + 1 and width < 12:
                    width += 1
            else:
                emit(clear, width)
                table.clear()
                width = min_code_size + 1
                next_code = eoi + 1
            cur = k
        emit(cur, width)
    emit(eoi, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def lzw_decode(data: bytes, min_code_size: int, npix: int) -> np.ndarray:
    clear = 1 << min_code_size
    eoi = clear + 1
    width = min_code_size + 1
    roots = [(i,) for i in range(clear)] + [None, None]
    table = list(roots)
    next_code = eoi + 1
    out = np.empty(npix, dtype=np.uint8)
    n = 0
    prev: tuple[int, ...] | None = None
    acc = 0
    nbits = 0
    pos = 0
    total = len(data)
    while n < npix:
        while nbits < width:
            if pos >= total:
                raise ValueError("gif: truncated LZW stream")
            acc |= data[pos] << nbits
            pos += 1
            nbits += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table = list(roots)
            next_code = eoi + 1
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            s = table[code]
        elif code < next_code:
            s = table[code]
        elif code == next_code:
            s = prev + (prev[0],)       # KwKwK
        else:
            raise ValueError("gif: corrupt LZW code")
        if prev is not None and next_code < _MAX_CODE:
            table.append(prev + (s[0],))
            next_code += 1
            if next_code == (1 << width) and width < 12:
                width += 1
        out[n:n + len(s)] = s
        n += len(s)
        prev = s
    return out[:npix]


_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _interlace_order(h: int) -> np.ndarray:
    rows = []
    for start, step in _INTERLACE_PASSES:
        rows.extend(range(start, h, step))
    return np.asarray(rows, dtype=np.int64)


def _blocks(payload: bytes) -> bytes:
    out = bytearray()
    for off in range(0, len(payload), 255):
        chunk = payload[off:off + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


def encode_gif(
    idx: np.ndarray,
    palette: np.ndarray,
    interlace: bool = False,
    transparent: int | None = None,
) -> bytes:
    """(H,W) uint8 indices + (N,3) uint8 palette -> GIF bytes."""
    idx = np.asarray(idx, dtype=np.uint8)
    palette = np.asarray(palette, dtype=np.uint8)
    h, w = idx.shape
    n = len(palette)
    if not 1 <= n <= 256:
        raise ValueError("gif: palette must have 1..256 entries")
    depth = max(1, int(np.ceil(np.log2(max(n, 2)))))
    gct = np.zeros((1 << depth, 3), dtype=np.uint8)
    gct[:n] = palette
    ver = b"GIF89a" if transparent is not None else b"GIF87a"
    out = bytearray(ver)
    # logical screen descriptor: GCT present, depth-1 in both fields
    flags = 0x80 | ((depth - 1) << 4) | (depth - 1)
    out += struct.pack("<HHBBB", w, h, flags, 0, 0)
    out += gct.tobytes()
    if transparent is not None:
        out += struct.pack("<BBBBHBB", 0x21, 0xF9, 4, 0x01, 0,
                           transparent, 0)
    out += struct.pack("<BHHHHB", 0x2C, 0, 0, w, h,
                       0x40 if interlace else 0)
    body = idx[_interlace_order(h)] if interlace else idx
    mcs = max(2, depth)
    out.append(mcs)
    out += _blocks(lzw_encode(body, mcs))
    out.append(0x3B)
    return bytes(out)


def decode_gif(data: bytes):
    """GIF bytes -> (index array (H,W) uint8, palette (N,3) uint8,
    transparent index or None). First image block only (the reference
    driver exposes multi-image GIFs one band at a time; animation is
    out of engine scope)."""
    data = bytes(data)
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("gif: bad signature")
    sw, sh, flags, _bg, _ar = struct.unpack_from("<HHBBB", data, 6)
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        gct = np.frombuffer(data, dtype=np.uint8, count=3 * n,
                            offset=pos).reshape(n, 3)
        pos += 3 * n
    transparent = None
    while pos < len(data):
        b = data[pos]
        if b == 0x21:  # extension
            label = data[pos + 1]
            pos += 2
            if label == 0xF9:  # graphic control
                size = data[pos]
                gflags = data[pos + 1]
                if gflags & 0x01:
                    transparent = data[pos + 4]
                pos += size + 1
            while data[pos] != 0:  # remaining/other sub-blocks
                pos += data[pos] + 1
            pos += 1
        elif b == 0x2C:  # image descriptor
            _x, _y, w, h, iflags = struct.unpack_from("<HHHHB", data,
                                                      pos + 1)
            pos += 10
            pal = gct
            if iflags & 0x80:  # local color table
                n = 2 << (iflags & 0x07)
                pal = np.frombuffer(data, dtype=np.uint8, count=3 * n,
                                    offset=pos).reshape(n, 3)
                pos += 3 * n
            mcs = data[pos]
            pos += 1
            payload = bytearray()
            while data[pos] != 0:
                ln = data[pos]
                payload += data[pos + 1:pos + 1 + ln]
                pos += ln + 1
            pos += 1
            idx = lzw_decode(bytes(payload), mcs, w * h).reshape(h, w)
            if iflags & 0x40:  # de-interlace
                order = _interlace_order(h)
                full = np.empty_like(idx)
                full[order] = idx
                idx = full
            if pal is None:
                raise ValueError("gif: no color table")
            return idx, pal.copy(), transparent
        elif b == 0x3B:
            break
        else:
            raise ValueError(f"gif: unknown block 0x{b:02x}")
    raise ValueError("gif: no image block")


def encode_gif_rgb(arr: np.ndarray, interlace: bool = False) -> bytes:
    """(H,W,3) uint8 -> GIF via an exact unique-color palette
    (lossless when the image has ≤256 distinct colors — the
    reference's rgb2pct median-cut path is raster/dither.py; callers
    with richer imagery quantize there first)."""
    arr = np.asarray(arr, dtype=np.uint8)
    h, w, _ = arr.shape
    flat = arr.reshape(-1, 3)
    packed = (flat[:, 0].astype(np.int64) << 16) | \
             (flat[:, 1].astype(np.int64) << 8) | flat[:, 2]
    colors, inverse = np.unique(packed, return_inverse=True)
    if len(colors) > 256:
        raise ValueError(
            "gif: >256 distinct colors — quantize with "
            "raster/dither.py median_cut_palette first"
        )
    palette = np.stack(
        [(colors >> 16) & 0xFF, (colors >> 8) & 0xFF, colors & 0xFF],
        axis=1,
    ).astype(np.uint8)
    return encode_gif(inverse.astype(np.uint8).reshape(h, w), palette,
                      interlace=interlace)


def decode_gif_rgb(data: bytes) -> np.ndarray:
    idx, pal, _ = decode_gif(data)
    return pal[idx]
