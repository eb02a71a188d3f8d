"""Minimal pure-numpy PNG codec (8-bit gray / RGB / RGBA, 16-bit gray).

A from-scratch stand-in for the reference's libpng driver
(frmts/png/pngdataset.cpp): lossless, so parity is exact byte
equality of decoded pixels. Encoder emits filter-0 scanlines +
zlib (optionally Adam7-interlaced); decoder handles all five
standard filters and Adam7 interlace (spec §8.2, each reduced
image filtered independently). 16-bit grayscale
(the reference's Int16/UInt16 PNG path and the GRIB PNG-packing
depth-16 case) stores big-endian samples; filters operate on bytes
with bpp = 2 per the PNG spec.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"

_COLOR_TYPE = {1: 0, 3: 2, 4: 6}  # channels -> PNG color type
_CHANNELS = {0: 1, 2: 3, 6: 4}

# Adam7 pass grid (PNG spec §8.2): (x0, y0, dx, dy) per pass
_ADAM7 = ((0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
          (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))


def _chunk(tag: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + tag
        + data
        + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
    )


def _filter0_stream(lanes: np.ndarray, interlace: bool) -> bytes:
    """(h, w, bpp-bytes) byte lanes -> raw pre-zlib IDAT stream with
    filter byte 0 per scanline; Adam7 concatenates the 7 reduced
    images (empty passes contribute nothing — PNG spec §8.2)."""
    h, w, bpp = lanes.shape

    def one(img):
        ph, pw = img.shape[:2]
        raw = np.empty((ph, 1 + pw * bpp), dtype=np.uint8)
        raw[:, 0] = 0
        raw[:, 1:] = img.reshape(ph, pw * bpp)
        return raw.tobytes()

    if not interlace:
        return one(lanes)
    parts = []
    for x0, y0, dx, dy in _ADAM7:
        sub = lanes[y0::dy, x0::dx]
        if sub.shape[0] and sub.shape[1]:
            parts.append(one(sub))
    return b"".join(parts)


def encode_png(arr: np.ndarray, level: int = 6,
               interlace: bool = False) -> bytes:
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, c = arr.shape
    inter = 1 if interlace else 0
    if arr.dtype == np.uint16:
        if c != 1:
            raise ValueError("png codec: 16-bit is grayscale-only")
        ihdr = struct.pack(">IIBBBBB", w, h, 16, 0, 0, 0, inter)
        lanes = (arr.reshape(h, w).astype(">u2").view(np.uint8)
                 .reshape(h, w, 2))
        idat = zlib.compress(_filter0_stream(lanes, interlace), level)
        return (_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat)
                + _chunk(b"IEND", b""))
    if arr.dtype != np.uint8:
        raise ValueError("png codec: uint8 (or uint16 gray) only")
    if c not in _COLOR_TYPE:
        raise ValueError(f"png codec: unsupported channel count {c}")
    ihdr = struct.pack(">IIBBBBB", w, h, 8, _COLOR_TYPE[c], 0, 0, inter)
    idat = zlib.compress(_filter0_stream(arr, interlace), level)
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


def encode_png_paletted(idx: np.ndarray, palette: np.ndarray,
                        transparent: int | None = None,
                        level: int = 6) -> bytes:
    """(H,W) uint8 indices + (N,3) palette -> color-type-3 PNG
    (PLTE chunk, optional single-index tRNS — the reference's
    paletted-PNG write path, frmts/png/pngdataset.cpp color table)."""
    idx = np.asarray(idx, dtype=np.uint8)
    palette = np.asarray(palette, dtype=np.uint8)
    if not 1 <= len(palette) <= 256:
        raise ValueError("png codec: palette must have 1..256 entries")
    h, w = idx.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 3, 0, 0, 0)
    filtered = np.concatenate(
        [np.zeros((h, 1), dtype=np.uint8), idx], axis=1
    )
    idat = zlib.compress(filtered.tobytes(), level)
    out = _SIG + _chunk(b"IHDR", ihdr) + _chunk(b"PLTE", palette.tobytes())
    if transparent is not None:
        trns = bytes([255] * transparent + [0])
        out += _chunk(b"tRNS", trns)
    return out + _chunk(b"IDAT", idat) + _chunk(b"IEND", b"")


def _decode_png_raw(data: bytes):
    """-> (pixels (H,W,C) with C=1 for gray/paletted, color_type,
    palette or None, transparent index or None)."""
    if data[:8] != _SIG:
        raise ValueError("png codec: bad signature")
    pos = 8
    w = h = None
    color_type = None
    palette = None
    transparent = None
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
            if comp != 0 or filt != 0 or interlace not in (0, 1):
                raise ValueError("png codec: bad IHDR method fields")
            if depth == 16:
                if color_type != 0:
                    raise ValueError("png codec: 16-bit is grayscale-only")
            elif depth != 8:
                raise ValueError(f"png codec: depth {depth} unsupported")
            if color_type not in _CHANNELS and color_type != 3:
                raise ValueError(f"png codec: color type {color_type} unsupported")
        elif tag == b"PLTE":
            palette = np.frombuffer(body, dtype=np.uint8).reshape(-1, 3).copy()
        elif tag == b"tRNS" and color_type == 3:
            alphas = np.frombuffer(body, dtype=np.uint8)
            zero = np.nonzero(alphas == 0)[0]
            if len(zero):
                transparent = int(zero[0])
        elif tag == b"IDAT":
            idat.extend(body)
        elif tag == b"IEND":
            break
    c = 1 if color_type == 3 else _CHANNELS[color_type]
    bytes_per_px = c * (2 if depth == 16 else 1)
    stride = w * bytes_per_px
    raw = np.frombuffer(zlib.decompress(bytes(idat)), dtype=np.uint8)
    if interlace == 1:
        # Adam7: 7 reduced images back-to-back, each filtered
        # independently (prev row = previous row of the SAME pass)
        lanes = np.zeros((h, w, bytes_per_px), dtype=np.uint8)
        off = 0
        for x0, y0, dx, dy in _ADAM7:
            ph = (h - y0 + dy - 1) // dy
            pw = (w - x0 + dx - 1) // dx
            if ph == 0 or pw == 0:
                continue
            pstride = pw * bytes_per_px
            sub = raw[off:off + ph * (1 + pstride)].reshape(ph, 1 + pstride)
            off += ph * (1 + pstride)
            if np.all(sub[:, 0] == 0):
                px = sub[:, 1:].copy()
            else:
                px = _unfilter(sub, ph, pstride, bytes_per_px)
            lanes[y0::dy, x0::dx] = px.reshape(ph, pw, bytes_per_px)
        pixels = lanes.reshape(h, stride)
    else:
        raw = raw.reshape(h, 1 + stride)
        if np.all(raw[:, 0] == 0):  # fast path: our own encoder's output
            pixels = raw[:, 1:].copy()
        else:
            pixels = _unfilter(raw, h, stride, bytes_per_px)
    if depth == 16:
        b = pixels.reshape(h, w, c, 2).astype(np.uint16)
        pixels = (b[..., 0] << 8) | b[..., 1]
        return pixels, color_type, palette, transparent
    return pixels.reshape(h, w, c), color_type, palette, transparent


def decode_png_paletted(data: bytes):
    """Paletted PNG -> (indices (H,W), palette (N,3), transparent) —
    the reference's band + GDALColorTable view."""
    pixels, color_type, palette, transparent = _decode_png_raw(data)
    if color_type != 3 or palette is None:
        raise ValueError("png codec: not a paletted PNG")
    return pixels[:, :, 0], palette, transparent


def decode_png(data: bytes) -> np.ndarray:
    """-> (H,W) gray, (H,W,3) RGB, or (H,W,4) RGBA; paletted images
    expand through their color table (gdal_translate -expand rgb)."""
    pixels, color_type, palette, _ = _decode_png_raw(data)
    if color_type == 3:
        return palette[pixels[:, :, 0]]
    return pixels[:, :, 0] if pixels.shape[2] == 1 else pixels
