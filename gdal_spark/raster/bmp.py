"""BMP codec — the reference's BMP driver scope
(frmts/bmp/bmpdataset.cpp): uncompressed Windows DIB, BITMAPINFOHEADER,
24-bit BGR and 8-bit paletted variants, bottom-up row order, rows
padded to 4 bytes.  Shares the DIB conventions the AVI decoder
(raster/avi.py) already parses from 'DIB ' frames."""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["encode_bmp", "decode_bmp"]


def encode_bmp(arr: np.ndarray, palette: np.ndarray | None = None
               ) -> bytes:
    """(H,W,3) RGB -> 24-bit BMP; (H,W) indices + (N,3) palette ->
    8-bit paletted BMP."""
    arr = np.asarray(arr, dtype=np.uint8)
    if palette is not None:
        if arr.ndim != 2:
            raise ValueError("bmp: paletted input must be single-band")
        h, w = arr.shape
        bpp = 8
        pal = np.zeros((256, 4), dtype=np.uint8)
        p = np.asarray(palette, dtype=np.uint8)
        pal[: len(p), 0] = p[:, 2]  # BGRA quads
        pal[: len(p), 1] = p[:, 1]
        pal[: len(p), 2] = p[:, 0]
        pal_bytes = pal.tobytes()
        rows = arr
    else:
        if arr.ndim != 3 or arr.shape[2] != 3:
            raise ValueError("bmp: expected (H,W,3) RGB or palette=")
        h, w = arr.shape[:2]
        bpp = 24
        pal_bytes = b""
        rows = arr[:, :, ::-1].reshape(h, w * 3)  # RGB -> BGR
    stride = (w * (bpp // 8) + 3) & ~3
    padded = np.zeros((h, stride), dtype=np.uint8)
    padded[:, : rows.shape[1]] = rows
    pixel_data = padded[::-1].tobytes()  # bottom-up
    data_off = 14 + 40 + len(pal_bytes)
    total = data_off + len(pixel_data)
    hdr = struct.pack("<2sIHHI", b"BM", total, 0, 0, data_off)
    info = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, bpp, 0, len(pixel_data),
        2835, 2835, 256 if bpp == 8 else 0, 0,
    )
    return hdr + info + pal_bytes + pixel_data


def decode_bmp(data: bytes):
    """-> (H,W,3) RGB for 24-bit, (indices (H,W), palette (256,3))
    for 8-bit paletted."""
    data = bytes(data)
    if data[:2] != b"BM":
        raise ValueError("bmp: bad signature")
    (data_off,) = struct.unpack_from("<I", data, 10)
    hsize, w, h, _planes, bpp, comp = struct.unpack_from(
        "<IiiHHI", data, 14)
    if comp != 0:
        raise ValueError("bmp: only uncompressed (BI_RGB) supported")
    bottom_up = h > 0
    h = abs(h)
    stride = (w * (bpp // 8) + 3) & ~3
    raw = np.frombuffer(data, dtype=np.uint8, count=h * stride,
                        offset=data_off).reshape(h, stride)
    if bottom_up:
        raw = raw[::-1]
    if bpp == 24:
        bgr = raw[:, : w * 3].reshape(h, w, 3)
        return bgr[:, :, ::-1].copy()
    if bpp == 8:
        pal_off = 14 + hsize
        n_colors = (data_off - pal_off) // 4
        quads = np.frombuffer(data, dtype=np.uint8, count=n_colors * 4,
                              offset=pal_off).reshape(n_colors, 4)
        palette = np.zeros((256, 3), dtype=np.uint8)
        palette[:n_colors, 0] = quads[:, 2]
        palette[:n_colors, 1] = quads[:, 1]
        palette[:n_colors, 2] = quads[:, 0]
        return raw[:, :w].copy(), palette
    raise ValueError(f"bmp: unsupported bit depth {bpp}")
