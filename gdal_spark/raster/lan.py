"""Erdas LAN/GIS (.lan) codec.

Semantics re-derived from the reference driver
(/root/reference/frmts/raw/landataset.cpp):

- 128-byte binary header (:25-46): magic HEAD74 (int32 W/H) or
  HEADER (float32 W/H), pixel type int16 at offset 6 (0=8bit,
  1=4bit, 2=16bit), band count int16 at offset 8, georef floats at
  108-127 (pixel area, UL center X/Y, pixel width/height).
- Byte order is whatever platform wrote the file; detected from
  header byte 8: zero -> big endian (band count < 256 puts its low
  byte at [8] only on little endian) (:385-389).
- Pixel data is line-interleaved (BIL): band offset =
  128 + (band-1)*pixsize*W, line stride = W*pixsize*nbands (:489).
- 4-bit data packs two pixels per byte, EVEN pixel in the HIGH
  nibble (LAN4BitRasterBand::IReadBlock nibble unpack), with each
  band line occupying W/2 bytes of the same BIL layout.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["encode_lan", "decode_lan"]

_HDR = 128


def encode_lan(arr: np.ndarray, four_bit: bool = False,
               geo: tuple | None = None, big_endian: bool = False
               ) -> bytes:
    """(H,W) or (H,W,B) uint8/int16 -> .lan bytes (HEAD74)."""
    arr = np.asarray(arr)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, nb = arr.shape
    bo = ">" if big_endian else "<"
    if four_bit:
        if arr.dtype != np.uint8 or arr.max() > 15:
            raise ValueError("lan: 4-bit needs uint8 values 0..15")
        if w % 2:
            raise ValueError("lan: 4-bit width must be even")
        ptype = 1
    elif arr.dtype == np.dtype("u1"):
        ptype = 0
    elif arr.dtype == np.dtype("i2"):
        ptype = 2
    else:
        raise ValueError(f"lan: unsupported dtype {arr.dtype}")

    hdr = bytearray(_HDR)
    hdr[0:6] = b"HEAD74"
    struct.pack_into(f"{bo}h", hdr, 6, ptype)
    struct.pack_into(f"{bo}h", hdr, 8, nb)
    struct.pack_into(f"{bo}i", hdr, 16, w)
    struct.pack_into(f"{bo}i", hdr, 20, h)
    if geo is not None:
        gt = geo[0]
        if gt[2] != 0.0 or gt[4] != 0.0:
            raise ValueError("lan: rotated geotransforms unsupported")
        struct.pack_into(f"{bo}h", hdr, 88, 1)          # UTM-ish
        struct.pack_into(f"{bo}f", hdr, 108,
                         abs(gt[1] * gt[5]))            # pixel area
        struct.pack_into(f"{bo}f", hdr, 112, gt[0] + gt[1] / 2.0)
        struct.pack_into(f"{bo}f", hdr, 116, gt[3] + gt[5] / 2.0)
        struct.pack_into(f"{bo}f", hdr, 120, gt[1])
        struct.pack_into(f"{bo}f", hdr, 124, abs(gt[5]))

    if four_bit:
        # even pixel -> high nibble, odd -> low; BIL over W/2 bytes
        packed = (arr[:, 0::2, :] << 4) | arr[:, 1::2, :]
        body = np.moveaxis(packed, 2, 1).astype("u1").tobytes()
    else:
        body = np.moveaxis(arr, 2, 1).astype(
            arr.dtype.newbyteorder(bo)
        ).tobytes()
    return bytes(hdr) + body


def decode_lan(data: bytes):
    magic = data[0:6]
    if magic not in (b"HEAD74", b"HEADER"):
        raise ValueError("lan: bad magic")
    bo = ">" if data[8] == 0 else "<"   # :385 — nbands low byte test
    ptype, nb = struct.unpack_from(f"{bo}hh", data, 6)
    if magic == b"HEADER":
        fw, fh = struct.unpack_from(f"{bo}ff", data, 16)
        w, h = int(fw), int(fh)
    else:
        w, h = struct.unpack_from(f"{bo}ii", data, 16)
    if ptype == 1:
        rows = np.frombuffer(
            data, dtype="u1", count=h * nb * (w // 2), offset=_HDR
        ).reshape(h, nb, w // 2)
        out = np.empty((h, nb, w), dtype=np.uint8)
        out[:, :, 0::2] = rows >> 4
        out[:, :, 1::2] = rows & 0x0F
        out = np.moveaxis(out, 1, 2)
    else:
        dt = np.dtype("u1" if ptype == 0 else "i2").newbyteorder(bo)
        out = np.moveaxis(
            np.frombuffer(data, dtype=dt, count=h * nb * w,
                          offset=_HDR).reshape(h, nb, w), 1, 2)
    meta = {}
    pw, ph = struct.unpack_from(f"{bo}ff", data, 120)
    if pw != 0.0 and ph != 0.0:
        ulx, uly = struct.unpack_from(f"{bo}ff", data, 112)
        meta["geotransform"] = (
            float(ulx) - pw / 2.0, float(pw), 0.0,
            float(uly) + ph / 2.0, 0.0, -float(ph),
        )
    return out, meta
