"""TGA (Targa) image codec — uncompressed + RLE truecolor/grayscale.

Semantics re-derived from the reference driver
(/root/reference/frmts/tga/tgadataset.cpp) and the public TGA 2.0
spec: 18-byte header (id-length, colormap type, image type 2=BGR /
3=gray / 10=RLE-BGR / 11=RLE-gray, origin/size shorts, pixel depth,
descriptor whose bit 5 = top-left origin); pixel rows default
BOTTOM-up unless bit 5 set; truecolor bytes are B,G,R(,A).  RLE
packets: high bit = run (count-1 in low 7 bits, one pixel repeated),
else literal packet of count-1+1 raw pixels; packets never cross the
end of the image but may cross scanlines.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["encode_tga", "decode_tga"]


def encode_tga(arr: np.ndarray, rle: bool = False,
               top_left: bool = True) -> bytes:
    """(H,W) gray or (H,W,3) RGB uint8 -> TGA bytes."""
    arr = np.asarray(arr)
    if arr.dtype != np.uint8:
        raise ValueError("tga: uint8 only")
    gray = arr.ndim == 2
    h, w = arr.shape[:2]
    if gray:
        px = arr[:, :, None]
        depth = 8
        itype = 11 if rle else 3
    else:
        px = arr[:, :, ::-1]          # RGB -> BGR
        depth = 24
        itype = 10 if rle else 2
    if not top_left:
        px = px[::-1, :, :]
    desc = 0x20 if top_left else 0x00
    hdr = struct.pack(
        "<BBBHHBHHHHBB", 0, 0, itype, 0, 0, 0, 0, 0, w, h, depth, desc
    )
    flat = px.reshape(-1, px.shape[2])
    if not rle:
        return hdr + flat.tobytes()
    out = bytearray(hdr)
    n = len(flat)
    i = 0
    while i < n:
        # measure the run at i
        j = i + 1
        while j < n and j - i < 128 and (flat[j] == flat[i]).all():
            j += 1
        if j - i >= 2:
            out.append(0x80 | (j - i - 1))
            out += flat[i].tobytes()
            i = j
        else:
            # literal: until the next run of >= 2 or 128 pixels
            j = i + 1
            while (
                j < n and j - i < 128
                and not (j + 1 < n and (flat[j + 1] == flat[j]).all())
            ):
                j += 1
            out.append(j - i - 1)
            out += flat[i:j].tobytes()
            i = j
    return bytes(out)


def decode_tga(data: bytes) -> np.ndarray:
    (idlen, cmap, itype, _cfirst, _clen, _csize, _x0, _y0, w, h,
     depth, desc) = struct.unpack("<BBBHHBHHHHBB", data[:18])
    if cmap != 0:
        raise ValueError("tga: colormapped images unsupported")
    if itype not in (2, 3, 10, 11):
        raise ValueError(f"tga: unsupported image type {itype}")
    if depth not in (8, 24):
        raise ValueError(f"tga: unsupported depth {depth}")
    nch = depth // 8
    pos = 18 + idlen
    n = h * w
    if itype in (2, 3):
        flat = np.frombuffer(data, dtype=np.uint8, count=n * nch,
                             offset=pos).reshape(n, nch)
    else:
        flat = np.empty((n, nch), dtype=np.uint8)
        got = 0
        while got < n:
            pk = data[pos]
            pos += 1
            cnt = (pk & 0x7F) + 1
            if pk & 0x80:
                flat[got:got + cnt] = np.frombuffer(
                    data, np.uint8, nch, pos
                )
                pos += nch
            else:
                flat[got:got + cnt] = np.frombuffer(
                    data, np.uint8, cnt * nch, pos
                ).reshape(cnt, nch)
                pos += cnt * nch
            got += cnt
    px = flat.reshape(h, w, nch)
    if not desc & 0x20:
        px = px[::-1, :, :]           # bottom-up -> top-down
    if nch == 1:
        return px[:, :, 0].copy()
    return px[:, :, ::-1].copy()      # BGR -> RGB
