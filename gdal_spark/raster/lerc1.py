"""LERC v1 ("CntZImage") codec — Esri's Limited Error Raster
Compression, the MRF driver's LERC page format.

Wire format re-derived from frmts/mrf/LERCV1/Lerc1Image.cpp (the
format itself is public, Apache-2.0 Esri spec):

- header: ``"CntZImage "`` + version 11 + type 8 + height + width
  (int32 LE) + maxZError (f64 LE)  (write(), :358-368);
- two parts, mask ("cnt") then z, each led by numTilesVert,
  numTilesHori, numBytes (int32 LE) + maxValInImg (f32 LE)
  (:392-396);
- cnt part is never tiled: numBytes == 0 means a constant mask with
  maxValInImg 1.0 (all valid) / 0.0 (all void) (:497-504), else a
  byte-level RLE of the bitmask (int16 LE counts: negative = repeat
  of next byte, positive = literal run, terminated by -32768;
  RLEdecompress :46-91); mask bit k is ``0x80 >> (k & 7)`` of byte
  ``k >> 3`` (Lerc1Image.h:88-91);
- z part tiles: tileHeight = height // numTilesVert, the loop visits
  ``range(0, height, tileHeight)`` so the actual tile count can
  exceed numTilesVert (writeTiles :640-647 — reader mirrors);
- per tile a flag byte (low 6 bits): 0 = raw float32 per valid
  pixel, 1 = bit-stuffed quantized ints, 2 = constant 0, 3 =
  constant zMin; the top 2 bits hold ``bits67[n-1]`` where n is the
  1/2/4-byte encoding of zMin (numBytesFlt :607-614; signed char /
  int16 / float32, writeFlt :592-604);
- flag 1 payload: zMin, then one byte ``nBits(maxElem) |
  bits67[numBytesUInt(numValid)-1]``, numValid (LE), then values
  ``uint((z - zMin) * 0.5/maxZError + 0.5)`` packed MSB-first into
  little-endian 32-bit words; the final partial accumulator is
  right-shifted by whole free bytes then written low-bytes-LE
  (writeZTile :836-878, blockread :221-285);
- decode reconstructs ``min(maxValInImg, zMin + 2*maxZError*val)``
  (readZTile :957-960).

``max_z_error = 0.25`` makes integer-valued rasters roundtrip
EXACTLY (quanta 0.5 lands every integer on a lattice point) — the
trick the MRF integration uses for uint8 pages.
"""

from __future__ import annotations

import math
import struct

import numpy as np

__all__ = ["encode_lerc1", "decode_lerc1"]

_SIG = b"CntZImage "
_VER = 11
_TYPE = 8
_MAXQ = float(0x1000000)
_BITS67 = {1: 0x80, 2: 0x40, 4: 0x00}  # bits67[n-1]; 0xC0 invalid
_STIB67 = (4, 2, 1, 0)
_MAX_RUN = 32767
_MIN_RUN = 5
_EOT = -(_MAX_RUN + 1)


def _num_bytes_flt(z: float) -> int:
    if not math.isfinite(z) or z > 32767 or z < -32768 or z != float(int(z)):
        return 4
    if z > 127 or z < -128:
        return 2
    return 1


def _write_flt(z: float, n: int) -> bytes:
    if n == 4:
        return struct.pack("<f", z)
    if n == 1:
        return struct.pack("<b", int(z))
    return struct.pack("<h", int(z))


def _read_flt(buf: bytes, pos: int, n: int) -> float:
    if n == 4:
        return struct.unpack_from("<f", buf, pos)[0]
    if n == 1:
        return float(struct.unpack_from("<b", buf, pos)[0])
    return float(struct.unpack_from("<h", buf, pos)[0])


def _num_bytes_uint(k: int) -> int:
    return 1 if k <= 0xFF else (2 if k <= 0xFFFF else 4)


def _stuff(vals, num_bits: int) -> bytes:
    out = bytearray()
    acc = 0
    bits = 32
    for v in vals:
        v = int(v)
        if bits >= num_bits:
            acc |= v << (bits - num_bits)
            bits -= num_bits
        else:
            acc |= v >> (num_bits - bits)
            out += struct.pack("<I", acc & 0xFFFFFFFF)
            bits += 32 - num_bits
            acc = (v << bits) & 0xFFFFFFFF
    nbytes = 4
    while bits >= 8:
        acc >>= 8
        bits -= 8
        nbytes -= 1
    out += struct.pack("<I", acc & 0xFFFFFFFF)[:nbytes]
    return bytes(out)


def _unstuff(buf: bytes, pos: int, n_vals: int, num_bits: int):
    num_bytes = (n_vals * num_bits + 7) // 8
    end = pos + num_bytes
    if end > len(buf):
        raise ValueError("lerc1: bit-stuffed block truncated")
    vals = []
    acc = 0
    bits = 0
    p = pos
    remaining = num_bytes
    for _ in range(n_vals):
        if bits >= num_bits:
            vals.append(acc >> (32 - num_bits))
            acc = (acc << num_bits) & 0xFFFFFFFF
            bits -= num_bits
            continue
        v = (acc >> (32 - bits)) << (num_bits - bits) if bits else 0
        nb = min(remaining, 4)
        chunk = buf[p : p + nb]
        p += nb
        remaining -= nb
        # partial words load into the HIGH bytes of the accumulator
        # (blockread :273-276)
        acc = int.from_bytes(b"\0" * (4 - nb) + chunk, "little")
        bits += 32 - num_bits
        v |= acc >> bits
        acc = (acc << (32 - bits)) & 0xFFFFFFFF
        vals.append(v)
    return vals, end


def _rle_compress(mask_bytes: bytes) -> bytes:
    out = bytearray()
    i = 0
    n = len(mask_bytes)
    lit_start = 0
    def flush_literal(upto):
        nonlocal lit_start
        j = lit_start
        while j < upto:
            c = min(upto - j, _MAX_RUN)
            out.extend(struct.pack("<h", c))
            out.extend(mask_bytes[j : j + c])
            j += c
        lit_start = upto
    while i < n:
        run = 1
        while i + run < n and run < _MAX_RUN and \
                mask_bytes[i + run] == mask_bytes[i]:
            run += 1
        if run >= _MIN_RUN:
            flush_literal(i)
            out.extend(struct.pack("<h", -run))
            out.append(mask_bytes[i])
            i += run
            lit_start = i
        else:
            i += run
    flush_literal(n)
    out.extend(struct.pack("<h", _EOT))
    return bytes(out)


def _rle_decompress(buf: bytes, pos: int, end: int, size: int) -> bytearray:
    out = bytearray()
    while len(out) < size:
        if pos + 2 > end:
            raise ValueError("lerc1: RLE mask truncated")
        (count,) = struct.unpack_from("<h", buf, pos)
        pos += 2
        if count < 0:
            if pos >= end:
                raise ValueError("lerc1: RLE repeat truncated")
            out.extend(buf[pos : pos + 1] * (-count))
            pos += 1
        else:
            if pos + count > end:
                raise ValueError("lerc1: RLE literal truncated")
            out.extend(buf[pos : pos + count])
            pos += count
    if pos + 2 > end or struct.unpack_from("<h", buf, pos)[0] != _EOT:
        raise ValueError("lerc1: RLE mask missing EOT")
    return out[:size]


def encode_lerc1(arr: np.ndarray, max_z_error: float = 0.25,
                 mask: np.ndarray | None = None,
                 tile_target: int = 8) -> bytes:
    """(h, w) numeric array (+ optional validity mask) -> LERC1 bytes.
    Values are coded as float32 (the format's native type); with
    ``max_z_error = 0.25`` integer inputs roundtrip exactly."""
    a = np.asarray(arr, dtype=np.float64)
    if a.ndim != 2:
        raise ValueError("lerc1: (h, w) arrays only")
    if not np.isfinite(a).all():
        raise ValueError("lerc1: non-finite values unsupported")
    h, w = a.shape
    valid = (np.ones((h, w), dtype=bool) if mask is None
             else np.asarray(mask, dtype=bool))
    if valid.shape != (h, w):
        raise ValueError("lerc1: mask shape mismatch")

    out = bytearray()
    out += _SIG
    out += struct.pack("<iiii", _VER, _TYPE, h, w)
    out += struct.pack("<d", float(max_z_error))

    # ---- cnt (mask) part
    if valid.all() or (~valid).all():
        out += struct.pack("<iii", 0, 0, 0)
        out += struct.pack("<f", 1.0 if valid.all() else 0.0)
    else:
        packed = np.packbits(valid.reshape(-1)).tobytes()
        size = 1 + (h * w - 1) // 8
        rle = _rle_compress(packed[:size])
        out += struct.pack("<iii", 0, 0, len(rle))
        out += struct.pack("<f", 1.0)
        out += rle

    # ---- z part
    ntv = max(1, h // tile_target)
    nth = max(1, w // tile_target)
    tile_h = h // ntv
    tile_w = w // nth
    f32 = a.astype(np.float32)
    max_in_img = float(f32[valid].max()) if valid.any() else 0.0
    tiles = bytearray()
    for v0 in range(0, h, tile_h):
        v1 = min(h, v0 + tile_h)
        for c0 in range(0, w, tile_w):
            c1 = min(w, c0 + tile_w)
            tiles += _encode_z_tile(
                f32[v0:v1, c0:c1], valid[v0:v1, c0:c1],
                float(max_z_error))
    out += struct.pack("<iii", ntv, nth, len(tiles))
    out += struct.pack("<f", max_in_img)
    out += tiles
    return bytes(out)


def _encode_z_tile(tile: np.ndarray, valid: np.ndarray,
                   mze: float) -> bytes:
    vals = tile[valid].astype(np.float64)
    if vals.size == 0:
        return b"\x02"
    zmin = float(vals.min())
    zmax = float(vals.max())
    if zmin == 0.0 and zmax == 0.0:
        return b"\x02"
    if mze == 0.0 or (zmax - zmin) / (2 * mze) > _MAXQ:
        return b"\x00" + tile.astype(np.float32)[valid].tobytes()
    f = 0.5 / mze
    max_elem = int((zmax - zmin) * f + 0.5)
    flag = 3 if max_elem == 0 else 1
    n = _num_bytes_flt(zmin)
    out = bytearray()
    out.append(flag | _BITS67[n])
    out += _write_flt(zmin, n)
    if max_elem > 0:
        num_bits = max_elem.bit_length()
        q = np.floor((vals - zmin) * f + 0.5).astype(np.int64)
        m = _num_bytes_uint(vals.size)
        out.append(num_bits | _BITS67[m])
        out += int(vals.size).to_bytes(m, "little")
        out += _stuff(q.tolist(), num_bits)
    return bytes(out)


def decode_lerc1(buf: bytes):
    """LERC1 bytes -> (float32 array, bool validity mask)."""
    arr, mask, _used = decode_lerc1_sized(buf)
    return arr, mask


def decode_lerc1_sized(buf: bytes):
    """Like :func:`decode_lerc1` but also returns the exact byte
    count consumed — concatenated-plane payloads (the MRF LERC page
    layout) split on it."""
    if buf[: len(_SIG)] != _SIG:
        raise ValueError("lerc1: bad signature")
    pos = len(_SIG)
    ver, typ, h, w = struct.unpack_from("<iiii", buf, pos)
    pos += 16
    (mze,) = struct.unpack_from("<d", buf, pos)
    pos += 8
    if ver != _VER or typ != _TYPE:
        raise ValueError(f"lerc1: unsupported version/type {ver}/{typ}")
    if h < 1 or w < 1:
        raise ValueError("lerc1: bad dimensions")

    # ---- cnt part
    ntv, nth, nbytes = struct.unpack_from("<iii", buf, pos)
    pos += 12
    (maxval,) = struct.unpack_from("<f", buf, pos)
    pos += 4
    if ntv != 0 or nth != 0:
        raise ValueError("lerc1: tiled cnt part is invalid")
    size = 1 + (h * w - 1) // 8
    if nbytes == 0:
        if maxval not in (0.0, 1.0):
            raise ValueError("lerc1: constant mask must be 0 or 1")
        valid = np.full((h, w), maxval != 0.0, dtype=bool)
    else:
        raw = _rle_decompress(buf, pos, pos + nbytes, size)
        bits = np.unpackbits(np.frombuffer(bytes(raw), dtype=np.uint8))
        valid = bits[: h * w].astype(bool).reshape(h, w)
    pos += nbytes

    # ---- z part
    ntv, nth, nbytes = struct.unpack_from("<iii", buf, pos)
    pos += 12
    (max_in_img,) = struct.unpack_from("<f", buf, pos)
    pos += 4
    if ntv < 1 or nth < 1:
        raise ValueError("lerc1: z part must be tiled")
    end = pos + nbytes
    tile_h = h // ntv
    tile_w = w // nth
    out = np.zeros((h, w), dtype=np.float32)
    for v0 in range(0, h, tile_h):
        v1 = min(h, v0 + tile_h)
        for c0 in range(0, w, tile_w):
            c1 = min(w, c0 + tile_w)
            pos = _decode_z_tile(buf, pos, end, out, valid,
                                 v0, v1, c0, c1, mze, max_in_img)
    return out, valid, end


def _decode_z_tile(buf, pos, end, out, valid, r0, r1, c0, c1, mze,
                   max_in_img):
    if pos >= end:
        raise ValueError("lerc1: z tile truncated")
    flag = buf[pos]
    pos += 1
    n = _STIB67[flag >> 6]
    flag &= 63
    if n == 0 or flag > 3:
        raise ValueError(f"lerc1: bad tile flag {flag}")
    if flag == 2:  # constant 0 (mask ignored, like the reference)
        out[r0:r1, c0:c1] = 0.0
        return pos
    if flag == 0:  # raw floats for valid pixels
        m = valid[r0:r1, c0:c1]
        cnt = int(m.sum())
        vals = np.frombuffer(buf, dtype="<f4", count=cnt, offset=pos)
        block = out[r0:r1, c0:c1]
        block[m] = vals
        out[r0:r1, c0:c1] = block
        return pos + 4 * cnt
    zmin = _read_flt(buf, pos, n)
    pos += n
    if flag == 3:  # constant zMin
        out[r0:r1, c0:c1] = zmin
        return pos
    hdr = buf[pos]
    pos += 1
    m = _STIB67[hdr >> 6]
    num_bits = hdr & 63
    if m == 0 or num_bits >= 32:
        raise ValueError("lerc1: bad block header")
    n_valid = int.from_bytes(buf[pos : pos + m], "little")
    pos += m
    vals, pos = _unstuff(buf, pos, n_valid, num_bits)
    msk = valid[r0:r1, c0:c1]
    if int(msk.sum()) != n_valid:
        raise ValueError("lerc1: valid-count mismatch")
    q = 2.0 * mze
    rec = np.minimum(max_in_img,
                     (zmin + q * np.asarray(vals, dtype=np.float64))
                     ).astype(np.float32)
    block = out[r0:r1, c0:c1]
    block[msk] = rec
    out[r0:r1, c0:c1] = block
    return pos
