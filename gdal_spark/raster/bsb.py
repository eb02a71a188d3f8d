"""BSB/KAP nautical chart codec.

Semantics re-derived from the reference reader/writer
(/root/reference/frmts/bsb/bsb_read.c):

- ASCII header lines ("!Copyright", "VER/x.y", "BSB/NA=...,RA=w,h",
  "KNP/...", "RGB/<idx>,<r>,<g>,<b>" palette entries — index 0 is
  NOT legal, :1044-1051), terminated by 0x1A 0x00 and one
  color-size byte (bits per pixel, 1..7; :421-430);
- each scanline: the line number as base-128 digits with bit 7 =
  continuation (version >= 2.0 stores nScanline + 1, :1087-1095),
  then RLE packets until a 0x00 terminator;
- packet byte layout (:808-841): bit 7 = count continuation, the
  next nColorSize bits are the palette value, the low 7-nColorSize
  bits are the count's MOST significant digit; continuation bytes
  carry 7 more count bits each (count accumulates base 128); run
  length = count + 1.

The reference's writer emits one packet per pixel ("capturing runs
is patented" humor, :1097-1101); this encoder emits REAL runs —
its output exercises the reader's full multi-byte-count path and
decodes identically.
"""

from __future__ import annotations

import numpy as np

__all__ = ["encode_bsb", "decode_bsb"]


def _line_number(n: int) -> bytes:
    out = bytearray()
    if n >= 128 * 128:
        out.append(0x80 | ((n >> 14) & 0x7F))
    if n >= 128:
        out.append(0x80 | ((n >> 7) & 0x7F))
    out.append(n & 0x7F)
    return bytes(out)


def _encode_run(value: int, length: int, cs: int) -> bytes:
    count = length - 1
    count_bits = 7 - cs
    count_mask = (1 << count_bits) - 1
    # digits base 128, most significant first; the FIRST byte's count
    # field holds the leading digit and must fit count_bits
    digits = [count & 0x7F]
    rest = count >> 7
    while rest:
        digits.append(rest & 0x7F)
        rest >>= 7
    digits.reverse()
    if digits[0] > count_mask:
        digits.insert(0, 0)
    out = bytearray()
    first = (value << count_bits) | digits[0]
    if len(digits) > 1:
        first |= 0x80
    out.append(first)
    for i, d in enumerate(digits[1:], start=1):
        b = d
        if i < len(digits) - 1:
            b |= 0x80
        out.append(b)
    return bytes(out)


def encode_bsb(idx: np.ndarray, palette: list, version: int = 300
               ) -> bytes:
    """(H,W) palette indices (1-based, 0 illegal) + [(r,g,b), ...]
    1-based palette -> .kap bytes with real RLE runs."""
    idx = np.asarray(idx)
    h, w = idx.shape
    n_entries = len(palette) + 1        # entry 0 reserved
    cs = 1
    while (1 << cs) < n_entries:
        cs += 1
    if cs > 7:
        raise ValueError("bsb: at most 127 palette entries")
    if idx.size and (idx.min() < 1 or idx.max() > len(palette)):
        raise ValueError("bsb: indices must be 1..len(palette)")
    hdr = ["!Copyright unknown", "VER/%.1f" % (version / 100.0),
           f"BSB/NA=UNKNOWN,NU=999502,RA={w},{h},DU=254",
           "KNP/SC=25000,GD=WGS84,PR=Mercator"]
    for i, (r, g, b) in enumerate(palette, start=1):
        hdr.append(f"RGB/{i},{r},{g},{b}")
    out = bytearray(("\n".join(hdr) + "\n").encode())
    out += b"\x1a\x00"
    out.append(cs)
    for y in range(h):
        n = y + 1 if version >= 200 else y
        out += _line_number(n)
        row = idx[y]
        start = 0
        for end in range(1, w + 1):
            if end == w or row[end] != row[start]:
                out += _encode_run(int(row[start]), end - start, cs)
                start = end
        out.append(0x00)
    return bytes(out)


def decode_bsb(data: bytes):
    """.kap bytes -> ((H,W) uint8 indices, [(r,g,b)] 1-based palette,
    meta)."""
    mark = data.find(b"\x1a\x00")
    if mark < 0:
        raise ValueError("bsb: missing 0x1A 0x00 header terminator")
    header = data[:mark].decode("ascii", errors="replace")
    w = h = None
    palette: dict = {}
    version = 300
    for line in header.splitlines():
        if line.startswith("BSB/"):
            for part in line[4:].split(","):
                if part.startswith("RA="):
                    w = int(part[3:])
                elif w is not None and h is None and "=" not in part:
                    h = int(part)
        elif line.startswith("VER/"):
            version = int(round(float(line[4:]) * 100))
        elif line.startswith("RGB/"):
            i, r, g, b = (int(v) for v in line[4:].split(","))
            palette[i] = (r, g, b)
    if w is None or h is None:
        raise ValueError("bsb: missing BSB/RA dimensions")
    cs = data[mark + 2]
    if not 1 <= cs <= 7:
        raise ValueError(f"bsb: bad color size {cs}")
    count_bits = 7 - cs
    value_mask = ((1 << cs) - 1) << count_bits
    count_mask = (1 << count_bits) - 1
    pos = mark + 3
    grid = np.zeros((h, w), dtype=np.uint8)
    for y in range(h):
        n = 0
        while True:                       # line number varint
            b = data[pos]
            pos += 1
            n = (n << 7) | (b & 0x7F)
            if not b & 0x80:
                break
        exp = y + 1 if version >= 200 else y
        if n != exp:
            raise ValueError(f"bsb: scanline {y} numbered {n}")
        x = 0
        while True:
            b = data[pos]
            pos += 1
            if b == 0:
                break
            value = (b & value_mask) >> count_bits
            count = b & count_mask
            while b & 0x80:
                b = data[pos]
                pos += 1
                count = count * 128 + (b & 0x7F)
            run = min(count + 1, w - x)
            grid[y, x:x + run] = value
            x += run
    pal = [palette[i] for i in sorted(palette)]
    return grid, pal, {"version": version, "color_size": cs}
