"""Minimal pure-numpy baseline TIFF codec (uncompressed, 8-bit).

Stand-in for the reference's GTiff driver read path
(frmts/gtiff/gtiffdataset_read.cpp) at "baseline strip TIFF" scope:
little-endian classic TIFF, chunky planar config, 1 or 3 samples,
uncompressed strips. Lossless -> exact pixel parity.
"""

from __future__ import annotations

import struct

import numpy as np

_II = b"II*\x00"

# tag ids
T_WIDTH, T_HEIGHT, T_BPS, T_COMPRESSION, T_PHOTO = 256, 257, 258, 259, 262
T_STRIP_OFFSETS, T_SPP, T_ROWS_PER_STRIP, T_STRIP_COUNTS, T_PLANAR = (
    273,
    277,
    278,
    279,
    284,
)


def encode_tiff(arr: np.ndarray) -> bytes:
    if arr.ndim == 2:
        arr = arr[:, :, None]
    if arr.dtype != np.uint8:
        raise ValueError("tiff codec: uint8 only")
    h, w, c = arr.shape
    if c not in (1, 3):
        raise ValueError(f"tiff codec: unsupported channel count {c}")
    pixel_data = arr.tobytes()

    entries = []  # (tag, type, count, value_or_offset)
    extra = bytearray()
    header_len = 8
    # layout: header | pixel data | extra values | IFD
    data_off = header_len
    extra_off = data_off + len(pixel_data)

    def add(tag, typ, count, value, inline_size):
        entries.append((tag, typ, count, value, inline_size))

    SHORT, LONG = 3, 4
    add(T_WIDTH, LONG, 1, w, 4)
    add(T_HEIGHT, LONG, 1, h, 4)
    if c == 3:
        bps_off = extra_off + len(extra)
        extra.extend(struct.pack("<3H", 8, 8, 8))
        add(T_BPS, SHORT, 3, bps_off, None)
    else:
        add(T_BPS, SHORT, 1, 8, 4)
    add(T_COMPRESSION, SHORT, 1, 1, 4)
    add(T_PHOTO, SHORT, 1, 2 if c == 3 else 1, 4)
    add(T_STRIP_OFFSETS, LONG, 1, data_off, 4)
    add(T_SPP, SHORT, 1, c, 4)
    add(T_ROWS_PER_STRIP, LONG, 1, h, 4)
    add(T_STRIP_COUNTS, LONG, 1, len(pixel_data), 4)
    add(T_PLANAR, SHORT, 1, 1, 4)

    ifd_off = extra_off + len(extra)
    out = bytearray()
    out += _II + struct.pack("<I", ifd_off)
    out += pixel_data
    out += extra
    out += struct.pack("<H", len(entries))
    for tag, typ, count, value, inline in sorted(entries):
        if inline == 4:
            if typ == 3:  # SHORT packed into 4-byte value field
                out += struct.pack("<HHI", tag, typ, count) + struct.pack(
                    "<HH", value, 0
                )
            else:
                out += struct.pack("<HHII", tag, typ, count, value)
        else:
            out += struct.pack("<HHII", tag, typ, count, value)
    out += struct.pack("<I", 0)  # next IFD
    return bytes(out)


def _read_values(data, typ, count, value_field):
    size = {3: 2, 4: 4}[typ]
    fmt = {3: "H", 4: "I"}[typ]
    if size * count <= 4:
        return list(struct.unpack_from(f"<{count}{fmt}", value_field, 0))
    (off,) = struct.unpack("<I", value_field)
    return list(struct.unpack_from(f"<{count}{fmt}", data, off))


def decode_tiff(data: bytes) -> np.ndarray:
    if data[:4] != _II:
        raise ValueError("tiff codec: not little-endian classic TIFF")
    (ifd_off,) = struct.unpack_from("<I", data, 4)
    (n_entries,) = struct.unpack_from("<H", data, ifd_off)
    tags: dict[int, list[int]] = {}
    for k in range(n_entries):
        base = ifd_off + 2 + 12 * k
        tag, typ, count = struct.unpack_from("<HHI", data, base)
        if typ not in (3, 4):
            continue
        tags[tag] = _read_values(data, typ, count, data[base + 8 : base + 12])
    w = tags[T_WIDTH][0]
    h = tags[T_HEIGHT][0]
    c = tags.get(T_SPP, [1])[0]
    if tags.get(T_COMPRESSION, [1])[0] != 1:
        raise ValueError("tiff codec: only uncompressed supported")
    if tags.get(T_PLANAR, [1])[0] != 1:
        raise ValueError("tiff codec: only chunky planar config supported")
    if any(b != 8 for b in tags.get(T_BPS, [8])):
        raise ValueError("tiff codec: only 8-bit supported")
    offsets = tags[T_STRIP_OFFSETS]
    counts = tags[T_STRIP_COUNTS]
    buf = b"".join(data[o : o + n] for o, n in zip(offsets, counts))
    arr = np.frombuffer(buf, dtype=np.uint8).reshape(h, w, c)
    return arr[:, :, 0] if c == 1 else arr.copy()
