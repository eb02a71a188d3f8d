"""EXIF APP1 metadata for the JPEG codec: TIFF-IFD encode/parse.

Re-derives the reference's EXIF surface (gcore/gdalexif.cpp — tag
tables + IFD walk exposed as EXIF_* metadata on JPEG datasets;
frmts/jpeg/jpgdataset.cpp ReadEXIFMetadata) from the published
EXIF 2.3 / TIFF 6.0 layouts:

- APP1 segment = marker FFE1 + length + b"Exif\\0\\0" + a TIFF byte
  stream (II/MM, magic 42, chained IFDs).
- IFD0 holds the camera tags and pointers to the Exif and GPS IFDs.
- Values <= 4 bytes pack inline; larger values live in a data area
  addressed by offset from the TIFF header.

`build_exif`/`parse_exif` are exact inverses for the supported tag
set; `insert_app1`/`extract_app1` splice the segment into / out of a
JPEG byte stream without touching entropy-coded data.
"""

from __future__ import annotations

import struct

# name -> (tag id, ifd, type)
# ifd: 0 = IFD0, 1 = Exif IFD, 2 = GPS IFD
# type: 2 ASCII, 3 SHORT, 4 LONG, 5 RATIONAL
_TAGS = {
    "Make": (0x010F, 0, 2),
    "Model": (0x0110, 0, 2),
    "Orientation": (0x0112, 0, 3),
    "DateTime": (0x0132, 0, 2),
    "ExposureTime": (0x829A, 1, 5),
    "FNumber": (0x829D, 1, 5),
    "ISOSpeedRatings": (0x8827, 1, 3),
    "PixelXDimension": (0xA002, 1, 4),
    "PixelYDimension": (0xA003, 1, 4),
    "GPSLatitudeRef": (0x0001, 2, 2),
    "GPSLatitude": (0x0002, 2, 5),
    "GPSLongitudeRef": (0x0003, 2, 2),
    "GPSLongitude": (0x0004, 2, 5),
}
_EXIF_PTR = 0x8769
_GPS_PTR = 0x8825
_BY_ID = {(ifd, tag): (name, typ) for name, (tag, ifd, typ) in _TAGS.items()}
_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8}


def _encode_value(typ: int, value) -> tuple[bytes, int]:
    """-> (raw bytes, count) little-endian."""
    if typ == 2:
        b = str(value).encode("ascii") + b"\x00"
        return b, len(b)
    if typ == 3:
        vals = value if isinstance(value, (tuple, list)) else (value,)
        return struct.pack(f"<{len(vals)}H", *[int(v) for v in vals]), len(vals)
    if typ == 4:
        vals = value if isinstance(value, (tuple, list)) else (value,)
        return struct.pack(f"<{len(vals)}I", *[int(v) for v in vals]), len(vals)
    if typ == 5:
        # one rational is a (num, den) pair; sequences are tuples of pairs
        if isinstance(value, (tuple, list)) and value and isinstance(
                value[0], (tuple, list)):
            pairs = value
        else:
            pairs = (value,)
        raw = b"".join(struct.pack("<II", int(n), int(d)) for n, d in pairs)
        return raw, len(pairs)
    raise ValueError(f"exif: unsupported type {typ}")


def build_exif(tags: dict) -> bytes:
    """tags: {name: value} over the supported set -> b'Exif\\0\\0'+TIFF
    (little-endian) payload for an APP1 segment."""
    unknown = set(tags) - set(_TAGS)
    if unknown:
        raise KeyError(f"exif: unsupported tags {sorted(unknown)}")
    per_ifd: dict[int, list] = {0: [], 1: [], 2: []}
    for name, value in tags.items():
        tag, ifd, typ = _TAGS[name]
        raw, count = _encode_value(typ, value)
        per_ifd[ifd].append((tag, typ, count, raw))
    # IFD0 carries pointers to any non-empty sub-IFD
    n0 = len(per_ifd[0]) + (1 if per_ifd[1] else 0) + (1 if per_ifd[2] else 0)
    sizes = {0: 2 + 12 * n0 + 4}
    for k in (1, 2):
        sizes[k] = (2 + 12 * len(per_ifd[k]) + 4) if per_ifd[k] else 0
    off_ifd0 = 8
    off_exif = off_ifd0 + sizes[0]
    off_gps = off_exif + sizes[1]
    data_base = off_gps + sizes[2]
    data = bytearray()

    def entries_bytes(entries: list) -> bytes:
        out = b""
        for tag, typ, count, raw in sorted(entries):
            if len(raw) <= 4:
                val = raw + b"\x00" * (4 - len(raw))
            else:
                off = data_base + len(data)
                data.extend(raw)
                if len(raw) % 2:
                    data.append(0)
                val = struct.pack("<I", off)
            out += struct.pack("<HHI", tag, typ, count) + val
        return out

    ifd0 = per_ifd[0][:]
    if per_ifd[1]:
        ifd0.append((_EXIF_PTR, 4, 1, struct.pack("<I", off_exif)))
    if per_ifd[2]:
        ifd0.append((_GPS_PTR, 4, 1, struct.pack("<I", off_gps)))
    body = struct.pack("<H", len(ifd0)) + entries_bytes(ifd0) + b"\x00" * 4
    for k, off in ((1, off_exif), (2, off_gps)):
        if per_ifd[k]:
            body += struct.pack("<H", len(per_ifd[k]))
            body += entries_bytes(per_ifd[k]) + b"\x00" * 4
    tiff = b"II" + struct.pack("<HI", 42, 8) + body + bytes(data)
    return b"Exif\x00\x00" + tiff


def parse_exif(payload: bytes) -> dict:
    """Inverse of build_exif; also accepts big-endian (MM) streams."""
    if payload[:6] != b"Exif\x00\x00":
        raise ValueError("exif: missing Exif header")
    t = payload[6:]
    bo = {"II": "<", "MM": ">"}.get(t[:2].decode("ascii", "replace"))
    if bo is None or struct.unpack_from(f"{bo}H", t, 2)[0] != 42:
        raise ValueError("exif: bad TIFF header")
    (ifd0_off,) = struct.unpack_from(f"{bo}I", t, 4)
    out: dict = {}
    sub_offsets: list[tuple[int, int]] = []

    def read_ifd(off: int, ifd_kind: int):
        (n,) = struct.unpack_from(f"{bo}H", t, off)
        for k in range(n):
            e = off + 2 + 12 * k
            tag, typ, count = struct.unpack_from(f"{bo}HHI", t, e)
            size = _TYPE_SIZE.get(typ, 1) * count
            voff = e + 8 if size <= 4 else struct.unpack_from(
                f"{bo}I", t, e + 8)[0]
            if tag == _EXIF_PTR and ifd_kind == 0:
                sub_offsets.append((struct.unpack_from(
                    f"{bo}I", t, e + 8)[0], 1))
                continue
            if tag == _GPS_PTR and ifd_kind == 0:
                sub_offsets.append((struct.unpack_from(
                    f"{bo}I", t, e + 8)[0], 2))
                continue
            known = _BY_ID.get((ifd_kind, tag))
            if known is None:
                continue
            name, _typ = known
            if typ == 2:
                raw = t[voff:voff + count]
                out[name] = raw.split(b"\x00")[0].decode("ascii", "replace")
            elif typ in (3, 4):
                fmt = "H" if typ == 3 else "I"
                vals = struct.unpack_from(f"{bo}{count}{fmt}", t, voff)
                out[name] = vals[0] if count == 1 else tuple(vals)
            elif typ == 5:
                pairs = tuple(
                    struct.unpack_from(f"{bo}II", t, voff + 8 * j)
                    for j in range(count)
                )
                out[name] = pairs[0] if count == 1 else pairs
    read_ifd(ifd0_off, 0)
    for off, kind in sub_offsets:
        read_ifd(off, kind)
    return out


def insert_app1(jpeg: bytes, exif_payload: bytes) -> bytes:
    """Splice an APP1 segment directly after SOI (the EXIF spec's
    required position)."""
    if jpeg[:2] != b"\xff\xd8":
        raise ValueError("exif: not a JPEG")
    seg = b"\xff\xe1" + struct.pack(">H", len(exif_payload) + 2) + exif_payload
    return jpeg[:2] + seg + jpeg[2:]


def extract_app1(jpeg: bytes) -> bytes | None:
    """First APP1 Exif segment payload, or None."""
    if jpeg[:2] != b"\xff\xd8":
        raise ValueError("exif: not a JPEG")
    pos = 2
    while pos + 4 <= len(jpeg) and jpeg[pos] == 0xFF:
        marker = jpeg[pos + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        if marker in (0xDA, 0xD9):  # SOS / premature EOI: no more headers
            return None
        (seglen,) = struct.unpack_from(">H", jpeg, pos + 2)
        if marker == 0xE1 and jpeg[pos + 4:pos + 10] == b"Exif\x00\x00":
            return jpeg[pos + 4:pos + 2 + seglen]
        pos += 2 + seglen
    return None


def exif_metadata(jpeg: bytes) -> dict[str, str]:
    """GDAL-style EXIF_* string metadata for a JPEG byte stream
    (jpgdataset.cpp ReadEXIFMetadata): {} when no EXIF is present."""
    payload = extract_app1(jpeg)
    if payload is None:
        return {}
    return {f"EXIF_{k}": str(v) for k, v in parse_exif(payload).items()}


def strip_app1(jpeg: bytes) -> bytes:
    """Remove every APP1 Exif segment (the privacy-scrub op:
    gdal_edit -unsetmd's JPEG-EXIF effect).  Walks marker headers
    like extract_app1 and leaves entropy-coded bytes untouched."""
    if jpeg[:2] != b"\xff\xd8":
        raise ValueError("exif: not a JPEG")
    out = bytearray(jpeg[:2])
    pos = 2
    while pos + 4 <= len(jpeg) and jpeg[pos] == 0xFF:
        marker = jpeg[pos + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            out += jpeg[pos:pos + 2]
            pos += 2
            continue
        if marker in (0xDA, 0xD9):
            # SOS or a premature EOI: entropy/trailing bytes follow —
            # neither carries a length word, stop the marker walk here.
            break
        (seglen,) = struct.unpack_from(">H", jpeg, pos + 2)
        if not (marker == 0xE1
                and jpeg[pos + 4:pos + 10] == b"Exif\x00\x00"):
            out += jpeg[pos:pos + 2 + seglen]
        pos += 2 + seglen
    out += jpeg[pos:]
    return bytes(out)
