"""DTED elevation codec (Digital Terrain Elevation Data).

Semantics re-derived from the reference driver
(/root/reference/frmts/dted/):

- file = UHL (80 B) + DSI (648 B) + ACC (2700 B) + one data record
  per LONGITUDE COLUMN, west->east (dted_api.h:79-81,
  dted_create.c:143-260);
- UHL: "UHL1", lon origin DMS "DDDMMSSH" at 4, lat origin at 12,
  lon/lat intervals in tenths of arcseconds at 20/24, column count
  (nXSize) at 47, points-per-column (nYSize) at 51
  (dted_create.c:148-161);
- data record = 0xAA sentinel + 3-byte block count + 2-byte lon
  count + 2-byte lat count header, then nYSize big-endian elevations
  SOUTH->NORTH in signed-magnitude (bit 15 = sign), then a 4-byte
  checksum = byte sum of the 8+2n preceding bytes
  (DTEDWriteProfile, dted_api.c:745-800);
- decode mirrors DTEDReadProfileEx (dted_api.c:624-705) including
  the improperly-two's-complemented fallback for values < -16000.

Reference-faithful asymmetry: the fallback makes sign-magnitude
values in (-32767, -16000) unrepresentable — the reference's own
writer+reader pair corrupts them identically (real-world elevations
never reach that range; the heuristic exists for buggy files that
wrote two's complement).
"""

from __future__ import annotations

import numpy as np

__all__ = ["encode_dted", "decode_dted"]

_UHL, _DSI, _ACC = 80, 648, 2700


def _dms(deg: int, is_lat: bool) -> bytes:
    """UHL origin field, 8 bytes DDDMMSSH — the reference's default
    "%03d%02d%02d%c" applies to BOTH axes (dted_create.c:148-150)."""
    hemi = (b"S" if deg < 0 else b"N") if is_lat else (b"W" if deg < 0 else b"E")
    return ("%03d0000" % abs(int(deg))).encode() + hemi


def _parse_dms(field: bytes) -> float:
    body, hemi = field[:-1], field[-1:]
    d = int(body[:3])
    m = int(body[3:5])
    s = int(body[5:7])
    val = d + m / 60.0 + s / 3600.0
    return -val if hemi in (b"S", b"W") else val


def encode_dted(arr: np.ndarray, lat0: int = 0, lon0: int = 0) -> bytes:
    """(H,W) int elevations (row 0 = north) -> DTED bytes.

    Column records run west->east; within a record elevations run
    south->north (DTEDWriteProfile reverses the top-down array)."""
    arr = np.asarray(arr)
    if arr.ndim != 2:
        raise ValueError("dted: single-band (H,W) arrays only")
    h, w = arr.shape
    if np.abs(arr).max(initial=0) > 0x7FFF:
        raise ValueError("dted: elevations exceed 15-bit magnitude")

    uhl = bytearray(b" " * _UHL)
    uhl[0:4] = b"UHL1"
    uhl[4:12] = _dms(lon0, False)
    uhl[12:20] = _dms(lat0, True)
    ix = (3600 // (w - 1)) * 10 if w > 1 else 0
    iy = (3600 // (h - 1)) * 10 if h > 1 else 0
    uhl[20:24] = b"%04d" % min(ix, 9999)
    uhl[24:28] = b"%04d" % min(iy, 9999)
    uhl[28:32] = b"NA  "           # absolute vertical accuracy
    uhl[32:35] = b"U  "            # security
    uhl[47:51] = b"%04d" % w
    uhl[51:55] = b"%04d" % h
    uhl[55:56] = b"0"              # multiple accuracy

    dsi = bytearray(b" " * _DSI)
    dsi[0:3] = b"DSI"
    dsi[3:4] = b"U"
    dsi[59:64] = b"DTED0"
    dsi[281:285] = b"%04d" % h
    dsi[285:289] = b"%04d" % w

    acc = bytearray(b" " * _ACC)
    acc[0:3] = b"ACC"

    # signed-magnitude big-endian, south->north per column
    vals = arr[::-1, :].astype(np.int64)          # row 0 now south
    mag = np.abs(vals).astype(np.uint16)
    sm = np.where(vals < 0, mag | 0x8000, mag).astype(">u2")

    out = [bytes(uhl), bytes(dsi), bytes(acc)]
    for x in range(w):
        hdr = bytearray(8)
        hdr[0] = 0xAA
        hdr[1] = 0
        hdr[2] = (x >> 8) & 0xFF
        hdr[3] = x & 0xFF
        hdr[4] = (x >> 8) & 0xFF
        hdr[5] = x & 0xFF
        hdr[6] = 0
        hdr[7] = 0
        body = sm[:, x].tobytes()
        rec = bytes(hdr) + body
        csum = int(np.frombuffer(rec, dtype=np.uint8).sum(dtype=np.int64))
        out.append(rec + int(csum).to_bytes(4, "big"))
    return b"".join(out)


def decode_dted(data: bytes, verify_checksum: bool = True):
    """DTED bytes -> ((H,W) int32 north-up array, meta dict)."""
    if data[:3] != b"UHL":
        raise ValueError("dted: missing UHL record")
    uhl = data[:_UHL]
    lon0 = _parse_dms(uhl[4:12])
    lat0 = _parse_dms(uhl[12:20])
    w = int(uhl[47:51])
    h = int(uhl[51:55])
    data_off = _UHL + _DSI + _ACC
    rec_len = 12 + h * 2
    if len(data) < data_off + w * rec_len:
        raise ValueError("dted: truncated data records")
    recs = np.frombuffer(
        data, dtype=np.uint8, count=w * rec_len, offset=data_off
    ).reshape(w, rec_len)
    if not (recs[:, 0] == 0xAA).all():
        raise ValueError("dted: bad data-record sentinel")
    if verify_checksum:
        sums = recs[:, : 8 + 2 * h].astype(np.int64).sum(axis=1)
        stored = (
            recs[:, 8 + 2 * h].astype(np.int64) << 24
        ) | (recs[:, 9 + 2 * h].astype(np.int64) << 16) | (
            recs[:, 10 + 2 * h].astype(np.int64) << 8
        ) | recs[:, 11 + 2 * h].astype(np.int64)
        if not (sums == stored).all():
            raise ValueError("dted: record checksum mismatch")
    hi = recs[:, 8:8 + 2 * h:2].astype(np.int64)
    lo = recs[:, 9:9 + 2 * h:2].astype(np.int64)
    vals = ((hi & 0x7F) << 8) | lo
    neg = (hi & 0x80) != 0
    vals = np.where(neg, -vals, vals)
    # dted_api.c:652: some files improperly two's-complement their
    # negatives; below -16000 (and not the -32767 nodata) reinterpret
    # the raw 16 bits as two's complement like the reference does.
    twos = neg & (vals < -16000) & (vals != -32767)
    if twos.any():
        raw = (hi << 8) | lo          # high bit set in this branch
        vals = np.where(twos, raw - (1 << 16), vals)
    # records are (x, south->north): transpose + flip to north-up rows
    grid = vals.T[::-1, :].astype(np.int32)
    iy = int(uhl[24:28]) / 36000.0 if h > 1 else 0.0
    ix = int(uhl[20:24]) / 36000.0 if w > 1 else 0.0
    meta = {
        "lat0": lat0,
        "lon0": lon0,
        "geotransform": (lon0 - ix / 2, ix, 0.0,
                         lat0 + (h - 1) * iy + iy / 2, 0.0, -iy),
    }
    return grid, meta
