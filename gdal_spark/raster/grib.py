"""GRIB2 codec — simple packing (data representation template 5.0).

Semantics re-derived from the reference writer
(/root/reference/frmts/grib/gribcreatecopy.cpp):

- one GRIB2 message per band, each with sections 0..8
  (gribcreatecopy.cpp:2649-2700);
- all multi-byte integers big-endian; SIGNED fields are
  sign-and-magnitude, high bit = sign (WriteInt16/WriteInt32,
  gribcreatecopy.cpp:83-120);
- section 1 identification, 21 bytes (WriteSection1, :2145);
- section 2 local-use written EMPTY as 5 bytes (:2667);
- section 3 grid definition template 3.0 lat/lon, 72 bytes:
  lat/lon scaled by 1e-6 via floor(v/unit + 0.5) (WriteScaled, :278),
  resolution flags 0x30, scanning mode 0x40 = +j bottom-to-top
  (WriteGeographic, :285-338) — rows are stored south->north;
- section 5 simple packing, 21 bytes: npoints, template 0,
  R float32, E int16, D int16, nbits, original-type byte (:1084-1098);
- section 6 "no bitmap" = 6 bytes with indicator 255 (:1126);
- section 7 = 5-byte header + ceil(n*nbits/8) packed bytes (:1131);
- packed value X: val = (R + X * 2**E) / 10**D (g2clib simpack
  contract; R = min of the decimal-scaled values, E chosen so the
  range fits nbits).

This implements the codec-free subset: simple packing only.
Complex/PNG/JPEG2000 packing raise loudly (no codec stack ships in
this container).
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["encode_grib2", "decode_grib2"]

_MISS1 = 0xFF
_MISS2 = 0xFFFF
_MISS4 = 0xFFFFFFFF


def _u(v: int, n: int) -> bytes:
    return int(v).to_bytes(n, "big")


def _s(v: int, n: int) -> bytes:
    """GRIB sign-and-magnitude signed int (gribcreatecopy.cpp:83)."""
    v = int(v)
    if v < 0:
        return _u((-v) | (1 << (8 * n - 1)), n)
    return _u(v, n)


def _read_s(buf: bytes, off: int, n: int) -> int:
    raw = int.from_bytes(buf[off:off + n], "big")
    sign = 1 << (8 * n - 1)
    return -(raw & ~sign) if raw & sign else raw


def _scaled(v: float) -> bytes:
    """WriteScaled: floor(v/1e-6 + 0.5) as sign-magnitude int32."""
    return _s(int(np.floor(v / 1e-6 + 0.5)), 4)


def _pack_bits(vals: np.ndarray, nbits: int) -> bytes:
    """MSB-first bit-packing of unsigned ints into a byte stream."""
    if nbits == 0 or vals.size == 0:
        return b""
    shifts = np.arange(nbits - 1, -1, -1, dtype=np.uint64)
    bits = ((vals[:, None].astype(np.uint64) >> shifts) & 1).astype(np.uint8)
    return np.packbits(bits.ravel()).tobytes()


def _unpack_bits(data: bytes, n: int, nbits: int) -> np.ndarray:
    if nbits == 0:
        return np.zeros(n, dtype=np.int64)
    bits = np.unpackbits(np.frombuffer(data, dtype=np.uint8))[: n * nbits]
    powers = (np.uint64(1) << np.arange(nbits - 1, -1, -1, dtype=np.uint64))
    return (bits.reshape(n, nbits).astype(np.uint64) * powers).sum(
        axis=1
    ).astype(np.int64)


def _sect3_latlon(w: int, h: int, gt: tuple) -> bytes:
    """Grid definition template 3.0 over a north-up geotransform.

    Mirrors WriteGeographic (gribcreatecopy.cpp:285): lat1/lon1 is the
    LOWER-left pixel centre, scanning +j (bottom-to-top)."""
    if gt[2] != 0.0 or gt[4] != 0.0:
        raise ValueError("grib: rotated geotransforms unsupported")
    px, py = gt[1], abs(gt[5])
    lon1 = gt[0] + px / 2
    lat_top = gt[3] - py / 2
    lat1 = lat_top - (h - 1) * py  # lower row centre
    lon2 = lon1 + (w - 1) * px
    lat2 = lat_top
    body = b"".join(
        [
            _u(3, 1),            # section number
            _u(0, 1),            # source of grid definition
            _u(w * h, 4),        # number of data points
            _u(0, 1), _u(0, 1),  # no optional list
            _u(0, 2),            # template 3.0
            _u(6, 1),            # shape of earth: sphere r=6371229 m
            _u(_MISS1, 1), _u(_MISS4, 4),   # radius scale/value
            _u(_MISS1, 1), _u(_MISS4, 4),   # major axis
            _u(_MISS1, 1), _u(_MISS4, 4),   # minor axis
            _u(w, 4), _u(h, 4),  # Ni, Nj
            _u(0, 4),            # basic angle
            _u(_MISS4, 4),       # subdivisions
            _scaled(lat1), _scaled(lon1),
            _u(0x30, 1),         # resolution/component flags
            _scaled(lat2), _scaled(lon2),
            _scaled(px), _scaled(py),
            _u(0x40, 1),         # scanning mode: +i, +j (bottom-to-top)
        ]
    )
    return _u(4 + len(body), 4) + body


def _sect4() -> bytes:
    """Product definition template 4.0, all-missing defaults
    (WriteSection4, gribcreatecopy.cpp:2330-2385)."""
    body = b"".join(
        [
            _u(4, 1),
            _u(0, 2),        # no coord values
            _u(0, 2),        # PDTN 0
            _u(_MISS1, 1),   # parameter category
            _u(_MISS1, 1),   # parameter number
            _u(_MISS1, 1),   # generating process
            _u(0, 1),        # background process
            _u(_MISS1, 1),   # analysis process
            _u(0, 2),        # hours
            _u(0, 1),        # minutes
            _u(0, 1),        # time unit
            _u(0, 4),        # forecast time
            _u(0, 1), _u(0, 1), _u(0, 4),  # first fixed surface
            _u(_MISS1, 1), _u(_MISS1, 1), _u(_MISS4, 4),  # second surface
        ]
    )
    return _u(4 + len(body), 4) + body


def encode_grib2(arr: np.ndarray, geo: tuple | None = None,
                 dscale: int = 0) -> bytes:
    """(H,W) or (H,W,B) -> GRIB2 bytes, one message per band.

    Values are decimal-scaled by 10**dscale then simple-packed with
    E=0 and R = the scaled minimum, so integer inputs (and inputs
    exact at the given decimal scale) roundtrip bit-exactly."""
    arr = np.asarray(arr)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, nb = arr.shape
    gt = geo[0] if geo is not None else (0.0, 0.01, 0.0, h * 0.01, 0.0, -0.01)
    out = []
    for b in range(nb):
        band = arr[:, :, b].astype(np.float64) * (10.0 ** dscale)
        scaled = np.floor(band + 0.5).astype(np.int64)
        if np.abs(band - scaled).max() > 1e-9:
            raise ValueError(
                "grib: values not exact at decimal scale %d" % dscale
            )
        ref = int(scaled.min())
        if not -(2 ** 24) < ref < 2 ** 24:
            raise ValueError("grib: reference value exceeds float32 exactness")
        span = int(scaled.max()) - ref
        nbits = 0 if span == 0 else max(1, int(span).bit_length())
        # scanning mode +j: emit rows bottom-to-top
        vals = (scaled - ref)[::-1, :].ravel()
        packed = _pack_bits(vals, nbits)

        sect1 = _u(21, 4) + b"".join(
            [
                _u(1, 1),
                _u(_MISS1, 2),   # centre (missing-as-255 like the ref)
                _u(_MISS2, 2),   # subcentre
                _u(2, 1),        # master table
                _u(0, 1),        # local table
                _u(0, 1),        # significance of ref time
                _u(1970, 2), _u(1, 1), _u(1, 1),
                _u(0, 1), _u(0, 1), _u(0, 1),
                _u(_MISS1, 1),   # production status
                _u(_MISS1, 1),   # type of data
            ]
        )
        sect2 = _u(5, 4) + _u(2, 1)
        sect3 = _sect3_latlon(w, h, gt)
        sect4 = _sect4()
        sect5 = _u(21, 4) + b"".join(
            [
                _u(5, 1),
                _u(w * h, 4),
                _u(0, 2),                 # template 5.0 simple packing
                struct.pack(">f", float(ref)),
                _s(0, 2),                 # binary scale factor E
                _s(dscale, 2),            # decimal scale factor D
                _u(nbits, 1),
                _u(1, 1),                 # original data type: integer
            ]
        )
        sect6 = _u(6, 4) + _u(6, 1) + _u(_MISS1, 1)
        sect7 = _u(5 + len(packed), 4) + _u(7, 1) + packed
        body = sect1 + sect2 + sect3 + sect4 + sect5 + sect6 + sect7
        total = 16 + len(body) + 4
        sect0 = b"GRIB" + _u(0, 2) + _u(0, 1) + _u(2, 1) + _u(total, 8)
        out.append(sect0 + body + b"7777")
    return b"".join(out)


def decode_grib2(data: bytes):
    """GRIB2 bytes -> ((H,W,B) array, meta dict).

    Walks every message; requires grid template 3.0, data template 5.0
    (simple packing), no bitmap. Returns int64 pixels when D==0 and the
    reference value is integral, float64 otherwise; meta carries the
    recovered north-up geotransform."""
    bands = []
    meta: dict = {}
    off = 0
    n = len(data)
    while off < n:
        if data[off:off + 4] != b"GRIB":
            raise ValueError("grib: bad magic at offset %d" % off)
        if data[off + 7] != 2:
            raise ValueError("grib: only edition 2 supported")
        total = int.from_bytes(data[off + 8:off + 16], "big")
        end = off + total
        if data[end - 4:end] != b"7777":
            raise ValueError("grib: missing end section")
        pos = off + 16
        w = h = None
        ref = 0.0
        es = ds = 0
        nbits = 0
        npoints = 0
        scan = 0
        packed = b""
        while pos < end - 4:
            slen = int.from_bytes(data[pos:pos + 4], "big")
            snum = data[pos + 4]
            body = data[pos:pos + slen]
            if snum == 3:
                tmpl = int.from_bytes(body[12:14], "big")
                if tmpl != 0:
                    raise ValueError(
                        "grib: unsupported grid template %d" % tmpl
                    )
                w = int.from_bytes(body[30:34], "big")
                h = int.from_bytes(body[34:38], "big")
                lat1 = _read_s(body, 46, 4) * 1e-6
                lon1 = _read_s(body, 50, 4) * 1e-6
                lat2 = _read_s(body, 55, 4) * 1e-6
                lon2 = _read_s(body, 59, 4) * 1e-6
                di = _read_s(body, 63, 4) * 1e-6
                dj = _read_s(body, 67, 4) * 1e-6
                scan = body[71]
                lat_top = max(lat1, lat2)
                meta["geotransform"] = (
                    min(lon1, lon2) - di / 2, di, 0.0,
                    lat_top + dj / 2, 0.0, -dj,
                )
            elif snum == 5:
                tmpl = int.from_bytes(body[9:11], "big")
                if tmpl != 0:
                    raise ValueError(
                        "grib: only simple packing (5.0) supported, got 5.%d"
                        % tmpl
                    )
                npoints = int.from_bytes(body[5:9], "big")
                ref = struct.unpack(">f", body[11:15])[0]
                es = _read_s(body, 15, 2)
                ds = _read_s(body, 17, 2)
                nbits = body[19]
            elif snum == 6:
                if body[5] != 255:
                    raise ValueError("grib: bitmaps unsupported")
            elif snum == 7:
                packed = body[5:]
            pos += slen
        if w is None or npoints != w * h:
            raise ValueError("grib: inconsistent grid/data sizes")
        x = _unpack_bits(packed, npoints, nbits)
        vals = (ref + x.astype(np.float64) * (2.0 ** es)) / (10.0 ** ds)
        grid = vals.reshape(h, w)
        if scan & 0x40:       # +j: stored bottom-to-top
            grid = grid[::-1, :]
        if scan & 0x80:       # -i: stored right-to-left
            grid = grid[:, ::-1]
        if ds == 0 and es >= 0 and float(ref).is_integer():
            grid = np.round(grid).astype(np.int64)
        bands.append(grid)
        off = end
    meta["nbands"] = len(bands)
    return np.stack(bands, axis=2), meta
