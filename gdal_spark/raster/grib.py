"""GRIB2 codec — simple (5.0), complex (5.2), complex with spatial
differencing (5.3), and PNG (5.41) data representation templates.

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

Complex packing (templates 5.2/7.2, g2clib compack/comunpack.c) packs
the scaled offsets in general-split groups: per-group reference +
per-group width, group headers each padded to a byte boundary (the
g2clib convention), then the per-group residual bits contiguously.
Spatial differencing (5.3/7.3) stores the first `order` original
values and the overall difference minimum as ww-octet sign-magnitude
ints, then complex-packs the differences (first `order` slots zeroed,
the decoder reconstructs by cumulative summation — comunpack.c's
order-1/order-2 recurrences).  PNG packing (5.41, g2clib
enc_png/dec_png) stores the scaled offsets as a PNG image via the
repo's own codec (raster/png.py): depth 8 -> gray, 16 -> 16-bit gray,
24 -> RGB, 32 -> RGBA, big-endian bytes within a sample.  All
packings here choose E=0 and R = the scaled minimum, so integer
inputs roundtrip bit-exactly.  JPEG2000 packing (5.40, g2clib
jpcpack/jpcunpack) stores the scaled offsets as a lossless raw
codestream via the repo's own T.800 codec (raster/jp2.py): depth 8
-> uint8, <=16 -> uint16 single component; spans beyond 16 bits
raise loudly (documented subset; g2clib itself caps at the jasper
depth limit).
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


_GROUP_LEN = 20  # encoder's general-split group size (last group shorter)


def _pack_bits_concat(chunks: list) -> bytes:
    """Bit-contiguous packing of (vals, nbits) runs — no per-run byte
    padding (the group-data stream of template 7.2)."""
    parts = []
    for vals, nbits in chunks:
        if nbits == 0 or len(vals) == 0:
            continue
        shifts = np.arange(nbits - 1, -1, -1, dtype=np.uint64)
        bits = ((np.asarray(vals, dtype=np.uint64)[:, None] >> shifts) & 1)
        parts.append(bits.astype(np.uint8).ravel())
    if not parts:
        return b""
    return np.packbits(np.concatenate(parts)).tobytes()


def _complex_groups(offsets: np.ndarray):
    """Split non-negative scaled offsets into general-split groups.

    -> (grefs, widths, lengths) int64 arrays, one entry per group."""
    n = offsets.size
    ng = max(1, -(-n // _GROUP_LEN))
    grefs = np.empty(ng, dtype=np.int64)
    widths = np.empty(ng, dtype=np.int64)
    lengths = np.empty(ng, dtype=np.int64)
    for g in range(ng):
        part = offsets[g * _GROUP_LEN:(g + 1) * _GROUP_LEN]
        lo, hi = int(part.min()), int(part.max())
        grefs[g] = lo
        widths[g] = (hi - lo).bit_length() if hi > lo else 0
        lengths[g] = part.size
    return grefs, widths, lengths


def _encode_complex_body(offsets: np.ndarray):
    """-> (sect5 tail after octet 21, sect7 payload) for template 5.2
    given the non-negative scaled offsets (X - R)."""
    grefs, widths, lengths = _complex_groups(offsets)
    ng = len(grefs)
    nbits_gref = int(grefs.max()).bit_length() if grefs.max() > 0 else 0
    ref_w = int(widths.min())
    span_w = int(widths.max()) - ref_w
    nbits_gw = span_w.bit_length() if span_w > 0 else 0
    ref_len = _GROUP_LEN
    # scaled lengths are all zero (every group is _GROUP_LEN long except
    # the last, whose true length has its own field) -> 0 bits
    nbits_gl = 0
    last_len = int(lengths[-1])

    tail = b"".join(
        [
            _u(1, 1),            # group splitting method: general
            _u(0, 1),            # missing value management: none
            _u(_MISS4, 4),       # primary missing value substitute
            _u(_MISS4, 4),       # secondary missing value substitute
            _u(ng, 4),
            _u(ref_w, 1),
            _u(nbits_gw, 1),
            _u(ref_len, 4),
            _u(1, 1),            # length increment
            _u(last_len, 4),     # true length of last group
            _u(nbits_gl, 1),
        ]
    )
    # group headers: each array padded to a byte boundary (g2clib
    # comunpack.c advances iofst to the next byte after each array)
    payload = (
        _pack_bits(grefs.astype(np.uint64), nbits_gref)
        + _pack_bits((widths - ref_w).astype(np.uint64), nbits_gw)
        # scaled group lengths: 0 bits -> nothing
    )
    chunks = []
    pos = 0
    for g in range(ng):
        ln, wd = int(lengths[g]), int(widths[g])
        chunks.append(((offsets[pos:pos + ln] - grefs[g]), wd))
        pos += ln
    payload += _pack_bits_concat(chunks)
    return nbits_gref, tail, payload


def _decode_complex_body(body: bytes, packed: bytes, n: int) -> np.ndarray:
    """Inverse of _encode_complex_body: section-5 body (template 5.2
    or 5.3 — shared octets) + section-7 group stream -> offsets."""
    # octet layout (1-based GRIB octets -> 0-based body indices):
    # 20 nbits_gref, 32-35 NG, 36 ref group width, 37 nbits widths,
    # 38-41 ref group length, 42 length increment, 43-46 true last
    # length, 47 nbits scaled lengths
    nbits_gref = body[19]
    ng = int.from_bytes(body[31:35], "big")
    ref_w = body[35]
    nbits_gw = body[36]
    ref_len = int.from_bytes(body[37:41], "big")
    len_inc = body[41]
    last_len = int.from_bytes(body[42:46], "big")
    nbits_gl = body[46]

    pos = 0
    nb = (ng * nbits_gref + 7) // 8
    grefs = _unpack_bits(packed[pos:pos + nb], ng, nbits_gref)
    pos += nb
    nb = (ng * nbits_gw + 7) // 8
    widths = _unpack_bits(packed[pos:pos + nb], ng, nbits_gw) + ref_w
    pos += nb
    nb = (ng * nbits_gl + 7) // 8
    lengths = _unpack_bits(packed[pos:pos + nb], ng, nbits_gl)
    lengths = lengths * len_inc + ref_len
    pos += nb
    lengths[-1] = last_len

    bits = np.unpackbits(np.frombuffer(packed[pos:], dtype=np.uint8))
    out = np.empty(n, dtype=np.int64)
    cursor = 0
    opos = 0
    for g in range(ng):
        ln, wd = int(lengths[g]), int(widths[g])
        if wd == 0:
            out[opos:opos + ln] = grefs[g]
        else:
            chunk = bits[cursor:cursor + ln * wd].reshape(ln, wd)
            powers = (np.int64(1) << np.arange(wd - 1, -1, -1)).astype(
                np.int64
            )
            out[opos:opos + ln] = chunk.astype(np.int64) @ powers + grefs[g]
        cursor += ln * wd
        opos += ln
    if opos != n:
        raise ValueError("grib: group lengths sum %d != npoints %d"
                         % (opos, n))
    return out


_DIFF_WW = 4  # octets per extra-descriptor field in template 7.3


def _spatial_diff(scaled: np.ndarray, order: int):
    """-> (initial values, gmin, full-length packable array) per the
    template 7.3 notes: first `order` slots zeroed, rest = d - gmin."""
    if scaled.size <= order:
        raise ValueError("grib: field too small for spatial differencing")
    d = scaled.astype(np.int64)
    for _ in range(order):
        d = np.diff(d)
    init = [int(v) for v in scaled[:order]]
    gmin = int(d.min())
    full = np.zeros(scaled.size, dtype=np.int64)
    full[order:] = d - gmin
    return init, gmin, full


def _undo_spatial_diff(vals: np.ndarray, init: list, gmin: int,
                       order: int) -> np.ndarray:
    """comunpack.c order-1/order-2 reconstruction recurrences,
    vectorized as nested prefix sums (z[j] = d[j] + 2z[j-1] - z[j-2]
    is cumsum of cumsum of the second differences)."""
    d = vals.astype(np.int64).copy()
    d[order:] += gmin
    if order == 1:
        d[0] = init[0]
        return np.cumsum(d)
    first_diffs = np.concatenate(([init[1] - init[0]], d[2:])).cumsum()
    return np.concatenate(([init[0]], first_diffs)).cumsum()


def _png_depth(span: int) -> int:
    for depth in (8, 16, 24, 32):
        if span < (1 << depth):
            return depth
    raise ValueError("grib: png packing span exceeds 32 bits")


def _encode_png_body(offsets: np.ndarray, h: int, w: int):
    """-> (depth, PNG bytes) of the scaled offsets laid out (h, w)."""
    from gdal_spark.raster.png import encode_png

    depth = _png_depth(int(offsets.max()))
    grid = offsets.reshape(h, w)
    if depth == 8:
        img = grid.astype(np.uint8)
    elif depth == 16:
        img = grid.astype(np.uint16)
    else:
        nb = depth // 8
        img = np.zeros((h, w, nb), dtype=np.uint8)
        for k in range(nb):  # big-endian bytes across channels
            img[:, :, nb - 1 - k] = (grid >> (8 * k)) & 0xFF
    return depth, encode_png(img)


def _decode_png_body(packed: bytes, h: int, w: int,
                     depth: int) -> np.ndarray:
    from gdal_spark.raster.png import decode_png

    img = decode_png(packed)
    if depth in (8, 16):
        grid = img.astype(np.int64)
    else:
        nb = depth // 8
        grid = np.zeros((h, w), dtype=np.int64)
        for k in range(nb):
            grid |= img[:, :, nb - 1 - k].astype(np.int64) << (8 * k)
    if grid.shape != (h, w):
        raise ValueError("grib: png dims %s != grid (%d, %d)"
                         % (grid.shape, h, w))
    return grid.ravel()


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


_PACKING_TEMPLATES = {"simple": 0, "complex": 2, "complex_diff": 3,
                      "png": 41, "jpeg2000": 40}


def encode_grib2(arr: np.ndarray, geo: tuple | None = None,
                 dscale: int = 0, packing: str = "simple",
                 diff_order: int = 2) -> bytes:
    """(H,W) or (H,W,B) -> GRIB2 bytes, one message per band.

    Values are decimal-scaled by 10**dscale then packed with E=0 and
    R = the scaled minimum, so integer inputs (and inputs exact at the
    given decimal scale) roundtrip bit-exactly under every packing.
    packing: "simple" (template 5.0), "complex" (5.2), "complex_diff"
    (5.3, spatial differencing of the given order 1 or 2), "png"
    (5.41), "jpeg2000" (5.40, lossless)."""
    arr = np.asarray(arr)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    if packing not in _PACKING_TEMPLATES:
        raise ValueError("grib: unknown packing %r" % packing)
    if packing == "complex_diff" and diff_order not in (1, 2):
        raise ValueError("grib: spatial differencing order must be 1 or 2")
    tmpl5 = _PACKING_TEMPLATES[packing]
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
        scan_scaled = scaled[::-1, :]
        vals = (scan_scaled - ref).ravel()

        tmpl_tail = b""
        if packing == "simple":
            packed = _pack_bits(vals, nbits)
        elif packing == "complex":
            nbits, tmpl_tail, packed = _encode_complex_body(vals)
        elif packing == "complex_diff":
            init, gmin, full = _spatial_diff(scan_scaled.ravel() - ref,
                                             diff_order)
            nbits, tail2, grouped = _encode_complex_body(full)
            tmpl_tail = tail2 + _u(diff_order, 1) + _u(_DIFF_WW, 1)
            head = b"".join(_s(v, _DIFF_WW) for v in init)
            packed = head + _s(gmin, _DIFF_WW) + grouped
        elif packing == "png":
            depth, packed = _encode_png_body(vals, h, w)
            nbits = depth
        else:  # jpeg2000 (5.40)
            from gdal_spark.raster.jp2 import encode_j2k

            if span >= (1 << 16):
                raise ValueError(
                    "grib: jpeg2000 packing span exceeds 16 bits"
                )
            depth = 8 if span < 256 else 16
            grid = vals.reshape(h, w).astype(
                np.uint8 if depth == 8 else np.uint16
            )
            packed = encode_j2k(grid, levels=2)
            nbits = depth
            tmpl_tail = _u(0, 1) + _u(255, 1)  # lossless, ratio M=255

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
        sect5_body = b"".join(
            [
                _u(5, 1),
                _u(w * h, 4),
                _u(tmpl5, 2),
                struct.pack(">f", float(ref)),
                _s(0, 2),                 # binary scale factor E
                _s(dscale, 2),            # decimal scale factor D
                _u(nbits, 1),
                _u(1, 1),                 # original data type: integer
            ]
        ) + tmpl_tail
        sect5 = _u(4 + len(sect5_body), 4) + sect5_body
        sect6 = _u(6, 4) + _u(6, 1) + _u(_MISS1, 1)
        sect7 = _u(5 + len(packed), 4) + _u(7, 1) + packed
        body = sect1 + sect2 + sect3 + sect4 + sect5 + sect6 + sect7
        total = 16 + len(body) + 4
        sect0 = b"GRIB" + _u(0, 2) + _u(0, 1) + _u(2, 1) + _u(total, 8)
        out.append(sect0 + body + b"7777")
    return b"".join(out)


def decode_grib2(data: bytes):
    """GRIB2 bytes -> ((H,W,B) array, meta dict).

    Walks every message; requires grid template 3.0 and data template
    5.0 / 5.2 / 5.3 / 5.40 / 5.41, no bitmap. Returns int64 pixels when D==0
    and the reference value is integral, float64 otherwise; meta
    carries the recovered north-up geotransform and the packing
    template of the last message."""
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
        dtmpl = 0
        sect5_body = b""
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
                dtmpl = int.from_bytes(body[9:11], "big")
                if dtmpl not in (0, 2, 3, 40, 41):
                    raise ValueError(
                        "grib: unsupported data template 5.%d (simple/"
                        "complex/complex-diff/jpeg2000/png only)" % dtmpl
                    )
                npoints = int.from_bytes(body[5:9], "big")
                ref = struct.unpack(">f", body[11:15])[0]
                es = _read_s(body, 15, 2)
                ds = _read_s(body, 17, 2)
                nbits = body[19]
                sect5_body = body
            elif snum == 6:
                if body[5] != 255:
                    raise ValueError("grib: bitmaps unsupported")
            elif snum == 7:
                packed = body[5:]
            pos += slen
        if w is None or npoints != w * h:
            raise ValueError("grib: inconsistent grid/data sizes")
        if dtmpl == 0:
            x = _unpack_bits(packed, npoints, nbits)
        elif dtmpl == 2:
            x = _decode_complex_body(sect5_body, packed, npoints)
        elif dtmpl == 3:
            order = sect5_body[47]
            ww = sect5_body[48]
            init = [_read_s(packed, k * ww, ww) for k in range(order)]
            gmin = _read_s(packed, order * ww, ww)
            grouped = packed[(order + 1) * ww:]
            x = _decode_complex_body(sect5_body, grouped, npoints)
            x = _undo_spatial_diff(x, init, gmin, order)
        elif dtmpl == 41:  # png
            x = _decode_png_body(packed, h, w, nbits)
        else:  # 40: jpeg2000
            from gdal_spark.raster.jp2 import decode_j2k

            if sect5_body[21] != 0:
                raise ValueError("grib: lossy jpeg2000 unsupported")
            img = decode_j2k(packed)
            if img.shape != (h, w):
                raise ValueError("grib: jpeg2000 dims %s != grid (%d, %d)"
                                 % (img.shape, h, w))
            x = img.astype(np.int64).ravel()
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
    meta["data_template"] = dtmpl
    return np.stack(bands, axis=2), meta
