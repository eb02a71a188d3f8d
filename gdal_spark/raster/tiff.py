"""Pure-numpy GTiff codec (classic + BigTIFF, compressed strips).

Stand-in for the reference's GTiff driver
(frmts/gtiff/gtiffdataset_read.cpp, gtiffdataset_write.cpp; the
compression kernels re-derived from the published TIFF 6.0 spec,
TIFF Technical Note 3, and the BigTIFF spec — not libtiff source):

- ``encode_tiff``/legacy helpers: the original baseline writer
  (little-endian classic, uncompressed, 8-bit) kept byte-identical —
  the COG layout rules, internal-overview splicer and
  ``edit_georef``'s in-place patch contract depend on the layout.
- ``encode_tiff_ext``/``decode_tiff``: the industrial surface —
  both byte orders, BigTIFF (version 43, 8-byte offsets), LZW
  (MSB-first early-change codes), DEFLATE (zlib), PackBits,
  new-style JPEG chunks (TechNote 2, tag 7, riding the in-repo
  T.81 codec), WEBP chunks (libtiff's registered tag 50001, riding
  the in-repo VP8L codec — lossless), horizontal predictor 2 and
  floating-point predictor 3, sample formats
  u8/i8/u16/i16/u32/i32/f32/f64, multi-strip or tiled.

Lossless -> exact pixel parity for every combination (JPEG chunks
are bounded by the JPEG codec's PSNR contract instead).
"""

from __future__ import annotations

import struct
import zlib

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
T_PREDICTOR, T_SAMPLEFORMAT = 317, 339
T_EXTRASAMPLES = 338  # 2 = unassociated alpha (the reference's
# ALPHA=YES creation default, gtiffdataset_write.cpp)
# tiled layout (TIFF 6.0 §15)
T_TILE_WIDTH, T_TILE_LENGTH, T_TILE_OFFSETS, T_TILE_COUNTS = (
    322, 323, 324, 325,
)
# compression tag values (TIFF 6.0 §7 + the deflate extension)
C_NONE, C_LZW, C_DEFLATE, C_PACKBITS = 1, 5, 8, 32773
C_DEFLATE_OLD = 32946  # the pre-standard code libtiff also accepts
# new-style JPEG (TIFF Technical Note 2) and the registered WEBP code
# (libtiff COMPRESSION_WEBP; frmts/gtiff supports both as creation
# options) — each strip/tile holds one complete standalone stream
C_JPEG, C_WEBP = 7, 50001
T_YCBCR_SUBSAMPLING = 530
# GeoTIFF georeferencing tags (frmts/gtiff/gt_wkt_srs.cpp; the
# published GeoTIFF 1.1 spec)
T_COLORMAP = 320
T_PIXEL_SCALE, T_TIEPOINT, T_GEOKEYS = 33550, 33922, 34735
_GK_MODEL_TYPE, _GK_RASTER_TYPE = 1024, 1025
_GK_GEOGRAPHIC_CS, _GK_PROJECTED_CS = 2048, 3072


def _geokey_directory(epsg: int, geographic: bool) -> list[int]:
    keys = [
        (_GK_MODEL_TYPE, 0, 1, 2 if geographic else 1),
        (_GK_RASTER_TYPE, 0, 1, 1),  # PixelIsArea
        ((_GK_GEOGRAPHIC_CS if geographic else _GK_PROJECTED_CS),
         0, 1, epsg),
    ]
    out = [1, 1, 0, len(keys)]
    for k in keys:
        out.extend(k)
    return out


def encode_tiff(arr: np.ndarray, geo: tuple | None = None,
                palette: np.ndarray | None = None) -> bytes:
    """`palette` (N,3 uint8) turns a single-band `arr` of indices
    into a palette-color TIFF (PhotometricInterpretation=3 +
    ColorMap, the reference's GDALColorTable home on GTiff)."""
    if arr.ndim == 2:
        arr = arr[:, :, None]
    if arr.dtype != np.uint8:
        raise ValueError("tiff codec: uint8 only")
    h, w, c = arr.shape
    if c not in (1, 3):
        raise ValueError(f"tiff codec: unsupported channel count {c}")
    if palette is not None and c != 1:
        raise ValueError("tiff codec: palette requires a single band")
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
    photo = 2 if c == 3 else (3 if palette is not None else 1)
    add(T_PHOTO, SHORT, 1, photo, 4)
    if palette is not None:
        # ColorMap: 3 * 2^bps SHORTs (red plane, green, blue),
        # 8-bit component v scales to v*257 (the libtiff convention)
        pal = np.zeros((256, 3), dtype=np.uint16)
        pal[: len(palette)] = np.asarray(palette, dtype=np.uint16) * 257
        cmap_off = extra_off + len(extra)
        extra.extend(pal.T.astype("<u2").tobytes())
        add(T_COLORMAP, SHORT, 768, cmap_off, None)
    add(T_STRIP_OFFSETS, LONG, 1, data_off, 4)
    add(T_SPP, SHORT, 1, c, 4)
    add(T_ROWS_PER_STRIP, LONG, 1, h, 4)
    add(T_STRIP_COUNTS, LONG, 1, len(pixel_data), 4)
    add(T_PLANAR, SHORT, 1, 1, 4)
    if geo is not None:
        # geo = (gdal 6-term geotransform, epsg registry code); only
        # north-up transforms map onto PixelScale+Tiepoint (rotation
        # needs ModelTransformationTag — out of codec scope, loud)
        gt, epsg = geo
        if gt[2] != 0.0 or gt[4] != 0.0:
            raise ValueError("tiff codec: rotated geotransforms "
                             "unsupported (no ModelTransformationTag)")
        DOUBLE = 12
        off = extra_off + len(extra)
        extra.extend(struct.pack("<3d", gt[1], -gt[5], 0.0))
        add(T_PIXEL_SCALE, DOUBLE, 3, off, None)
        off = extra_off + len(extra)
        extra.extend(struct.pack("<6d", 0.0, 0.0, 0.0, gt[0], gt[3], 0.0))
        add(T_TIEPOINT, DOUBLE, 6, off, None)
        geographic = 4000 <= int(epsg) <= 4999
        gk = _geokey_directory(int(epsg), geographic)
        off = extra_off + len(extra)
        extra.extend(struct.pack(f"<{len(gk)}H", *gk))
        add(T_GEOKEYS, SHORT, len(gk), off, None)

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


# ---------------------------------------------------------------------------
# industrial surface: general parser, compression kernels, predictors
# ---------------------------------------------------------------------------

# field type -> (byte size, struct format char); subset used by the
# general reader (TIFF 6.0 §2 + BigTIFF LONG8/SLONG8/IFD8)
_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 6: 1, 8: 2, 9: 4, 12: 8,
              16: 8, 17: 8, 18: 8}
_TYPE_FMT = {1: "B", 3: "H", 4: "I", 6: "b", 8: "h", 9: "i", 12: "d",
             16: "Q", 17: "q", 18: "Q"}


def _parse_header(data: bytes):
    """-> (endian char, bigtiff?, first IFD offset)."""
    if data[:2] == b"II":
        en = "<"
    elif data[:2] == b"MM":
        en = ">"
    else:
        raise ValueError("tiff codec: not a TIFF stream")
    (ver,) = struct.unpack_from(en + "H", data, 2)
    if ver == 42:
        (ifd,) = struct.unpack_from(en + "I", data, 4)
        return en, False, ifd
    if ver == 43:
        osize, zero = struct.unpack_from(en + "HH", data, 4)
        if osize != 8 or zero != 0:
            raise ValueError("tiff codec: malformed BigTIFF header")
        (ifd,) = struct.unpack_from(en + "Q", data, 8)
        return en, True, ifd
    raise ValueError(f"tiff codec: unknown TIFF version {ver}")


def _read_ifd(data: bytes, en: str, big: bool, ifd_off: int):
    """-> (tags {id: [values]}, next IFD offset).  Unknown field
    types are skipped (foreign files carry RATIONALs etc.)."""
    if big:
        (n,) = struct.unpack_from(en + "Q", data, ifd_off)
        base0, esize, vsize = ifd_off + 8, 20, 8
    else:
        (n,) = struct.unpack_from(en + "H", data, ifd_off)
        base0, esize, vsize = ifd_off + 2, 12, 4
    tags: dict[int, list] = {}
    for k in range(n):
        base = base0 + esize * k
        if big:
            tag, typ, count = struct.unpack_from(en + "HHQ", data, base)
            vpos = base + 12
        else:
            tag, typ, count = struct.unpack_from(en + "HHI", data, base)
            vpos = base + 8
        if typ not in _TYPE_FMT:
            continue
        nbytes = _TYPE_SIZE[typ] * count
        if nbytes <= vsize:
            off = vpos
        else:
            (off,) = struct.unpack_from(en + ("Q" if big else "I"),
                                        data, vpos)
        tags[tag] = list(
            struct.unpack_from(f"{en}{count}{_TYPE_FMT[typ]}", data, off))
    next_pos = base0 + esize * n
    (nxt,) = struct.unpack_from(en + ("Q" if big else "I"), data, next_pos)
    return tags, nxt


_LZW_CLEAR, _LZW_EOI = 256, 257


def _lzw_encode(data: bytes) -> bytes:
    """TIFF 6.0 §13 LZW: MSB-first bit packing, ClearCode=256,
    EOI=257, EARLY code-width change (width grows when the next code
    to assign reaches 2**width - 1), table flush at 4094."""
    out = bytearray()
    bitbuf = nbits = 0
    width = 9

    def emit(code):
        nonlocal bitbuf, nbits
        bitbuf = (bitbuf << width) | code
        nbits += width
        while nbits >= 8:
            out.append((bitbuf >> (nbits - 8)) & 0xFF)
            nbits -= 8
            bitbuf &= (1 << nbits) - 1

    table: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    next_code = 258
    emit(_LZW_CLEAR)
    w = b""
    for ch in data:
        wc = w + bytes([ch])
        if wc in table:
            w = wc
            continue
        emit(table[w])
        table[wc] = next_code
        next_code += 1
        w = bytes([ch])
        if next_code >= 4094:
            emit(_LZW_CLEAR)
            table = {bytes([i]): i for i in range(256)}
            next_code = 258
            width = 9
        elif next_code == (1 << width) - 1:
            width += 1
    if w:
        emit(table[w])
    emit(_LZW_EOI)
    if nbits:
        out.append((bitbuf << (8 - nbits)) & 0xFF)
    return bytes(out)


def _lzw_decode(data: bytes, expected: int | None = None) -> bytes:
    """The decoder lags the encoder by exactly one table add, so its
    read width comes from the RECONSTRUCTED encoder state
    (next_code + 1) — TIFF 6.0 §13's 'the decoder switches bit
    lengths one code earlier'.  `expected` stops cleanly at the
    strip's decoded size (the EOI following the final data code can
    straddle a width boundary)."""
    out = bytearray()
    pos, total = 0, len(data) * 8
    table: dict[int, bytes] = {}
    next_code = 258
    prev: bytes | None = None
    while expected is None or len(out) < expected:
        enc_nc = next_code + (1 if prev is not None else 0)
        width = (9 + (enc_nc >= 511) + (enc_nc >= 1023)
                 + (enc_nc >= 2047))
        if pos + width > total:
            break
        b0 = pos >> 3
        chunk = int.from_bytes(data[b0:b0 + 3].ljust(3, b"\0"), "big")
        code = (chunk >> (24 - (pos & 7) - width)) & ((1 << width) - 1)
        pos += width
        if code == _LZW_EOI:
            break
        if code == _LZW_CLEAR:
            table = {i: bytes([i]) for i in range(256)}
            next_code, prev = 258, None
            continue
        if prev is None:
            if code > 255:
                raise ValueError("tiff lzw: stream must start with Clear"
                                 " + literal")
            entry = table[code]
        elif code in table:
            entry = table[code]
            table[next_code] = prev + entry[:1]
            next_code += 1
        elif code == next_code:
            entry = prev + prev[:1]
            table[next_code] = entry
            next_code += 1
        else:
            raise ValueError("tiff lzw: corrupt code stream")
        out += entry
        prev = entry
    return bytes(out)


def _packbits_encode(data: bytes) -> bytes:
    """PackBits (TIFF 6.0 §9): replicate runs >= 3 as (257-n, byte),
    literals in <=128 chunks."""
    out = bytearray()
    i, n = 0, len(data)
    lit_start = 0

    def flush_literals(end):
        j = lit_start
        while j < end:
            k = min(128, end - j)
            out.append(k - 1)
            out.extend(data[j:j + k])
            j += k

    while i < n:
        run = 1
        while i + run < n and run < 128 and data[i + run] == data[i]:
            run += 1
        if run >= 3:
            flush_literals(i)
            out.append(257 - run)
            out.append(data[i])
            i += run
            lit_start = i
        else:
            i += run
    flush_literals(n)
    return bytes(out)


def _packbits_decode(data: bytes) -> bytes:
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        b = data[i]
        i += 1
        if b < 128:
            out += data[i:i + b + 1]
            i += b + 1
        elif b > 128:
            out += bytes([data[i]]) * (257 - b)
            i += 1
        # 128 is a no-op per spec
    return bytes(out)


def _compress(raw: bytes, compression: int) -> bytes:
    if compression == C_NONE:
        return raw
    if compression == C_LZW:
        return _lzw_encode(raw)
    if compression in (C_DEFLATE, C_DEFLATE_OLD):
        return zlib.compress(raw, 6)
    if compression == C_PACKBITS:
        return _packbits_encode(raw)
    raise ValueError(f"tiff codec: unsupported compression {compression}")


def _decompress(blob: bytes, compression: int,
                expected: int | None = None) -> bytes:
    if compression == C_NONE:
        return blob
    if compression == C_LZW:
        return _lzw_decode(blob, expected)
    if compression in (C_DEFLATE, C_DEFLATE_OLD):
        return zlib.decompress(blob)
    if compression == C_PACKBITS:
        return _packbits_decode(blob)
    raise ValueError(f"tiff codec: unsupported compression {compression}")


def _predict2_encode(vals: np.ndarray, spp: int) -> np.ndarray:
    """Horizontal differencing (TIFF 6.0 §14) on a (rows, w*spp)
    block of integer samples: per row, per channel, modular delta
    against the previous pixel."""
    u = vals.view(np.dtype(f"u{vals.dtype.itemsize}"))
    d = u.copy()
    d[:, spp:] = u[:, spp:] - u[:, :-spp]
    return d.view(vals.dtype)


def _predict2_decode(vals: np.ndarray, spp: int) -> np.ndarray:
    u = vals.view(np.dtype(f"u{vals.dtype.itemsize}"))
    out = np.empty_like(u)
    for k in range(spp):
        np.cumsum(u[:, k::spp], axis=1, dtype=u.dtype,
                  out=out[:, k::spp])
    return out.view(vals.dtype)


def _predict3_encode(vals: np.ndarray, spp: int) -> bytes:
    """Floating-point predictor (TIFF Technical Note 3): per row,
    split values into big-endian byte planes (all MSBs first), then
    byte-wise horizontal differencing with stride = samples/pixel."""
    bpp = vals.dtype.itemsize
    be = vals.astype(f">f{bpp}")
    rows, n = be.shape
    # (rows, n, bpp) bytes -> plane-major (rows, bpp, n) -> flat rows
    b = be.view(np.uint8).reshape(rows, n, bpp)
    planes = np.ascontiguousarray(b.transpose(0, 2, 1)).reshape(rows, -1)
    d = planes.copy()
    d[:, spp:] = planes[:, spp:] - planes[:, :-spp]
    return d.tobytes()


def _predict3_decode(raw: bytes, rows: int, n: int, bpp: int,
                     spp: int) -> np.ndarray:
    d = np.frombuffer(raw, dtype=np.uint8).reshape(rows, bpp * n)
    planes = np.empty_like(d)
    for k in range(spp):
        np.cumsum(d[:, k::spp], axis=1, dtype=np.uint8,
                  out=planes[:, k::spp])
    b = planes.reshape(rows, bpp, n).transpose(0, 2, 1)
    return np.ascontiguousarray(b).reshape(rows, n * bpp).view(
        f">f{bpp}").reshape(rows, n)


_SF_UNSIGNED, _SF_SIGNED, _SF_FLOAT = 1, 2, 3
_KIND_SF = {"u": _SF_UNSIGNED, "i": _SF_SIGNED, "f": _SF_FLOAT}
_SF_KIND = {v: k for k, v in _KIND_SF.items()}
_COMP_NAME = {"none": C_NONE, "lzw": C_LZW, "deflate": C_DEFLATE,
              "packbits": C_PACKBITS, "jpeg": C_JPEG, "webp": C_WEBP}


def encode_tiff_ext(arr: np.ndarray, compression: str = "none",
                    predictor: int = 1, bigtiff: bool = False,
                    big_endian: bool = False,
                    rows_per_strip: int | None = None,
                    tile: tuple[int, int] | None = None,
                    quality: int = 90,
                    subsampling: str = "444") -> bytes:
    """Industrial GTiff writer (gtiffdataset_write.cpp surface;
    kernels from the TIFF 6.0 spec + TechNote 3 + the BigTIFF spec):
    both byte orders, classic or BigTIFF,
    none/lzw/deflate/packbits/jpeg/webp, predictor 1/2 (integer) /
    3 (float), any of u8/i8/u16/i16/u32/i32/f32/f64, 1 or 3 chunky
    samples, multi-strip or tiled (`tile=(tw, th)`, multiples of 16
    per §15; edge tiles padded to full size by edge replication —
    lossy codecs ring on hard pad edges — row-major tile order).
    Codec chunks (TechNote 2 new-style JPEG, tag 7; libtiff's
    registered WEBP, tag 50001) each hold one complete standalone
    stream: JPEG is uint8 1/3-band (PhotometricInterpretation 6 +
    YCbCrSubSampling 1,1 for color — the stream itself carries the
    color transform, like libtiff's JPEGCOLORMODE_RGB path), WEBP is
    uint8 3-band VP8L lossless.  Lossless compressions (and webp):
    decode_tiff returns the exact array; jpeg is bounded by the
    codec's PSNR contract."""
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, c = arr.shape
    if c not in (1, 3, 4):
        raise ValueError(f"tiff codec: unsupported channel count {c}")
    kind, bpp = arr.dtype.kind, arr.dtype.itemsize
    if kind not in _KIND_SF or bpp not in (1, 2, 4, 8) or (
            kind == "f" and bpp < 4):
        raise ValueError(f"tiff codec: unsupported dtype {arr.dtype}")
    comp = _COMP_NAME[compression]
    codec_chunks = comp in (C_JPEG, C_WEBP)
    if codec_chunks:
        if arr.dtype != np.uint8:
            raise ValueError(
                f"tiff codec: {compression} compression is uint8-only")
        if predictor != 1:
            raise ValueError(
                f"tiff codec: {compression} takes no predictor")
        if comp == C_WEBP and c not in (3, 4):
            raise ValueError(
                "tiff codec: webp compression needs 3 or 4 samples")
        if comp == C_JPEG and c == 4:
            raise ValueError("tiff codec: jpeg chunks carry no alpha")
    if predictor == 2 and kind == "f":
        raise ValueError("tiff codec: predictor 2 is integer-only")
    if predictor == 3 and kind != "f":
        raise ValueError("tiff codec: predictor 3 is float-only")
    en = ">" if big_endian else "<"
    rps = h if rows_per_strip is None else max(1, int(rows_per_strip))
    file_dtype = np.dtype(f"{kind}{bpp}").newbyteorder(en)

    def chunk_payload(block):
        # block: (rows, cols, c) native-order sub-image
        if comp == C_JPEG:
            from gdal_spark.raster.jpeg import encode_jpeg
            return (encode_jpeg(block[:, :, 0], quality, gray=True)
                    if c == 1
                    else encode_jpeg(block, quality,
                                     subsampling=subsampling))
        if comp == C_WEBP:
            from gdal_spark.raster.webp import encode_webp_lossless
            return encode_webp_lossless(block)  # 3- or 4-channel
        rows = block.shape[0]
        flat = np.ascontiguousarray(block).reshape(rows, -1)
        if predictor == 2:
            raw = _predict2_encode(flat, c).astype(file_dtype).tobytes()
        elif predictor == 3:
            raw = _predict3_encode(flat, c)
        else:
            raw = flat.astype(file_dtype).tobytes()
        return _compress(raw, comp)

    strips = []
    if tile is not None:
        tw, th = tile
        if tw % 16 or th % 16 or tw <= 0 or th <= 0:
            raise ValueError("tiff codec: tile dims must be positive "
                             "multiples of 16 (TIFF 6.0 §15)")
        for ty0 in range(0, h, th):
            for tx0 in range(0, w, tw):
                sub = arr[ty0:ty0 + th, tx0:tx0 + tw]
                pad = np.pad(
                    sub,
                    ((0, th - sub.shape[0]), (0, tw - sub.shape[1]),
                     (0, 0)),
                    mode="edge")
                strips.append(chunk_payload(pad))
    else:
        for r0 in range(0, h, rps):
            strips.append(chunk_payload(
                np.ascontiguousarray(arr[r0:r0 + rps])))

    hdr_len = 16 if bigtiff else 8
    offs, pos = [], hdr_len
    for s in strips:
        offs.append(pos)
        pos += len(s)
    extra_off = pos

    SHORT, LONG, LONG8 = 3, 4, 16
    off_typ = LONG8 if bigtiff else LONG
    photo = 2 if c >= 3 else 1
    if comp == C_JPEG and c == 3:
        photo = 6  # the stream carries the YCbCr transform
    entries = [
        (T_WIDTH, LONG, [w]),
        (T_HEIGHT, LONG, [h]),
        (T_BPS, SHORT, [bpp * 8] * c),
        (T_COMPRESSION, SHORT, [comp]),
        (T_PHOTO, SHORT, [photo]),
        (T_SPP, SHORT, [c]),
        (T_PLANAR, SHORT, [1]),
    ]
    if photo == 6:
        sub = 2 if subsampling == "420" else 1
        entries.append((T_YCBCR_SUBSAMPLING, SHORT, [sub, sub]))
    if c == 4:
        entries.append((T_EXTRASAMPLES, SHORT, [2]))  # unassoc alpha
    if tile is not None:
        entries += [
            (T_TILE_WIDTH, LONG, [tile[0]]),
            (T_TILE_LENGTH, LONG, [tile[1]]),
            (T_TILE_OFFSETS, off_typ, offs),
            (T_TILE_COUNTS, LONG, [len(s) for s in strips]),
        ]
    else:
        entries += [
            (T_STRIP_OFFSETS, off_typ, offs),
            (T_ROWS_PER_STRIP, LONG, [rps]),
            (T_STRIP_COUNTS, LONG, [len(s) for s in strips]),
        ]
    if predictor != 1:
        entries.append((T_PREDICTOR, SHORT, [predictor]))
    if kind != "u":
        entries.append((T_SAMPLEFORMAT, SHORT, [_KIND_SF[kind]] * c))
    entries.sort()

    vsize = 8 if bigtiff else 4
    cfmt = "Q" if bigtiff else "I"
    extra = bytearray()
    ifd = bytearray()
    ifd += struct.pack(en + ("Q" if bigtiff else "H"), len(entries))
    for tag, typ, values in entries:
        payload = struct.pack(
            f"{en}{len(values)}{_TYPE_FMT[typ]}", *values)
        if len(payload) <= vsize:
            vf = payload.ljust(vsize, b"\0")
        else:
            if len(extra) % 2:
                extra += b"\0"
            vf = struct.pack(en + cfmt, extra_off + len(extra))
            extra += payload
        ifd += struct.pack(en + "HH" + cfmt, tag, typ, len(values)) + vf
    ifd += struct.pack(en + cfmt, 0)  # next IFD

    ifd_off = extra_off + len(extra)
    out = bytearray(b"II" if en == "<" else b"MM")
    if bigtiff:
        out += struct.pack(en + "HHHQ", 43, 8, 0, ifd_off)
    else:
        out += struct.pack(en + "HI", 42, ifd_off)
    for s in strips:
        out += s
    out += extra
    out += ifd
    return bytes(out)


def decode_tiff(data: bytes) -> np.ndarray:
    """General strip-TIFF reader (gtiffdataset_read.cpp surface):
    both byte orders, classic + BigTIFF, none/lzw/deflate/packbits,
    predictors 1/2/3, u8..f64 chunky samples.  Single-band palette
    files expand through the ColorMap (the legacy contract);
    single-band output is 2-D, multi-band (h, w, c)."""
    en, big, ifd_off = _parse_header(data)
    tags, _ = _read_ifd(data, en, big, ifd_off)
    w, h = int(tags[T_WIDTH][0]), int(tags[T_HEIGHT][0])
    c = int(tags.get(T_SPP, [1])[0])
    bps = tags.get(T_BPS, [8])
    if len(set(bps)) != 1 or bps[0] % 8:
        raise ValueError(f"tiff codec: unsupported BitsPerSample {bps}")
    bpp = bps[0] // 8
    comp = int(tags.get(T_COMPRESSION, [C_NONE])[0])
    pred = int(tags.get(T_PREDICTOR, [1])[0])
    sf = int(tags.get(T_SAMPLEFORMAT, [_SF_UNSIGNED])[0])
    if tags.get(T_PLANAR, [1])[0] != 1:
        raise ValueError("tiff codec: only chunky planar config supported")
    if sf not in _SF_KIND:
        raise ValueError(f"tiff codec: unsupported SampleFormat {sf}")
    kind = _SF_KIND[sf]
    if kind == "f" and pred == 2:
        raise ValueError("tiff codec: predictor 2 on float samples")
    if pred == 3 and kind != "f":
        raise ValueError("tiff codec: predictor 3 needs floats")
    dt = np.dtype(f"{kind}{bpp}").newbyteorder(en)

    def decode_chunk(blob, rows, row_samples):
        if comp in (C_JPEG, C_WEBP):
            cols = row_samples // c
            if comp == C_JPEG:
                from gdal_spark.raster.jpeg import decode_jpeg
                img = decode_jpeg(blob)
            else:
                from gdal_spark.raster.webp import decode_webp
                img = decode_webp(blob)[:, :, :c]
            if img.ndim == 2:
                img = img[:, :, None]
            if img.shape[0] < rows or img.shape[1] < cols or (
                    img.shape[2] != c):
                raise ValueError(
                    "tiff codec: codec chunk dims do not match layout")
            return img[:rows, :cols].reshape(rows, row_samples)
        raw = _decompress(blob, comp, rows * row_samples * bpp)
        if len(raw) < rows * row_samples * bpp:
            raise ValueError("tiff codec: short strip/tile")
        raw = raw[:rows * row_samples * bpp]
        if pred == 3:
            return _predict3_decode(
                raw, rows, row_samples, bpp, c).astype(f"f{bpp}")
        # native order BEFORE un-differencing: predictor 2 is
        # defined on sample VALUES, not file bytes
        vals = np.frombuffer(raw, dtype=dt).reshape(
            rows, row_samples).astype(dt.newbyteorder("="))
        return _predict2_decode(vals, c) if pred == 2 else vals

    if T_TILE_WIDTH in tags:
        tw = int(tags[T_TILE_WIDTH][0])
        th = int(tags[T_TILE_LENGTH][0])
        offsets, counts = tags[T_TILE_OFFSETS], tags[T_TILE_COUNTS]
        across = -(-w // tw)
        down = -(-h // th)
        arr = np.empty((down * th, across * tw, c),
                       dtype=np.dtype(f"{kind}{bpp}"))
        for ti, (o, n) in enumerate(zip(offsets, counts)):
            tyl = (ti // across) * th
            txl = (ti % across) * tw
            arr[tyl:tyl + th, txl:txl + tw] = decode_chunk(
                data[int(o):int(o) + int(n)], th, tw * c
            ).reshape(th, tw, c)
        arr = arr[:h, :w]
    else:
        rps = int(tags.get(T_ROWS_PER_STRIP, [h])[0])
        offsets, counts = tags[T_STRIP_OFFSETS], tags[T_STRIP_COUNTS]
        row_bytes = w * c * bpp
        parts = []
        for si, (o, n) in enumerate(zip(offsets, counts)):
            rows = min(rps, h - si * rps)
            parts.append(decode_chunk(data[int(o):int(o) + int(n)],
                                      rows, w * c))
        arr = np.concatenate(parts, axis=0).reshape(h, w, c)
    if (c == 1 and bpp == 1 and kind == "u"
            and tags.get(T_PHOTO, [1])[0] == 3 and T_COLORMAP in tags):
        # palette-color: expand through the ColorMap like the
        # reference's -expand rgb path (decode_tiff_paletted keeps
        # the band + table view)
        cmap = np.asarray(tags[T_COLORMAP], dtype=np.uint16).reshape(3, 256)
        return (cmap.T[arr[:, :, 0]] // 257).astype(np.uint8)
    return arr[:, :, 0] if c == 1 else arr


def decode_tiff_paletted(data: bytes):
    """Palette-color TIFF -> (indices (H,W), palette (256,3) uint8)."""
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
    if tags.get(T_PHOTO, [1])[0] != 3 or T_COLORMAP not in tags:
        raise ValueError("tiff codec: not a palette-color TIFF")
    w, h = tags[T_WIDTH][0], tags[T_HEIGHT][0]
    buf = b"".join(
        data[o : o + n]
        for o, n in zip(tags[T_STRIP_OFFSETS], tags[T_STRIP_COUNTS])
    )
    idx = np.frombuffer(buf, dtype=np.uint8).reshape(h, w).copy()
    cmap = np.asarray(tags[T_COLORMAP], dtype=np.uint16).reshape(3, 256)
    return idx, (cmap.T // 257).astype(np.uint8)


def read_georef(data: bytes) -> tuple[tuple, int] | None:
    """(gdal 6-term geotransform, epsg) from the GeoTIFF tags, or
    None for a plain TIFF.  Mirrors the reference's tiepoint+scale
    path (frmts/gtiff/gtiffdataset_read.cpp LoadGeoreferencingAndPamIfNeeded;
    gt_wkt_srs.cpp GTIFGetEPSGFromGeoKeys)."""
    if data[:4] != _II:
        raise ValueError("tiff codec: not little-endian classic TIFF")
    (ifd_off,) = struct.unpack_from("<I", data, 4)
    (n_entries,) = struct.unpack_from("<H", data, ifd_off)
    scale = tie = geokeys = None
    for k in range(n_entries):
        base = ifd_off + 2 + 12 * k
        tag, typ, count = struct.unpack_from("<HHI", data, base)
        vf = data[base + 8:base + 12]
        if tag in (T_PIXEL_SCALE, T_TIEPOINT) and typ == 12:
            (off,) = struct.unpack("<I", vf)
            vals = struct.unpack_from(f"<{count}d", data, off)
            if tag == T_PIXEL_SCALE:
                scale = vals
            else:
                tie = vals
        elif tag == T_GEOKEYS and typ == 3:
            geokeys = _read_values(data, typ, count, vf)
    if scale is None or tie is None:
        return None
    # tiepoint (i, j, k, X, Y, Z): raster (i, j) pins model (X, Y)
    gt = (
        tie[3] - tie[0] * scale[0],
        scale[0],
        0.0,
        tie[4] + tie[1] * scale[1],
        0.0,
        -scale[1],
    )
    epsg = 0
    if geokeys is not None:
        n_keys = geokeys[3]
        for i in range(n_keys):
            kid, loc, cnt, val = geokeys[4 + 4 * i:8 + 4 * i]
            if kid in (_GK_GEOGRAPHIC_CS, _GK_PROJECTED_CS) and loc == 0:
                epsg = val
    return gt, epsg


def encode_tiff_levels(levels: list[np.ndarray],
                       geo: tuple | None = None) -> bytes:
    """Classic-TIFF internal overviews (the gdaladdo layout,
    apps/gdaladdo.cpp + frmts/gtiff: full-res IFD0 followed by
    chained reduced-resolution IFDs flagged NewSubfileType=1).
    Each level is a strip image like encode_tiff; geo tags stamp
    IFD0 only.  levels[0] = full resolution, then coarser."""
    T_NEWSUBFILE = 254
    blobs = []
    for lvl, arr in enumerate(levels):
        one = encode_tiff(arr, geo=geo if lvl == 0 else None)
        blobs.append(one)
    # splice: rebase each single-IFD file after the previous bytes and
    # chain the next-IFD pointers.  Every absolute offset in a
    # single-IFD blob (strip offset, external values, IFD position)
    # shifts by the same delta, so rebasing = add delta to every
    # LONG offset field + the header IFD pointer.
    out = bytearray()
    ifd_offsets = []
    for lvl, blob in enumerate(blobs):
        if lvl == 0:
            out += blob
            (ifd0,) = struct.unpack_from("<I", blob, 4)
            ifd_offsets.append(ifd0)
            continue
        # drop the sub-blob's 8-byte header and shift every absolute
        # offset (strip data, external values) by the same delta
        delta = len(out) - 8
        reb = bytearray(blob)
        (ifd,) = struct.unpack_from("<I", reb, 4)
        (n,) = struct.unpack_from("<H", reb, ifd)
        for k in range(n):
            e = ifd + 2 + 12 * k
            tag, typ, count = struct.unpack_from("<HHI", reb, e)
            size = {1: 1, 2: 1, 3: 2, 4: 4, 12: 8}[typ] * count
            if size > 4 or tag == T_STRIP_OFFSETS:
                (v,) = struct.unpack_from("<I", reb, e + 8)
                struct.pack_into("<I", reb, e + 8, v + delta)
        ifd_offsets.append(ifd + delta)
        out += reb[8:]
    # chain the IFDs (readers identify overviews by IFD order,
    # matching decode_tiff_levels; decode_tiff keeps seeing IFD0)
    for lvl, off in enumerate(ifd_offsets):
        (n,) = struct.unpack_from("<H", out, off)
        next_pos = off + 2 + 12 * n
        nxt = ifd_offsets[lvl + 1] if lvl + 1 < len(ifd_offsets) else 0
        struct.pack_into("<I", out, next_pos, nxt)
    return bytes(out)


def decode_tiff_levels(data: bytes) -> list[np.ndarray]:
    """All chained IFDs of a classic TIFF as arrays (IFD order:
    full resolution first, then overviews)."""
    if data[:4] != _II:
        raise ValueError("tiff codec: not little-endian classic TIFF")
    (ifd_off,) = struct.unpack_from("<I", data, 4)
    out = []
    while ifd_off:
        (n_entries,) = struct.unpack_from("<H", data, ifd_off)
        tags: dict[int, list[int]] = {}
        for k in range(n_entries):
            base = ifd_off + 2 + 12 * k
            tag, typ, count = struct.unpack_from("<HHI", data, base)
            if typ in (3, 4):
                tags[tag] = _read_values(
                    data, typ, count, data[base + 8:base + 12])
        w, h = tags[T_WIDTH][0], tags[T_HEIGHT][0]
        c = tags.get(T_SPP, [1])[0]
        buf = b"".join(
            data[o:o + n]
            for o, n in zip(tags[T_STRIP_OFFSETS], tags[T_STRIP_COUNTS])
        )
        arr = np.frombuffer(buf, dtype=np.uint8).reshape(h, w, c)
        out.append(arr[:, :, 0] if c == 1 else arr.copy())
        (ifd_off,) = struct.unpack_from(
            "<I", data, ifd_off + 2 + 12 * n_entries)
    return out


def edit_georef(data: bytes, geotransform: tuple | None = None,
                epsg: int | None = None) -> bytes:
    """gdal_edit.py / gdalmove.py dual: patch ModelPixelScale,
    ModelTiepoint and the GeoKey CS code IN PLACE — a header-only
    edit that leaves every pixel byte untouched, like the reference
    utility's SetGeoTransform/SetProjection on an existing GTiff
    (swig/python/gdal-utils/osgeo_utils/gdal_edit.py).  The tags must
    already exist: ADDING them would relocate the IFD, which the
    in-place contract refuses loudly."""
    if data[:4] != _II:
        raise ValueError("tiff codec: not little-endian classic TIFF")
    if geotransform is not None and (
        geotransform[2] != 0.0 or geotransform[4] != 0.0
        or geotransform[5] >= 0.0
    ):
        raise ValueError("edit_georef: north-up unrotated only")
    buf = bytearray(data)
    (ifd_off,) = struct.unpack_from("<I", buf, 4)
    (n_entries,) = struct.unpack_from("<H", buf, ifd_off)
    did_scale = did_tie = did_epsg = False
    for k in range(n_entries):
        base = ifd_off + 2 + 12 * k
        tag, typ, count = struct.unpack_from("<HHI", buf, base)
        if geotransform is not None and tag == T_PIXEL_SCALE and typ == 12:
            (off,) = struct.unpack_from("<I", buf, base + 8)
            struct.pack_into("<3d", buf, off, geotransform[1],
                             -geotransform[5], 0.0)
            did_scale = True
        elif geotransform is not None and tag == T_TIEPOINT and typ == 12:
            (off,) = struct.unpack_from("<I", buf, base + 8)
            struct.pack_into("<6d", buf, off, 0.0, 0.0, 0.0,
                             geotransform[0], geotransform[3], 0.0)
            did_tie = True
        elif epsg is not None and tag == T_GEOKEYS and typ == 3:
            inline = 2 * count <= 4
            if inline:
                voff = base + 8
            else:
                (voff,) = struct.unpack_from("<I", buf, base + 8)
            keys = list(struct.unpack_from(f"<{count}H", buf, voff))
            for i in range(keys[3]):
                kid, loc = keys[4 + 4 * i], keys[5 + 4 * i]
                if kid in (_GK_GEOGRAPHIC_CS, _GK_PROJECTED_CS) and loc == 0:
                    struct.pack_into("<H", buf, voff + 2 * (7 + 4 * i),
                                     epsg)
                    did_epsg = True
    if geotransform is not None and not (did_scale and did_tie):
        raise ValueError("edit_georef: no ModelPixelScale/Tiepoint "
                         "tags to patch (dataset not georeferenced)")
    if epsg is not None and not did_epsg:
        raise ValueError("edit_georef: no CS GeoKey to patch")
    return bytes(buf)
