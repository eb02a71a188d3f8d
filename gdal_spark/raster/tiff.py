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
    if c == 1 and tags.get(T_PHOTO, [1])[0] == 3 and T_COLORMAP in tags:
        # palette-color: expand through the ColorMap like the
        # reference's -expand rgb path (decode_tiff_paletted keeps
        # the band + table view)
        cmap = np.asarray(tags[T_COLORMAP], dtype=np.uint16).reshape(3, 256)
        return (cmap.T[arr[:, :, 0]] // 257).astype(np.uint8)
    return arr[:, :, 0] if c == 1 else arr.copy()


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
