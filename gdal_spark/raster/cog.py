"""Cloud-Optimized GeoTIFF byte layout (pure numpy/struct).

Re-derives the COG writer's FILE STRUCTURE (frmts/gtiff/cogdriver.cpp
:639-1261): one little-endian TIFF whose IFDs (full resolution first,
then each overview level flagged NewSubfileType=ReducedImage) are all
written BEFORE any pixel data — the cloud-optimized property: a
reader learns the complete layout from one header-range request —
followed by the tile payloads, full-res tiles last (overviews first
mirrors the reference's leader layout so small zoomed-out reads stay
in the file head). Pixels are stored as 256x256 interleaved RGB
tiles (TileWidth/TileLength/TileOffsets/TileByteCounts), edge tiles
padded to full size (edge replication) per the TIFF6 spec.

Compression mirrors the reference's COG creation options
(cogdriver.cpp COMPRESS=): none, LZW, DEFLATE (exact roundtrips),
WEBP (VP8L lossless chunks, exact), JPEG (TechNote-2 chunks, bounded
by the JPEG codec's PSNR contract) — each tile one payload through
the same kernels as raster/tiff.py.

decode_cog reads the structure back (all IFDs), which is how the
oracle closes the loop: encode -> decode -> per-level checksums must
match the closed-form pixel formulas.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

TILE = 256

_T_WIDTH = 256
_T_HEIGHT = 257
_T_BPS = 258
_T_COMPRESSION = 259
_T_PHOTO = 262
_T_SPP = 277
_T_PLANAR = 284
_T_NEWSUBFILE = 254
_T_TILE_W = 322
_T_TILE_H = 323
_T_TILE_OFFSETS = 324
_T_TILE_COUNTS = 325

_SHORT = 3
_LONG = 4
_DOUBLE = 12

# GeoTIFF tags on IFD0 (shared semantics with raster/tiff.py)
_T_PIXEL_SCALE, _T_TIEPOINT, _T_GEOKEYS = 33550, 33922, 34735


# COG creation-option compression codes (shared with raster/tiff.py)
_COG_COMP = {"none": 1, "lzw": 5, "jpeg": 7, "deflate": 8,
             "webp": 50001}
_T_YCBCR_SUB = 530


def _encode_tile(tile: np.ndarray, comp: str, quality: int) -> bytes:
    if comp == "none":
        return tile.tobytes()
    if comp == "deflate":
        return zlib.compress(tile.tobytes())
    if comp == "lzw":
        from gdal_spark.raster.tiff import _lzw_encode
        return _lzw_encode(tile.tobytes())
    if comp == "webp":
        from gdal_spark.raster.webp import encode_webp_lossless
        return encode_webp_lossless(tile)
    if comp == "jpeg":
        from gdal_spark.raster.jpeg import encode_jpeg
        return encode_jpeg(tile, quality)
    raise ValueError(f"cog: unsupported compression {comp!r}")


def _decode_tile(blob: bytes, comp_code: int) -> np.ndarray:
    if comp_code == 1:
        return np.frombuffer(blob, np.uint8).reshape(TILE, TILE, 3)
    if comp_code == 8:
        return np.frombuffer(zlib.decompress(blob), np.uint8).reshape(
            TILE, TILE, 3)
    if comp_code == 5:
        from gdal_spark.raster.tiff import _lzw_decode
        return np.frombuffer(
            _lzw_decode(blob, expected=TILE * TILE * 3), np.uint8
        ).reshape(TILE, TILE, 3)
    if comp_code == 50001:
        from gdal_spark.raster.webp import decode_webp
        return decode_webp(blob)[:, :, :3]
    if comp_code == 7:
        from gdal_spark.raster.jpeg import decode_jpeg
        return decode_jpeg(blob)
    raise ValueError(f"cog: unsupported compression tag {comp_code}")


def _tiles_of(arr: np.ndarray, comp: str = "none",
              quality: int = 90) -> list[bytes]:
    h, w, _ = arr.shape
    out = []
    for ty in range(0, h, TILE):
        for tx in range(0, w, TILE):
            sub = arr[ty : ty + TILE, tx : tx + TILE]
            # edge replication: lossy codecs ring on hard pad edges;
            # the decoded crop is unaffected for lossless
            tile = np.pad(
                sub,
                ((0, TILE - sub.shape[0]), (0, TILE - sub.shape[1]),
                 (0, 0)),
                mode="edge")
            out.append(_encode_tile(tile, comp, quality))
    return out


def encode_cog(levels: list[np.ndarray], geo: tuple | None = None,
               compression: str = "none", quality: int = 90) -> bytes:
    """levels[0] = full resolution (H, W, 3) uint8; levels[1:] =
    overviews, coarsest last. -> COG-layout TIFF bytes.  geo =
    (gdal 6-term geotransform, epsg) stamps IFD0 with the GeoTIFF
    scale/tiepoint/GeoKey tags (raster/tiff.py semantics;
    raster.tiff.read_georef reads them back).  compression mirrors
    the reference COG driver's COMPRESS= creation option."""
    if geo is not None and (geo[0][2] != 0.0 or geo[0][4] != 0.0):
        raise ValueError("cog: rotated geotransforms unsupported")
    comp_code = _COG_COMP[compression]
    ifds: list[dict] = []
    all_tiles: list[list[bytes]] = []
    for lvl, arr in enumerate(levels):
        assert arr.ndim == 3 and arr.shape[2] == 3 and arr.dtype == np.uint8
        all_tiles.append(_tiles_of(arr, compression, quality))
        ifds.append({"h": arr.shape[0], "w": arr.shape[1], "lvl": lvl})

    def ifd_entries(meta, n_tiles):
        e = [
            (_T_NEWSUBFILE, _LONG, 1, 0 if meta["lvl"] == 0 else 1),
            (_T_WIDTH, _LONG, 1, meta["w"]),
            (_T_HEIGHT, _LONG, 1, meta["h"]),
            (_T_BPS, _SHORT, 3, None),       # external when count > 2
            (_T_COMPRESSION, _SHORT, 1, comp_code),
            # JPEG chunks carry the YCbCr transform in-stream
            (_T_PHOTO, _SHORT, 1, 6 if compression == "jpeg" else 2),
            (_T_SPP, _SHORT, 1, 3),
            (_T_PLANAR, _SHORT, 1, 1),
            (_T_TILE_W, _LONG, 1, TILE),
            (_T_TILE_H, _LONG, 1, TILE),
            (_T_TILE_OFFSETS, _LONG, n_tiles, None),
            (_T_TILE_COUNTS, _LONG, n_tiles, None),
        ]
        if compression == "jpeg":
            # two inline SHORTs: 1,1 (no subsampling)
            e.append((_T_YCBCR_SUB, _SHORT, 2, 0x00010001))
        if geo is not None and meta["lvl"] == 0:
            e += [
                (_T_PIXEL_SCALE, _DOUBLE, 3, None),
                (_T_TIEPOINT, _DOUBLE, 6, None),
                (_T_GEOKEYS, _SHORT, 16, None),
            ]
        return e

    # --- layout pass: header, IFDs + their external arrays, then data
    pos = 8  # after TIFF header
    ifd_pos = []
    ext_pos = []
    for meta, tiles in zip(ifds, all_tiles):
        entries = ifd_entries(meta, len(tiles))
        ifd_pos.append(pos)
        pos += 2 + 12 * len(entries) + 4
        # external blocks: bps (3 shorts -> 6 bytes), offsets, counts
        ext = {"bps": pos}
        pos += 8  # 6 rounded to even 8 for alignment
        ext["offsets"] = pos
        pos += 4 * len(tiles)
        ext["counts"] = pos
        pos += 4 * len(tiles)
        if geo is not None and meta["lvl"] == 0:
            ext["scale"] = pos
            pos += 24
            ext["tie"] = pos
            pos += 48
            ext["gk"] = pos
            pos += 32
        ext_pos.append(ext)
    data_start = pos
    # overview tiles first (small reads near the head), full-res last
    tile_offsets: list[list[int]] = [None] * len(ifds)
    for li in list(range(1, len(ifds))) + [0]:
        offs = []
        for t in all_tiles[li]:
            offs.append(pos)
            pos += len(t)
        tile_offsets[li] = offs

    # --- emit
    out = bytearray()
    out += struct.pack("<2sHI", b"II", 42, ifd_pos[0])
    for idx, (meta, tiles) in enumerate(zip(ifds, all_tiles)):
        entries = ifd_entries(meta, len(tiles))
        out += struct.pack("<H", len(entries))
        for tag, typ, count, value in entries:
            if tag == _T_BPS:
                out += struct.pack("<HHII", tag, typ, count, ext_pos[idx]["bps"])
            elif tag == _T_TILE_OFFSETS:
                if count == 1:
                    out += struct.pack("<HHII", tag, typ, 1, tile_offsets[idx][0])
                else:
                    out += struct.pack("<HHII", tag, typ, count, ext_pos[idx]["offsets"])
            elif tag == _T_TILE_COUNTS:
                if count == 1:
                    out += struct.pack("<HHII", tag, typ, 1, len(tiles[0]))
                else:
                    out += struct.pack("<HHII", tag, typ, count, ext_pos[idx]["counts"])
            elif tag == _T_PIXEL_SCALE:
                out += struct.pack("<HHII", tag, typ, count, ext_pos[idx]["scale"])
            elif tag == _T_TIEPOINT:
                out += struct.pack("<HHII", tag, typ, count, ext_pos[idx]["tie"])
            elif tag == _T_GEOKEYS:
                out += struct.pack("<HHII", tag, typ, count, ext_pos[idx]["gk"])
            else:
                out += struct.pack("<HHII", tag, typ, count, value)
        nxt = ifd_pos[idx + 1] if idx + 1 < len(ifds) else 0
        out += struct.pack("<I", nxt)
        # external arrays
        assert len(out) == ext_pos[idx]["bps"]
        out += struct.pack("<HHH", 8, 8, 8) + b"\x00\x00"
        assert len(out) == ext_pos[idx]["offsets"]
        out += struct.pack(f"<{len(tiles)}I", *tile_offsets[idx])
        assert len(out) == ext_pos[idx]["counts"]
        out += struct.pack(f"<{len(tiles)}I", *[len(t) for t in tiles])
        if geo is not None and idx == 0:
            from gdal_spark.raster.tiff import _geokey_directory

            gt, epsg = geo
            assert len(out) == ext_pos[idx]["scale"]
            out += struct.pack("<3d", gt[1], -gt[5], 0.0)
            assert len(out) == ext_pos[idx]["tie"]
            out += struct.pack("<6d", 0.0, 0.0, 0.0, gt[0], gt[3], 0.0)
            assert len(out) == ext_pos[idx]["gk"]
            gk = _geokey_directory(int(epsg), 4000 <= int(epsg) <= 4999)
            out += struct.pack(f"<{len(gk)}H", *gk)
    assert len(out) == data_start
    out += bytes(pos - data_start)  # reserve, then place tiles
    for li, offs in enumerate(tile_offsets):
        for off, t in zip(offs, all_tiles[li]):
            out[off : off + len(t)] = t
    return bytes(out)


def decode_cog(buf: bytes) -> list[np.ndarray]:
    """-> [level arrays] in IFD order; validates the COG layout
    (every IFD + external array sits before every tile payload)."""
    bo, magic, ifd_off = struct.unpack_from("<2sHI", buf, 0)
    assert bo == b"II" and magic == 42
    levels = []
    max_meta_end = 0
    min_data = len(buf)
    while ifd_off:
        (n,) = struct.unpack_from("<H", buf, ifd_off)
        tags = {}
        for k in range(n):
            tag, typ, count, value = struct.unpack_from(
                "<HHII", buf, ifd_off + 2 + 12 * k
            )
            tags[tag] = (typ, count, value)
        (ifd_off_next,) = struct.unpack_from("<I", buf, ifd_off + 2 + 12 * n)
        h = tags[_T_HEIGHT][2]
        w = tags[_T_WIDTH][2]
        comp_code = tags.get(_T_COMPRESSION, (0, 1, 1))[2]
        n_tiles = tags[_T_TILE_OFFSETS][1]
        if n_tiles == 1:
            offsets = [tags[_T_TILE_OFFSETS][2]]
            counts = [tags[_T_TILE_COUNTS][2]]
        else:
            offsets = list(
                struct.unpack_from(f"<{n_tiles}I", buf, tags[_T_TILE_OFFSETS][2])
            )
            counts = list(
                struct.unpack_from(f"<{n_tiles}I", buf, tags[_T_TILE_COUNTS][2])
            )
            max_meta_end = max(max_meta_end, tags[_T_TILE_OFFSETS][2] + 4 * n_tiles)
        max_meta_end = max(max_meta_end, ifd_off + 2 + 12 * n + 4)
        min_data = min(min_data, min(offsets))
        arr = np.zeros((((h + TILE - 1) // TILE) * TILE,
                        ((w + TILE - 1) // TILE) * TILE, 3), dtype=np.uint8)
        tpr = (w + TILE - 1) // TILE
        for ti, (off, cnt) in enumerate(zip(offsets, counts)):
            ty, tx = divmod(ti, tpr)
            tile = _decode_tile(buf[off : off + cnt], comp_code)
            arr[ty * TILE : (ty + 1) * TILE, tx * TILE : (tx + 1) * TILE] = tile
        levels.append(arr[:h, :w])
        ifd_off = ifd_off_next
    assert max_meta_end <= min_data, "not cloud-optimized: data before metadata"
    return levels
