"""MRF (Meta Raster Format, NASA/JPL) — frmts/mrf/.

Three-file layout re-derived from marfa_dataset.cpp / mrf_util.cpp:

- ``.mrf``: XML metadata — ``MRF_META/Raster`` with ``Size``/
  ``PageSize`` (x, y, c attributes; :824-850), ``Compression``,
  ``DataType``, optional ``GeoTags/BoundingBox`` (minx/miny/maxx/
  maxy);
- ``.idx``: one 16-byte record per tile — (offset, size) as
  **big-endian** int64 (``net64``, marfa_dataset.cpp:2599-2600);
  record index = ``c + pagecount.c * (x + pagecount.x * y)``
  (IdxOffset, mrf_util.cpp:330-339, z = 0); a (0, 0) record means
  the tile was never written and reads as fill (:2602-2607 treats
  zero/zero as empty);
- data file: concatenated tile payloads, each independently
  compressed (PNG / JPEG / NONE here — the reference adds LERC etc).

Pagecount per axis is ceil(size / pagesize); edge tiles are padded
to the full page on write and cropped on read (the reference always
codes whole pages).

Scale shape: the tile is the format's parallel unit — the idx maps
(x, y, c) straight to a byte range, so a distributed scan is one
task per tile exactly like the Zarr/COG readers in this repo; no
global state, no sequential section.
"""

from __future__ import annotations

import struct
import xml.etree.ElementTree as ET

import numpy as np

__all__ = ["encode_mrf", "decode_mrf", "mrf_tile_entries"]

_COMP = ("NONE", "PNG", "JPEG", "DEFLATE", "LERC")


def _pcount(n: int, p: int) -> int:
    return 1 + (n - 1) // p


def encode_mrf(
    arr: np.ndarray,
    page: tuple[int, int] = (512, 512),
    compression: str = "PNG",
    bbox: tuple[float, float, float, float] | None = None,
    skip_uniform: int | None = None,
) -> tuple[bytes, bytes, bytes]:
    """uint8 (h, w) or (h, w, c) -> (mrf_xml, idx, data) bytes.

    ``skip_uniform``: tiles whose pixels all equal this value are NOT
    written — their idx records stay (0, 0), the reference's
    empty-tile convention (sparse mosaics store nothing for sea/fill).
    """
    if compression not in _COMP:
        raise ValueError(f"mrf: compression must be one of {_COMP}")
    if arr.dtype != np.uint8:
        raise ValueError("mrf: uint8 only in this subset")
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, nc = arr.shape
    px, py = page
    pcx, pcy = _pcount(w, px), _pcount(h, py)

    root = ET.Element("MRF_META")
    raster = ET.SubElement(root, "Raster")
    ET.SubElement(raster, "Size",
                  {"x": str(w), "y": str(h), "c": str(nc)})
    ET.SubElement(raster, "PageSize",
                  {"x": str(px), "y": str(py), "c": str(nc)})
    ET.SubElement(raster, "Compression").text = compression
    ET.SubElement(raster, "DataType").text = "Byte"
    if bbox is not None:
        geo = ET.SubElement(root, "GeoTags")
        ET.SubElement(geo, "BoundingBox",
                      {k: repr(float(v)) for k, v in
                       zip(("minx", "miny", "maxx", "maxy"), bbox)})
    xml = ET.tostring(root, encoding="utf-8")

    idx = bytearray(16 * pcx * pcy)  # c folded into pages (page c = nc)
    data = bytearray()
    for ty in range(pcy):
        for tx in range(pcx):
            tile = np.zeros((py, px, nc), dtype=np.uint8)
            sub = arr[ty * py : ty * py + py, tx * px : tx * px + px]
            tile[: sub.shape[0], : sub.shape[1]] = sub
            if skip_uniform is not None and (tile == skip_uniform).all():
                continue
            payload = _encode_tile(tile, compression)
            rec = 16 * (tx + pcx * ty)
            struct.pack_into(">qq", idx, rec, len(data), len(payload))
            data += payload
    return xml, bytes(idx), bytes(data)


def _encode_tile(tile: np.ndarray, compression: str) -> bytes:
    sq = tile[:, :, 0] if tile.shape[2] == 1 else tile
    if compression == "NONE":
        return tile.tobytes()
    if compression == "DEFLATE":
        import zlib

        return zlib.compress(tile.tobytes())
    if compression == "LERC":
        # LERC1 is single-plane float; band-sequential planes, each
        # exact for integer pixels at max_z_error=0.25 (LERC_band.cpp
        # routes every dtype through the float CntZImage)
        from gdal_spark.raster.lerc1 import encode_lerc1

        return b"".join(
            encode_lerc1(tile[:, :, c].astype(np.float64))
            for c in range(tile.shape[2]))
    if compression == "PNG":
        from gdal_spark.raster.png import encode_png

        return encode_png(sq)
    from gdal_spark.raster.jpeg import encode_jpeg

    return encode_jpeg(sq, 95, gray=tile.shape[2] == 1)


def _decode_tile(payload: bytes, compression: str,
                 py: int, px: int, nc: int) -> np.ndarray:
    if compression == "NONE":
        return np.frombuffer(payload, dtype=np.uint8).reshape(py, px, nc)
    if compression == "DEFLATE":
        import zlib

        return np.frombuffer(zlib.decompress(payload),
                             dtype=np.uint8).reshape(py, px, nc)
    if compression == "LERC":
        from gdal_spark.raster.lerc1 import decode_lerc1

        planes = []
        pos = 0
        for _c in range(nc):
            # each plane's length: re-decode sequentially (decode
            # returns where it stopped via a length probe)
            plane, _mask, used = _decode_lerc_plane(payload[pos:], py, px)
            planes.append(plane)
            pos += used
        return np.stack(planes, axis=-1)
    if compression == "PNG":
        from gdal_spark.raster.png import decode_png

        out = decode_png(payload)
    else:
        from gdal_spark.raster.jpeg import decode_jpeg

        out = decode_jpeg(payload)
    if out.ndim == 2:
        out = out[:, :, None]
    return out


def _decode_lerc_plane(payload: bytes, py: int, px: int):
    from gdal_spark.raster.lerc1 import decode_lerc1_sized

    # planes are concatenated; the stream is self-sizing (header
    # carries the cnt/z part byte counts), so the decoder reports the
    # exact bytes consumed and the next plane starts right after
    arr, _mask, used = decode_lerc1_sized(payload)
    if arr.shape != (py, px):
        raise ValueError("mrf: LERC plane dimension mismatch")
    return (np.clip(np.floor(arr + 0.5), 0, 255).astype(np.uint8),
            _mask, used)


def _parse_meta(xml: bytes):
    root = ET.fromstring(xml)
    if root.tag != "MRF_META":
        raise ValueError("mrf: not an MRF_META document")
    raster = root.find("Raster")
    size = raster.find("Size")
    w, h = int(size.get("x")), int(size.get("y"))
    nc = int(size.get("c", "1"))
    ps = raster.find("PageSize")
    px = int(ps.get("x", "512"))
    py = int(ps.get("y", "512"))
    comp = (raster.findtext("Compression") or "PNG").strip().upper()
    if comp not in _COMP:
        raise ValueError(f"mrf: unsupported compression {comp!r}")
    dt = (raster.findtext("DataType") or "Byte").strip()
    if dt != "Byte":
        raise ValueError(f"mrf: unsupported DataType {dt!r}")
    bb = root.find("GeoTags/BoundingBox")
    bbox = None
    if bb is not None:
        bbox = tuple(float(bb.get(k)) for k in
                     ("minx", "miny", "maxx", "maxy"))
    return w, h, nc, px, py, comp, bbox


def mrf_tile_entries(xml: bytes, idx: bytes):
    """Yield (tx, ty, offset, size) for every tile — the byte-range
    catalog a distributed scan partitions on (one task per tile)."""
    w, h, _nc, px, py, _comp, _bbox = _parse_meta(xml)
    pcx, pcy = _pcount(w, px), _pcount(h, py)
    if len(idx) < 16 * pcx * pcy:
        raise ValueError("mrf: index shorter than the page grid")
    for ty in range(pcy):
        for tx in range(pcx):
            off, size = struct.unpack_from(">qq", idx, 16 * (tx + pcx * ty))
            yield tx, ty, off, size


def decode_mrf(xml: bytes, idx: bytes, data: bytes,
               fill: int = 0):
    """-> (array (h, w, c) uint8, bbox or None).  Missing tiles
    ((0,0) idx records) read as ``fill``."""
    w, h, nc, px, py, comp, bbox = _parse_meta(xml)
    out = np.full((h, w, nc), fill, dtype=np.uint8)
    for tx, ty, off, size in mrf_tile_entries(xml, idx):
        if off == 0 and size == 0:
            continue
        tile = _decode_tile(data[off : off + size], comp, py, px, nc)
        th = min(py, h - ty * py)
        tw = min(px, w - tx * px)
        out[ty * py : ty * py + th, tx * px : tx * px + tw] = \
            tile[:th, :tw]
    return out, bbox
