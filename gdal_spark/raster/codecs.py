"""Format dispatch: the Spark analog of GDAL's driver registry.

GDALOpenEx identifies a driver by header bytes then calls its open
hook (gcore/gdaldataset.cpp:3610,3809-3862). Here the `fmt` column
plays the driver name; `sniff_format` replicates the header-bytes
identify loop for robustness.
"""

from __future__ import annotations

import numpy as np

from gdal_spark.raster.jpeg import decode_jpeg, encode_jpeg
from gdal_spark.raster.png import decode_png, encode_png
from gdal_spark.raster.tiff import decode_tiff, encode_tiff
from gdal_spark.raster.webp import decode_webp, encode_webp_lossless

LOSSLESS = {"png", "tiff", "webp", "jp2"}


def sniff_format(data: bytes) -> str:
    if data[:8] == b"\x89PNG\r\n\x1a\n":
        return "png"
    if data[:2] == b"\xff\xd8":
        return "jpeg"
    if data[:4] in (b"II*\x00", b"MM\x00*"):
        return "tiff"
    if data[:4] == b"RIFF" and data[8:12] == b"WEBP":
        return "webp"
    if data[:6] in (b"GIF87a", b"GIF89a"):
        return "gif"
    if data[:2] == b"BM":
        return "bmp"
    if data[:4] == b"GRIB":
        return "grib"
    if data[:4] == b"\xff\x4f\xff\x51":
        return "jp2"  # raw JPEG2000 codestream (SOC+SIZ)
    if data[:12] == b"\x00\x00\x00\x0cjP  \r\n\x87\n":
        return "jp2"  # JP2 box container
    raise ValueError("unknown image format")


def encode_image(arr: np.ndarray, fmt: str, quality: int = 90) -> bytes:
    fmt = fmt.lower()
    if fmt == "png":
        return encode_png(arr)
    if fmt in ("jpeg", "jpg"):
        return encode_jpeg(arr, quality=quality)
    if fmt in ("tiff", "tif"):
        return encode_tiff(arr)
    if fmt == "webp":
        return encode_webp_lossless(arr)
    if fmt == "gif":
        # exact for ≤256-color imagery (palette-lossless), else the
        # caller quantizes via raster/dither.py first
        from gdal_spark.raster.gif import encode_gif_rgb

        return encode_gif_rgb(arr)
    if fmt == "bmp":
        from gdal_spark.raster.bmp import encode_bmp

        return encode_bmp(arr)
    if fmt in ("jp2", "j2k", "jpeg2000"):
        from gdal_spark.raster.jp2 import encode_jp2

        return encode_jp2(arr)
    raise ValueError(f"unsupported format: {fmt}")


def decode_image(data: bytes, fmt: str | None = None) -> np.ndarray:
    fmt = (fmt or sniff_format(bytes(data[:12]))).lower()
    if fmt == "png":
        return decode_png(data)
    if fmt in ("jpeg", "jpg"):
        return decode_jpeg(data)
    if fmt in ("tiff", "tif"):
        return decode_tiff(data)
    if fmt == "webp":
        # VP8L decodes RGBA; callers of the 3-band model take RGB
        return decode_webp(data)[:, :, :3]
    if fmt == "gif":
        from gdal_spark.raster.gif import decode_gif_rgb

        return decode_gif_rgb(data)
    if fmt == "bmp":
        from gdal_spark.raster.bmp import decode_bmp

        out = decode_bmp(data)
        if isinstance(out, tuple):  # paletted -> expand rgb
            idx, pal = out
            return pal[idx]
        return out
    if fmt in ("jp2", "j2k", "jpeg2000"):
        from gdal_spark.raster.jp2 import decode_jp2

        return decode_jp2(data)
    raise ValueError(f"unsupported format: {fmt}")
