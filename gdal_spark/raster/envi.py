"""ENVI flat-binary raster codec — the reference's ENVI driver scope
(frmts/raw/envidataset.cpp): a raw pixel file + a text .hdr with
`key = value` pairs; samples/lines/bands, interleave bsq|bil|bip,
data type (ENVI codes: 1=uint8, 2=int16, 4=float32, 12=uint16),
byte order (0 little, 1 big), optional map info georeferencing.

Encode/decode operate on (bytes, header-text) pairs so the Spark
side can carry both through binary columns; `map info` serializes
the north-up geotransform exactly like the reference writes it."""

from __future__ import annotations

import numpy as np

__all__ = ["encode_envi", "decode_envi"]

_DTYPES = {1: np.uint8, 2: np.int16, 4: np.float32, 12: np.uint16}
_CODES = {np.dtype(np.uint8): 1, np.dtype(np.int16): 2,
          np.dtype(np.float32): 4, np.dtype(np.uint16): 12}


def encode_envi(arr: np.ndarray, interleave: str = "bsq",
                geo: tuple | None = None) -> tuple[bytes, str]:
    """(H,W) or (H,W,B) -> (raw bytes, .hdr text)."""
    arr = np.asarray(arr)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, b = arr.shape
    code = _CODES.get(arr.dtype)
    if code is None:
        raise ValueError(f"envi: unsupported dtype {arr.dtype}")
    if interleave == "bsq":
        raw = np.moveaxis(arr, 2, 0).tobytes()
    elif interleave == "bil":
        raw = np.moveaxis(arr, 2, 1).tobytes()
    elif interleave == "bip":
        raw = arr.tobytes()
    else:
        raise ValueError(f"envi: unknown interleave {interleave!r}")
    lines = [
        "ENVI",
        f"samples = {w}",
        f"lines = {h}",
        f"bands = {b}",
        "header offset = 0",
        "file type = ENVI Standard",
        f"data type = {code}",
        f"interleave = {interleave}",
        "byte order = 0",
    ]
    if geo is not None:
        gt, epsg = geo
        if gt[2] != 0.0 or gt[4] != 0.0:
            raise ValueError("envi: rotated geotransforms unsupported")
        lines.append(
            "map info = {Arbitrary, 1, 1, "
            f"{gt[0]!r}, {gt[3]!r}, {gt[1]!r}, {-gt[5]!r}, "
            f"units=Meters}}"
        )
        lines.append(f"coordinate system string = {{EPSG:{epsg}}}")
    return raw, "\n".join(lines) + "\n"


def _hdr_fields(hdr: str) -> dict:
    fields = {}
    key = None
    buf = ""
    for line in hdr.splitlines():
        if "=" in line and not (key and buf.count("{") > buf.count("}")):
            key, _, val = line.partition("=")
            key = key.strip().lower()
            buf = val.strip()
            if buf.count("{") <= buf.count("}"):
                fields[key] = buf
                key = None
        elif key:
            buf += " " + line.strip()
            if buf.count("{") <= buf.count("}"):
                fields[key] = buf
                key = None
    return fields


def decode_envi(raw: bytes, hdr: str):
    """-> (array (H,W,B), geo or None).  geo = (geotransform, epsg)
    when map info is present."""
    f = _hdr_fields(hdr)
    w = int(f["samples"])
    h = int(f["lines"])
    b = int(f.get("bands", "1"))
    code = int(f["data type"])
    dt = np.dtype(_DTYPES[code])
    if int(f.get("byte order", "0")) == 1:
        dt = dt.newbyteorder(">")
    off = int(f.get("header offset", "0"))
    il = f.get("interleave", "bsq").lower()
    flat = np.frombuffer(raw, dtype=dt, count=w * h * b, offset=off)
    if il == "bsq":
        arr = np.moveaxis(flat.reshape(b, h, w), 0, 2)
    elif il == "bil":
        arr = np.moveaxis(flat.reshape(h, b, w), 1, 2)
    elif il == "bip":
        arr = flat.reshape(h, w, b)
    else:
        raise ValueError(f"envi: unknown interleave {il!r}")
    geo = None
    mi = f.get("map info")
    if mi:
        parts = [p.strip() for p in mi.strip("{}").split(",")]
        x0, y0, resx, resy = (float(parts[i]) for i in (3, 4, 5, 6))
        px, py = float(parts[1]), float(parts[2])
        gt = (x0 - (px - 1.0) * resx, resx, 0.0,
              y0 + (py - 1.0) * resy, 0.0, -resy)
        epsg = 0
        cs = f.get("coordinate system string", "")
        if "EPSG:" in cs:
            epsg = int(cs.strip("{}").split("EPSG:")[1].split("}")[0])
        geo = (gt, epsg)
    return arr.copy(), geo
