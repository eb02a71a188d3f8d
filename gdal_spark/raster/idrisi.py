"""Idrisi RST/RDC raster codec.

Semantics re-derived from the reference driver
(/root/reference/frmts/idrisi/IdrisiDataset.cpp):

- data file (.rst) is raw row-major, TOP-down rows (IReadBlock seeks
  record * yoff, :1429), little-endian;
- data types (.rdc `data type` field, :106-108,:645): `byte` (u8),
  `integer` (int16 LE), `real` (float32 LE), `rgb24` (pixel-
  interleaved B,G,R — band 1 reads offset 3-nBand, :1448-1453);
- the documentation file (.rdc) is `key : value` lines with
  12-character space-padded keys (:57-82): file format / data type /
  file type binary / columns / rows / ref. system / min./max. X/Y /
  min./max. value / flag value;
- georeference: min/max X/Y describe the OUTER edges (pixel-edge
  registration), resolution = (maxX - minX) / columns.
"""

from __future__ import annotations

import numpy as np

__all__ = ["encode_rst", "decode_rst"]

_TYPES = {
    "byte": np.dtype("u1"),
    "integer": np.dtype("<i2"),
    "real": np.dtype("<f4"),
}


def _key(k: str) -> str:
    return k.ljust(12)


def encode_rst(arr: np.ndarray, geo: tuple | None = None
               ) -> tuple[bytes, str]:
    """(H,W) byte/int16/float32 or (H,W,3) byte RGB -> (raw .rst
    bytes, .rdc text)."""
    arr = np.asarray(arr)
    if arr.ndim == 3:
        if arr.shape[2] != 3 or arr.dtype != np.uint8:
            raise ValueError("rst: 3-band data must be uint8 rgb24")
        dtype_name = "rgb24"
        raw = arr[:, :, ::-1].tobytes()        # pixel-interleaved BGR
    else:
        if arr.dtype == np.uint8:
            dtype_name = "byte"
        elif arr.dtype == np.int16:
            dtype_name = "integer"
        elif arr.dtype == np.float32:
            dtype_name = "real"
        else:
            raise ValueError(f"rst: unsupported dtype {arr.dtype}")
        raw = arr.astype(_TYPES[dtype_name].newbyteorder("<")).tobytes()
    h, w = arr.shape[:2]
    if geo is not None:
        gt = geo[0]
        if gt[2] != 0.0 or gt[4] != 0.0:
            raise ValueError("rst: rotated geotransforms unsupported")
        minx, maxx = gt[0], gt[0] + w * gt[1]
        maxy, miny = gt[3], gt[3] + h * gt[5]
    else:
        minx, maxx, miny, maxy = 0.0, float(w), 0.0, float(h)
    flat = arr.reshape(-1, 3) if arr.ndim == 3 else arr
    lines = [
        (_key("file format"), "IDRISI Raster A.1"),
        (_key("file title"), ""),
        (_key("data type"), dtype_name),
        (_key("file type"), "binary"),
        (_key("columns"), str(w)),
        (_key("rows"), str(h)),
        (_key("ref. system"), "plane"),
        (_key("ref. units"), "m"),
        (_key("unit dist."), "1.0000000"),
        (_key("min. X"), repr(float(minx))),
        (_key("max. X"), repr(float(maxx))),
        (_key("min. Y"), repr(float(miny))),
        (_key("max. Y"), repr(float(maxy))),
        (_key("pos'n error"), "unknown"),
        (_key("resolution"), repr(float((maxx - minx) / w))),
        (_key("min. value"), repr(float(flat.min())) if arr.size else "0"),
        (_key("max. value"), repr(float(flat.max())) if arr.size else "0"),
        (_key("display min"), "0"),
        (_key("display max"), "255"),
        (_key("value units"), "unspecified"),
        (_key("value error"), "unknown"),
        (_key("flag value"), "none"),
        (_key("flag def'n"), "none"),
        (_key("legend cats"), "0"),
    ]
    rdc = "\n".join(f"{k}: {v}" for k, v in lines) + "\n"
    return raw, rdc


def decode_rst(raw: bytes, rdc: str):
    """(.rst bytes, .rdc text) -> ((H,W) or (H,W,3) array, meta)."""
    kv = {}
    for line in rdc.splitlines():
        if ":" not in line:
            continue
        k, v = line.split(":", 1)
        kv[k.rstrip()] = v.strip()
    w = int(kv["columns"])
    h = int(kv["rows"])
    dt = kv["data type"].lower()
    if dt == "rgb24":
        arr = np.frombuffer(raw, dtype=np.uint8, count=h * w * 3).reshape(
            h, w, 3
        )[:, :, ::-1]                           # BGR -> RGB
    elif dt in _TYPES:
        arr = np.frombuffer(raw, dtype=_TYPES[dt], count=h * w).reshape(
            h, w
        )
    else:
        raise ValueError(f"rst: unknown data type {dt!r}")
    meta = {"data_type": dt}
    if "min. X" in kv and "max. Y" in kv:
        minx, maxx = float(kv["min. X"]), float(kv["max. X"])
        miny, maxy = float(kv["min. Y"]), float(kv["max. Y"])
        meta["geotransform"] = (
            minx, (maxx - minx) / w, 0.0, maxy, 0.0, (miny - maxy) / h
        )
    return arr, meta
