"""Surfer GSAG/GSBG and ZMap Plus grid codecs — the small classic
grid-interchange family.

Semantics re-derived from the reference drivers:

- GSBG (/root/reference/frmts/gsg/gsbgdataset.cpp WriteHeader,
  :693-790): "DSBB" + int16-LE nx, ny + float64-LE minX maxX minY
  maxY minZ maxZ + float32-LE rows BOTTOM-up (IReadBlock reads row
  nRasterYSize-1-nBlockYOff, :241); min/max X/Y are NODE centers
  (geotransform subtracts half a pixel, :625-631).
- GSAG (frmts/gsg/gsagdataset.cpp): same model in ASCII — "DSAA",
  "nx ny", "minX maxX", "minY maxY", "minZ maxZ", then rows
  bottom-up as whitespace-separated values.
- ZMap (/root/reference/frmts/zmap/zmapdataset.cpp): '!' comments,
  "@<name>, GRID, <valuesPerLine>" then two header lines
  (fieldWidth, nodata, , decimals, 1) and (nRows, nCols, xmin,
  xmax, ymin, ymax), "0.0, 0.0, 0.0", "@", then fixed-width values
  COLUMN by column, each column TOP-down (:88-96), nValuesPerLine
  per text line.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = [
    "encode_gsbg", "decode_gsbg",
    "encode_gsag", "decode_gsag",
    "encode_zmap", "decode_zmap",
]


def _node_bounds(h: int, w: int, geo: tuple | None):
    if geo is None:
        return 0.0, float(w - 1), 0.0, float(h - 1)
    gt = geo[0]
    if gt[2] != 0.0 or gt[4] != 0.0:
        raise ValueError("grid: rotated geotransforms unsupported")
    minx = gt[0] + gt[1] / 2
    maxx = gt[0] + gt[1] * w - gt[1] / 2
    maxy = gt[3] + gt[5] / 2
    miny = gt[3] + gt[5] * h - gt[5] / 2
    return minx, maxx, miny, maxy


def _gt_from_nodes(w, h, minx, maxx, miny, maxy):
    px = (maxx - minx) / (w - 1) if w > 1 else 1.0
    py = (maxy - miny) / (h - 1) if h > 1 else 1.0
    return (minx - px / 2, px, 0.0, maxy + py / 2, 0.0, -py)


def encode_gsbg(arr: np.ndarray, geo: tuple | None = None) -> bytes:
    arr = np.asarray(arr, dtype=np.float64)
    h, w = arr.shape
    minx, maxx, miny, maxy = _node_bounds(h, w, geo)
    hdr = b"DSBB" + struct.pack("<hh", w, h) + struct.pack(
        "<6d", minx, maxx, miny, maxy, float(arr.min()), float(arr.max())
    )
    return hdr + arr[::-1, :].astype("<f4").tobytes()


def decode_gsbg(data: bytes):
    if data[:4] != b"DSBB":
        raise ValueError("gsbg: missing DSBB signature")
    w, h = struct.unpack_from("<hh", data, 4)
    minx, maxx, miny, maxy, _zmin, _zmax = struct.unpack_from(
        "<6d", data, 8
    )
    grid = np.frombuffer(data, dtype="<f4", count=h * w,
                         offset=56).reshape(h, w)[::-1, :]
    return grid.astype(np.float64), {
        "geotransform": _gt_from_nodes(w, h, minx, maxx, miny, maxy)
    }


def encode_gsag(arr: np.ndarray, geo: tuple | None = None) -> str:
    arr = np.asarray(arr, dtype=np.float64)
    h, w = arr.shape
    minx, maxx, miny, maxy = _node_bounds(h, w, geo)
    lines = [
        "DSAA",
        f"{w} {h}",
        f"{minx!r} {maxx!r}",
        f"{miny!r} {maxy!r}",
        f"{float(arr.min())!r} {float(arr.max())!r}",
    ]
    for row in arr[::-1, :]:
        lines.append(" ".join(repr(float(v)) for v in row))
    return "\n".join(lines) + "\n"


def decode_gsag(text: str):
    toks = text.split()
    if toks[0] != "DSAA":
        raise ValueError("gsag: missing DSAA signature")
    w, h = int(toks[1]), int(toks[2])
    minx, maxx = float(toks[3]), float(toks[4])
    miny, maxy = float(toks[5]), float(toks[6])
    vals = np.array([float(t) for t in toks[9:9 + h * w]])
    grid = vals.reshape(h, w)[::-1, :]
    return grid, {
        "geotransform": _gt_from_nodes(w, h, minx, maxx, miny, maxy)
    }


def encode_zmap(arr: np.ndarray, geo: tuple | None = None,
                nodata: float = 1e30, values_per_line: int = 4,
                field_width: int = 18, decimals: int = 7) -> str:
    arr = np.asarray(arr, dtype=np.float64)
    h, w = arr.shape
    minx, maxx, miny, maxy = _node_bounds(h, w, geo)

    def rj(v, width=field_width, dec=decimals):
        return f"%{width}.{dec}f" % v

    lines = [
        "!",
        "! Created by gdal_spark.",
        "!",
        f"@GRID FILE, GRID, {values_per_line}",
        f"{field_width:>10},{rj(nodata)},{'':>10},{decimals:>10},{1:>10}",
        f"{h:>10},{w:>10},{rj(minx, 14)},{rj(maxx, 14)},"
        f"{rj(miny, 14)},{rj(maxy, 14)}",
        "0.0, 0.0, 0.0",
        "@",
    ]
    # column-major, each column top-down (zmapdataset.cpp:90-93)
    flat = arr.T.reshape(-1)
    for i in range(0, len(flat), values_per_line):
        chunk = flat[i:i + values_per_line]
        lines.append("".join(rj(v) for v in chunk))
    return "\n".join(lines) + "\n"


def decode_zmap(text: str):
    lines = [ln for ln in text.splitlines() if not ln.startswith("!")]
    if not lines or not lines[0].startswith("@"):
        raise ValueError("zmap: missing @GRID header")
    hdr1 = lines[1].split(",")
    nodata = float(hdr1[1])
    hdr2 = lines[2].split(",")
    h, w = int(hdr2[0]), int(hdr2[1])
    minx, maxx = float(hdr2[2]), float(hdr2[3])
    miny, maxy = float(hdr2[4]), float(hdr2[5])
    i = 3
    while not lines[i].startswith("@"):
        i += 1
    vals = []
    for ln in lines[i + 1:]:
        vals += [float(t) for t in ln.split()]
    grid = np.array(vals[: h * w]).reshape(w, h).T
    return grid, {
        "nodata": nodata,
        "geotransform": _gt_from_nodes(w, h, minx, maxx, miny, maxy),
    }
