"""GXF (Geosoft Grid eXchange File) ASCII grid codec.

Semantics re-derived from the reference driver
(/root/reference/frmts/gxf/gxfopen.c):

- `#`-titled sections (:227-290): #TITL, #POIN (columns), #ROWS,
  #PTSE/#RWSE (pixel sizes), #XORI/#YORI, #DUMM (nodata text),
  #SENS; parsing stops at #GRID (:67-70) where the data vectors
  begin, whitespace-separated, one grid vector per line group.
- #SENSE codes (gxfopen.h:97-104): the default GXFS_LL_RIGHT (1)
  stores rows BOTTOM-TO-TOP; row-organized senses mirror
  vertically (LL_RIGHT/LR_LEFT) and/or horizontally
  (LR_LEFT/UR_LEFT) per GXFGetScanline (:617-660).  Column-organized
  senses (±2 vertical variants 2/-1/-3/4) are refused loudly, like
  callers that require raw row order.
- Missing #DUMMY defaults to -1e12 (:828).
"""

from __future__ import annotations

import numpy as np

__all__ = ["encode_gxf", "decode_gxf"]

_ROW_SENSES = {1: (True, False), -2: (False, False),
               3: (False, True), -4: (True, True)}
# sense -> (flip vertically when reading, mirror horizontally)


def encode_gxf(arr: np.ndarray, x_origin: float = 0.0,
               y_origin: float = 0.0, pixel: float = 1.0,
               sense: int = 1, dummy: float | None = None,
               title: str = "grid") -> str:
    """(H,W) numeric -> GXF text (row-organized senses only)."""
    arr = np.asarray(arr)
    if arr.ndim != 2:
        raise ValueError("gxf: single-band grids only")
    if sense not in _ROW_SENSES:
        raise ValueError(f"gxf: column-organized #SENSE {sense} "
                         "unsupported")
    flip_v, mirror_h = _ROW_SENSES[sense]
    a = arr[::-1] if flip_v else arr
    a = a[:, ::-1] if mirror_h else a
    h, w = arr.shape
    lines = [
        "#TITLE", title,
        "#POINTS", str(w),
        "#ROWS", str(h),
        "#PTSEPARATION", repr(float(pixel)),
        "#RWSEPARATION", repr(float(pixel)),
        "#XORIGIN", repr(float(x_origin)),
        "#YORIGIN", repr(float(y_origin)),
        "#SENSE", str(sense),
    ]
    if dummy is not None:
        lines += ["#DUMMY", repr(float(dummy))]
    lines.append("#GRID")
    for row in a:
        lines.append(" ".join(
            str(int(v)) if float(v) == int(v) else repr(float(v))
            for v in row
        ))
    return "\n".join(lines) + "\n"


def decode_gxf(text: str):
    """-> ((H,W) float64 array in top-down row-major order, meta)."""
    lines = text.splitlines()
    kv: dict[str, list[str]] = {}
    i = 0
    grid_at = None
    cur = None
    while i < len(lines):
        s = lines[i].strip()
        if s.upper().startswith("#GRID"):
            grid_at = i + 1
            break
        if s.startswith("#"):
            cur = s.split()[0].upper()[:5]
            kv[cur] = []
        elif s and cur:
            kv[cur].append(s)
        i += 1
    if grid_at is None:
        raise ValueError("gxf: no #GRID section")
    w = int(kv["#POIN"][0])
    h = int(kv["#ROWS"][0])
    sense = int(kv.get("#SENS", ["1"])[0])
    if sense not in _ROW_SENSES:
        raise ValueError(f"gxf: column-organized #SENSE {sense} "
                         "unsupported")
    tokens = " ".join(lines[grid_at:]).split()
    try:
        vals = np.array(tokens, dtype=np.float64)
    except ValueError as exc:
        raise ValueError(f"gxf: non-numeric token in #GRID: {exc}") from None
    if len(vals) < h * w:
        raise ValueError("gxf: short grid")
    if len(vals) > h * w:
        raise ValueError(
            f"gxf: {len(vals) - h * w} surplus grid tokens after "
            f"{h}x{w} values")
    a = vals.reshape(h, w)
    flip_v, mirror_h = _ROW_SENSES[sense]
    if flip_v:
        a = a[::-1]
    if mirror_h:
        a = a[:, ::-1]
    meta = {
        "x_origin": float(kv.get("#XORI", ["0"])[0]),
        "y_origin": float(kv.get("#YORI", ["0"])[0]),
        "pixel": (float(kv.get("#PTSE", ["1"])[0]),
                  float(kv.get("#RWSE", ["1"])[0])),
        "dummy": float(kv.get("#DUMM", ["-1e12"])[0]),
        "sense": sense,
    }
    return a.copy(), meta
