"""ASCII grid codecs: Arc/Info ASCII Grid (AAIGrid) and XYZ — two of
the most-used text raster formats, as pure-python payload codecs for
the engine's fmt-dispatch model (one payload per DataFrame row,
decoded inside Arrow-batched UDFs; distribution is across payloads).

Semantics re-derived from the reference drivers:

- AAIGrid (/root/reference/frmts/aaigrid/aaigriddataset.cpp): header
  tokens ncols/nrows, xllcorner|xllcenter + yllcorner|yllcenter,
  cellsize (or dx + dy, :489-513), optional NODATA_value (:566);
  geotransform x0 = xllcorner (:521) or xllcenter - cellsize/2
  (:548), y0 = yll + nrows * cellsize north-up (:537,551); the value
  stream is whitespace-separated and may wrap lines arbitrarily —
  parsing is token-based, never line-based; row 0 is the NORTH row.
  Writer layout mirrors the reference's CreateCopy ("%s %g" rows,
  header order ncols/nrows/xll/yll/cellsize/NODATA_value :1356-1422).

- XYZ (/root/reference/frmts/xyz/xyzdataset.cpp): one "x y z" triple
  per line, separators space/comma/semicolon/tab, optional header
  line naming the columns; coordinates are CELL CENTERS of a regular
  grid (uniform spacing within RELATIVE_ERROR=1e-3, :23); rows may
  run north-up or south-up — the decoder infers orientation and grid
  shape from the distinct coordinate values; absent cells fill with
  nodata.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "encode_aaigrid", "decode_aaigrid", "encode_xyz", "decode_xyz",
    "sniff_ascii_format",
]


def sniff_ascii_format(data: bytes) -> str:
    head = data[:200].lstrip().lower()
    if head.startswith(b"ncols") or head.startswith(b"nrows"):
        return "aaigrid"
    return "xyz"


def _fmt_value(v) -> str:
    f = float(v)
    if f == int(f) and abs(f) < 1e15:
        return str(int(f))
    return repr(f)  # shortest roundtrip repr — lossless text floats


def encode_aaigrid(
    arr: np.ndarray,
    xll: float,
    yll: float,
    cellsize: float,
    nodata: float | None = None,
    center: bool = False,
) -> bytes:
    """arr: (h, w), row 0 = NORTH row. center=True writes the
    xllcenter/yllcenter header variant."""
    h, w = arr.shape
    tag = "center" if center else "corner"
    lines = [
        f"ncols        {w}",
        f"nrows        {h}",
        f"xll{tag}     {_fmt_value(xll)}",
        f"yll{tag}     {_fmt_value(yll)}",
        f"cellsize     {_fmt_value(cellsize)}",
    ]
    if nodata is not None:
        lines.append(f"NODATA_value {_fmt_value(nodata)}")
    for row in arr:
        lines.append(" ".join(_fmt_value(v) for v in row))
    return ("\n".join(lines) + "\n").encode("ascii")


def decode_aaigrid(data: bytes) -> tuple[np.ndarray, dict]:
    """-> ((h, w) float64 north-up array, georef dict with
    x0/y0/dx/dy geotransform terms + nodata)."""
    toks = data.decode("ascii", "replace").split()
    hdr: dict[str, float] = {}
    i = 0
    keys = {
        "ncols", "nrows", "xllcorner", "xllcenter", "yllcorner",
        "yllcenter", "cellsize", "dx", "dy", "nodata_value",
    }
    while i + 1 < len(toks) and toks[i].lower() in keys:
        hdr[toks[i].lower()] = float(toks[i + 1])
        i += 2
    if "ncols" not in hdr or "nrows" not in hdr:
        raise ValueError("missing ncols/nrows header")
    w, h = int(hdr["ncols"]), int(hdr["nrows"])
    if "cellsize" in hdr:
        dx = dy = hdr["cellsize"]
    else:
        dx, dy = hdr["dx"], hdr["dy"]  # (:489-513)
    if "xllcorner" in hdr:
        x0 = hdr["xllcorner"]
    else:
        x0 = hdr["xllcenter"] - 0.5 * dx  # (:548)
    if "yllcorner" in hdr:
        y0 = hdr["yllcorner"] + h * dy  # north-up top edge (:537)
    else:
        y0 = hdr["yllcenter"] - 0.5 * dy + h * dy
    vals = np.array(toks[i : i + w * h], dtype=np.float64)
    if vals.size != w * h:
        raise ValueError(f"expected {w * h} values, got {vals.size}")
    georef = {
        "x0": x0, "y0": y0, "dx": dx, "dy": dy,
        "nodata": hdr.get("nodata_value"),
    }
    return vals.reshape(h, w), georef


def encode_xyz(
    arr: np.ndarray,
    x0: float,
    y0: float,
    dx: float,
    dy: float,
    sep: str = " ",
    header: bool = True,
) -> bytes:
    """North-up (h, w) array -> one cell-center triple per line, top
    row first (the reference writer's order)."""
    h, w = arr.shape
    out = []
    if header:
        out.append(sep.join(("X", "Y", "Z")))
    for r in range(h):
        y = y0 - (r + 0.5) * dy
        for c in range(w):
            x = x0 + (c + 0.5) * dx
            out.append(sep.join((_fmt_value(x), _fmt_value(y), _fmt_value(arr[r, c]))))
    return ("\n".join(out) + "\n").encode("ascii")


def decode_xyz(data: bytes, nodata: float = 0.0) -> tuple[np.ndarray, dict]:
    """Infer the regular grid from the coordinate values (any row
    order, any separator among space/comma/semicolon/tab, optional
    header line) and return a north-up array."""
    text = data.decode("ascii", "replace")
    xs, ys, zs = [], [], []
    for line in text.splitlines():
        line = line.strip()
        if not line:
            continue
        for s in (",", ";", "\t"):
            line = line.replace(s, " ")
        parts = line.split()
        if len(parts) < 3:
            raise ValueError(f"bad XYZ line: {line!r}")
        try:
            x, y, z = float(parts[0]), float(parts[1]), float(parts[2])
        except ValueError:
            continue  # header line (column names)
        xs.append(x)
        ys.append(y)
        zs.append(z)
    if not xs:
        raise ValueError("no XYZ data lines")
    xs_a, ys_a, zs_a = map(np.asarray, (xs, ys, zs))
    ux, uy = np.unique(xs_a), np.unique(ys_a)
    w, h = len(ux), len(uy)

    def step(u, name):
        if len(u) < 2:
            return 1.0
        d = np.diff(u)
        if (np.abs(d - d[0]) > 1e-3 * abs(d[0])).any():  # RELATIVE_ERROR
            raise ValueError(f"irregular {name} spacing")
        return float(d[0])

    dx, dy = step(ux, "x"), step(uy, "y")
    arr = np.full((h, w), nodata, dtype=np.float64)
    col = np.searchsorted(ux, xs_a)
    row_s = np.searchsorted(uy, ys_a)   # 0 = southmost
    arr[(h - 1) - row_s, col] = zs_a    # to north-up
    georef = {
        "x0": float(ux[0]) - 0.5 * dx,
        "y0": float(uy[-1]) + 0.5 * dy,
        "dx": dx, "dy": dy, "nodata": nodata,
    }
    return arr, georef
