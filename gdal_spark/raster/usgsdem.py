"""USGS DEM codec (the classic ASCII elevation interchange format).

Semantics re-derived from the reference driver
(/root/reference/frmts/usgsdem/usgsdemdataset.cpp):

- A record with FIXED byte offsets: coordinate system int at 156,
  ground/vertical unit codes at 528, the four corner (x,y) pairs
  SW,NW,NE,SE as 24-char D-exponent doubles at 546, elev min/max as
  48-char doubles at 738/786, dx/dy/vres as 12-char doubles at 816,
  profile count at 858, the (1,1) row/column marker at 864
  (LoadFromFile, usgsdemdataset.cpp:582-692);
- "new format" data records start at byte 1024 and every profile is
  padded out to the next 1024-byte boundary (:500-506, :624);
- one B record per LONGITUDE COLUMN: row#(=1), col#(1-based),
  point count, col count(=1), xStart, yStart, elevOffset, zMin, zMax
  then the elevations as whitespace-separated ints, SOUTH->NORTH
  (iY = ySize - j - 1, :456-458);
- elevation = raw * vres + elevOffset; nodata = -32767 (:477,530);
- geographic corner/start coordinates are stored in ARCSECONDS
  (dyStart / 3600 when the SRS is geographic, :436);
- Fortran 'D' exponents accepted everywhere (DConvert, :252-270).

Encode writes the new-format geographic flavor (coordinate system 0,
meters, vres 1, offset 0); decode takes any rectangular new-format
file with per-profile offsets/vres applied.
"""

from __future__ import annotations

import numpy as np

__all__ = ["encode_usgsdem", "decode_usgsdem", "USGSDEM_NODATA"]

USGSDEM_NODATA = -32767


def _dfmt(v: float, width: int, prec: int = 15) -> str:
    """Fixed-width Fortran double with a D exponent; precision must
    leave the rendered value inside `width` (12-char fields get 5)."""
    s = "%*.*E" % (width, prec, float(v))
    if len(s) > width:
        raise ValueError("usgsdem: value too wide for field")
    return s.replace("E", "D")


def _dparse(tok: str) -> float:
    return float(tok.replace("D", "E").replace("d", "e"))


def encode_usgsdem(arr: np.ndarray, lon0_deg: float = 0.0,
                   lat0_deg: float = 0.0, dx_sec: float = 30.0,
                   dy_sec: float = 30.0) -> bytes:
    """(H,W) int elevations (row 0 = north) -> new-format USGS DEM
    bytes; (lon0, lat0) is the SW data point, spacings in arcsec."""
    arr = np.asarray(arr)
    h, w = arr.shape
    if np.abs(arr).max(initial=0) > 32767:
        raise ValueError("usgsdem: elevations exceed int16 range")
    x0, y0 = lon0_deg * 3600.0, lat0_deg * 3600.0
    x1, y1 = x0 + (w - 1) * dx_sec, y0 + (h - 1) * dy_sec

    a = bytearray(b" " * 1024)

    def put(off, text):
        b = text.encode()
        a[off:off + len(b)] = b

    put(0, "SYNTHETIC USGS DEM (gdal_spark)")
    put(156, "%6d" % 0)        # coordinate system: geographic
    put(162, "%6d" % 0)        # UTM zone
    put(528, "%6d" % 3)        # ground units: arcsec
    put(534, "%6d" % 2)        # vertical units: meters
    corners = [(x0, y0), (x0, y1), (x1, y1), (x1, y0)]  # SW NW NE SE
    off = 546
    for cx, cy in corners:
        put(off, _dfmt(cx, 24))
        put(off + 24, _dfmt(cy, 24))
        off += 48
    # corners end at 546 + 4*48 = 738; elev min/max follow as 48-char
    # doubles (the reference reads them sequentially, :688-689)
    put(738, _dfmt(float(arr.min()) if arr.size else 0.0, 48))
    put(786, _dfmt(float(arr.max()) if arr.size else 0.0, 48))
    put(816, _dfmt(dx_sec, 12, 5))
    put(828, _dfmt(dy_sec, 12, 5))
    put(840, _dfmt(1.0, 12, 5))   # vertical resolution
    put(852, "%6d" % 1)        # rows of profiles
    put(858, "%6d" % w)        # number of profiles (columns)
    put(864, "%6d%6d" % (1, 1))

    out = [bytes(a)]
    south_up = arr[::-1, :]    # row 0 = south
    for x in range(w):
        rec = []
        rec.append("%6d%6d" % (1, x + 1))
        rec.append("%6d%6d" % (h, 1))
        rec.append(_dfmt(x0 + x * dx_sec, 24))
        rec.append(_dfmt(y0, 24))
        rec.append(_dfmt(0.0, 24))           # elevation offset
        col = south_up[:, x]
        rec.append(_dfmt(float(col.min()), 24))
        rec.append(_dfmt(float(col.max()), 24))
        rec.append("".join("%6d" % int(v) for v in col))
        body = "".join(rec).encode()
        pad = (-len(body)) % 1024
        out.append(body + b" " * pad)
    return b"".join(out)


def decode_usgsdem(data: bytes):
    """USGS DEM bytes -> ((H,W) int32 north-up array, meta dict)."""
    a = data[:1024]
    if len(data) < 1024 or a[864:876].split() != [b"1", b"1"]:
        raise ValueError("usgsdem: not a new-format USGS DEM A record")
    coord_sys = int(a[156:162])
    geographic = coord_sys == 0
    corners = []
    off = 546
    for _ in range(4):
        corners.append(
            (_dparse(a[off:off + 24].decode()),
             _dparse(a[off + 24:off + 48].decode()))
        )
        off += 48
    dx = _dparse(a[816:828].decode())
    dy = _dparse(a[828:840].decode())
    vres = _dparse(a[840:852].decode())
    nprof = int(a[858:864])
    xmin = min(corners[0][0], corners[1][0])
    ymin = min(corners[0][1], corners[3][1])
    ymax = max(corners[1][1], corners[2][1])
    h = int(round((ymax - ymin) / dy)) + 1
    w = nprof
    grid = np.full((h, w), USGSDEM_NODATA, dtype=np.int32)

    pos = 1024
    for i in range(w):
        # tokenized B record header: 4 ints then 5 fixed-width doubles
        toks, pos = _read_ints(data, pos, 4)
        _rown, coln, npts, _ncols = toks
        if coln != i + 1:
            raise ValueError("usgsdem: unexpected profile order")
        # five fixed-width 24-char doubles follow the four 6-char
        # ints contiguously (leading-space padded; no tokenizing)
        doubles = []
        for _ in range(5):
            doubles.append(_dparse(data[pos:pos + 24].decode()))
            pos += 24
        _xs, ys, zoff = doubles[0], doubles[1], doubles[2]
        vals, pos = _read_ints(data, pos, npts)
        ygap = int(round((ys - ymin) / dy))
        for j, raw in enumerate(vals):
            iy = h - (j + ygap) - 1
            if 0 <= iy < h:
                grid[iy, i] = (
                    USGSDEM_NODATA if raw == USGSDEM_NODATA
                    else int(raw * vres + zoff)
                )
        pos = (pos + 1023) // 1024 * 1024   # next block boundary
    unit = 3600.0 if geographic else 1.0
    meta = {
        "geotransform": (
            (xmin - dx / 2) / unit, dx / unit, 0.0,
            (ymax + dy / 2) / unit, 0.0, -dy / unit,
        ),
        "geographic": geographic,
    }
    return grid, meta


def _skip_ws(data: bytes, pos: int) -> int:
    while pos < len(data) and data[pos:pos + 1].isspace():
        pos += 1
    return pos


def _read_ints(data: bytes, pos: int, n: int):
    """Whitespace-tolerant integer stream; a '-' begins a NEW token
    (fixed 6-char fields let "  2513-32767" run together — the
    reference's buffer reader parses sign+digits the same way)."""
    out = []
    for _ in range(n):
        pos = _skip_ws(data, pos)
        end = pos + 1                      # keep a leading sign
        while end < len(data):
            c = data[end:end + 1]
            if c.isspace() or c == b"-":
                break
            end += 1
        out.append(int(data[pos:end]))
        pos = end
    return out, pos
