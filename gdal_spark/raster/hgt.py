"""SRTM HGT tile codec (pure struct/numpy).

Re-derived from /root/reference/frmts/srtmhgt/srtmhgtdataset.cpp:

- payload = N x N BIG-endian int16 samples, row 0 = NORTH row; N from
  the byte size (1201 -> 3-arcsec SRTM3, 3601 -> 1-arcsec SRTM1,
  :334-453); nodata -32768 (:25);
- the georeference lives in the FILE NAME: `N51E000.hgt` names the
  SOUTH-WEST corner (sign letters N/S and E/W, :400-420);
- samples are point-registered on tile edges, so the geotransform is
  x0 = lon_sw - 0.5/(N-1), dx = 1/(N-1), y0 = lat_sw + 1 + 0.5/(N-1)
  (:484-489, AREA_OR_POINT=Point) and adjacent tiles SHARE their edge
  rows/columns — a 10^4-tile mosaic drops one duplicate row/col per
  seam when compositing.
"""

from __future__ import annotations

import re

import numpy as np

NODATA = -32768

__all__ = ["encode_hgt", "decode_hgt", "parse_hgt_name", "hgt_name",
           "NODATA"]


def parse_hgt_name(name: str) -> tuple[int, int]:
    """'N51E000.hgt' -> (lat_sw, lon_sw); S/W negate (:400-420)."""
    base = name.rsplit("/", 1)[-1]
    m = re.fullmatch(r"([NSns])(\d{2})([EWew])(\d{3})(\.hgts?)?", base)
    if m is None:
        raise ValueError(f"not an SRTM HGT name: {name!r}")
    lat = int(m.group(2))
    lon = int(m.group(4))
    if m.group(1).upper() == "S":
        lat = -lat
    if m.group(3).upper() == "W":
        lon = -lon
    return lat, lon


def hgt_name(lat_sw: int, lon_sw: int) -> str:
    ns = "N" if lat_sw >= 0 else "S"
    ew = "E" if lon_sw >= 0 else "W"
    return f"{ns}{abs(lat_sw):02d}{ew}{abs(lon_sw):03d}.hgt"


def encode_hgt(arr: np.ndarray) -> bytes:
    """(N, N) int16 north-up -> big-endian payload."""
    a = np.asarray(arr)
    if a.ndim != 2 or a.shape[0] != a.shape[1]:
        raise ValueError("HGT tiles are square")
    if a.shape[0] not in (1201, 3601):
        raise ValueError("HGT size must be 1201 or 3601")
    return a.astype(">i2").tobytes()


def decode_hgt(data: bytes, name: str) -> tuple[np.ndarray, dict]:
    """-> ((N, N) int16 north-up, georef dict with the reference's
    point-registered geotransform)."""
    n_samples = len(data) // 2
    n = int(round(n_samples ** 0.5))
    if n * n * 2 != len(data) or n not in (1201, 3601):
        raise ValueError(f"bad HGT payload size {len(data)}")
    arr = np.frombuffer(data, dtype=">i2").reshape(n, n)
    lat_sw, lon_sw = parse_hgt_name(name)
    geo = {
        "x0": lon_sw - 0.5 / (n - 1),
        "y0": lat_sw + 1 + 0.5 / (n - 1),
        "dx": 1.0 / (n - 1),
        "dy": -1.0 / (n - 1),
        "nodata": NODATA,
        "lat_sw": lat_sw,
        "lon_sw": lon_sw,
    }
    return arr, geo
