"""NTv2 datum-shift grid (.gsb) writer/reader — pure struct+numpy.

Wire format re-derived from /root/reference/frmts/raw/ntv2dataset.cpp:

- 11 overview records of 16 bytes each (8-char ASCII label + 8-byte
  value): NUM_OREC, NUM_SREC, NUM_FILE, GS_TYPE, VERSION, SYSTEM_F,
  SYSTEM_T, MAJOR_F, MINOR_F, MAJOR_T, MINOR_T (:30-58 hexdump,
  knREGULAR_RECORD_SIZE=16 :71).
- Per subgrid: 11 more records (SUB_NAME, PARENT, CREATED, UPDATED,
  S_LAT, N_LAT, E_LONG, W_LONG, LAT_INC, LONG_INC, GS_COUNT) followed
  by GS_COUNT nodes of 4 float32 (lat shift, lon shift, lat accuracy,
  lon accuracy), shifts in ARC-SECONDS (:62-66).
- Longitudes are stored POSITIVE WEST — the reader negates E_LONG /
  W_LONG to get east-positive values (:443-444; band metadata
  positive_value=west :492).
- Node order: the FIRST node is the south-EAST corner, scanlines run
  east->west, rows south->north (:64-67); grid size
  nx = floor((e - w)/long_inc + 1.5), ny likewise (:449-456).
- next subgrid starts at (11 + GS_COUNT) records (:401).

`read_ntv2` returns each subgrid re-oriented conventionally:
arrays indexed [a, b] with a = 0 at the SOUTH edge increasing north
and b = 0 at the WEST edge increasing east (the GDAL dataset view
flips both axes, :470-490; we keep south-up to match the closed-form
fixtures — the orientation is documented, not hidden).
"""

from __future__ import annotations

import struct
from dataclasses import dataclass

import numpy as np

RECORD = 16


@dataclass
class SubGrid:
    name: str
    parent: str
    s_lat: float      # arc-seconds, north-positive
    n_lat: float
    w_long: float     # arc-seconds, EAST-positive (conventional)
    e_long: float
    lat_inc: float
    long_inc: float
    lat_shift: np.ndarray   # [a, b] float32 arc-seconds (a: S->N, b: W->E)
    lon_shift: np.ndarray   # [a, b] float32 arc-seconds, POSITIVE WEST
    lat_acc: np.ndarray
    lon_acc: np.ndarray

    @property
    def nx(self) -> int:
        return int(np.floor((self.e_long - self.w_long) / self.long_inc + 1.5))

    @property
    def ny(self) -> int:
        return int(np.floor((self.n_lat - self.s_lat) / self.lat_inc + 1.5))


def _srec(label: str, text: str) -> bytes:
    return label.ljust(8).encode()[:8] + text.ljust(8).encode()[:8]


def _irec(label: str, value: int) -> bytes:
    return label.ljust(8).encode()[:8] + struct.pack("<i", value) + b"\x00" * 4


def _drec(label: str, value: float) -> bytes:
    return label.ljust(8).encode()[:8] + struct.pack("<d", value)


def write_ntv2(
    path: str,
    grids: list[SubGrid],
    system_f: str = "NTF",
    system_t: str = "RGF93",
    version: str = "SYNTH01",
    major_f: float = 6378249.2,
    minor_f: float = 6356515.0,
    major_t: float = 6378137.0,
    minor_t: float = 6356752.314,
) -> None:
    out = bytearray()
    out += _irec("NUM_OREC", 11)
    out += _irec("NUM_SREC", 11)
    out += _irec("NUM_FILE", len(grids))
    out += _srec("GS_TYPE", "SECONDS")
    out += _srec("VERSION", version)
    out += _srec("SYSTEM_F", system_f)
    out += _srec("SYSTEM_T", system_t)
    out += _drec("MAJOR_F", major_f)
    out += _drec("MINOR_F", minor_f)
    out += _drec("MAJOR_T", major_t)
    out += _drec("MINOR_T", minor_t)
    for g in grids:
        ny, nx = g.lat_shift.shape
        assert (nx, ny) == (g.nx, g.ny), "array shape vs header mismatch"
        out += _srec("SUB_NAME", g.name)
        out += _srec("PARENT", g.parent)
        out += _srec("CREATED", "01/01/21")
        out += _srec("UPDATED", "")
        out += _drec("S_LAT", g.s_lat)
        out += _drec("N_LAT", g.n_lat)
        # stored positive-west: negate the east-positive edges (:443)
        out += _drec("E_LONG", -g.e_long)
        out += _drec("W_LONG", -g.w_long)
        out += _drec("LAT_INC", g.lat_inc)
        out += _drec("LONG_INC", g.long_inc)
        out += _irec("GS_COUNT", nx * ny)
        # node order: first = SOUTH-EAST corner, east->west, S->N rows
        nodes = np.empty((ny, nx, 4), dtype="<f4")
        nodes[:, :, 0] = g.lat_shift[:, ::-1]
        nodes[:, :, 1] = g.lon_shift[:, ::-1]
        nodes[:, :, 2] = g.lat_acc[:, ::-1]
        nodes[:, :, 3] = g.lon_acc[:, ::-1]
        out += nodes.tobytes()
    tmp = path + ".tmp"
    with open(tmp, "wb") as fh:
        fh.write(bytes(out))
    import os

    os.replace(tmp, path)


def read_ntv2(path: str) -> tuple[dict, list[SubGrid]]:
    with open(path, "rb") as fh:
        data = fh.read()

    def label(off: int) -> str:
        return data[off : off + 8].decode("ascii", "replace").strip()

    def ival(off: int) -> int:
        return struct.unpack_from("<i", data, off + 8)[0]

    def dval(off: int) -> float:
        return struct.unpack_from("<d", data, off + 8)[0]

    def sval(off: int) -> str:
        return data[off + 8 : off + 16].decode("ascii", "replace").strip()

    if label(0) != "NUM_OREC":
        raise ValueError("not an NTv2 file (missing NUM_OREC)")
    n_orec = ival(0)
    n_srec = ival(RECORD)
    n_file = ival(2 * RECORD)
    header = {
        "GS_TYPE": sval(3 * RECORD),
        "VERSION": sval(4 * RECORD),
        "SYSTEM_F": sval(5 * RECORD),
        "SYSTEM_T": sval(6 * RECORD),
        "MAJOR_F": dval(7 * RECORD),
        "MINOR_F": dval(8 * RECORD),
        "MAJOR_T": dval(9 * RECORD),
        "MINOR_T": dval(10 * RECORD),
    }
    grids: list[SubGrid] = []
    off = n_orec * RECORD
    for _ in range(n_file):
        name = sval(off)
        parent = sval(off + RECORD)
        s_lat = dval(off + 4 * RECORD)
        n_lat = dval(off + 5 * RECORD)
        e_long = -dval(off + 6 * RECORD)   # to east-positive (:443)
        w_long = -dval(off + 7 * RECORD)
        lat_inc = dval(off + 8 * RECORD)
        long_inc = dval(off + 9 * RECORD)
        gs_count = ival(off + 10 * RECORD)
        nx = int(np.floor((e_long - w_long) / long_inc + 1.5))
        ny = int(np.floor((n_lat - s_lat) / lat_inc + 1.5))
        if nx * ny != gs_count:
            raise ValueError(f"GS_COUNT {gs_count} != {nx}*{ny}")
        off += n_srec * RECORD
        nodes = np.frombuffer(
            data, dtype="<f4", count=gs_count * 4, offset=off
        ).reshape(ny, nx, 4)
        grids.append(
            SubGrid(
                name=name,
                parent=parent,
                s_lat=s_lat,
                n_lat=n_lat,
                w_long=w_long,
                e_long=e_long,
                lat_inc=lat_inc,
                long_inc=long_inc,
                lat_shift=nodes[:, ::-1, 0].copy(),
                lon_shift=nodes[:, ::-1, 1].copy(),
                lat_acc=nodes[:, ::-1, 2].copy(),
                lon_acc=nodes[:, ::-1, 3].copy(),
            )
        )
        off += gs_count * RECORD
    return header, grids
