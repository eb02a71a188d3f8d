"""FITS codec — the astronomy standard's primary HDU.

Semantics re-derived from the reference driver
(/root/reference/frmts/fits/fitsdataset.cpp) and the public FITS 4.0
standard: the header is 80-byte keyword cards ("KEYWORD = value")
packed into 2880-byte blocks ending with an END card; data follow
as BIG-endian values (BITPIX 8/16/32 ints, -32/-64 IEEE floats),
padded to a 2880 multiple; physical = BZERO + BSCALE * stored.
NAXIS1 is the fastest-varying (width) axis; rows are stored
bottom-up in FITS convention and the reference flips them
(fitsdataset.cpp IReadBlock reads line nRasterYSize-1-nBlockYOff).
"""

from __future__ import annotations

import numpy as np

__all__ = ["encode_fits", "decode_fits"]

_BLOCK = 2880

_BITPIX = {
    np.dtype("u1"): 8,
    np.dtype(">i2"): 16,
    np.dtype(">i4"): 32,
    np.dtype(">f4"): -32,
    np.dtype(">f8"): -64,
}


def _card(key: str, value=None, comment: str = "") -> bytes:
    if value is None:
        return key.ljust(80)[:80].encode()
    if isinstance(value, bool):
        v = "T" if value else "F"
        s = f"{key:<8}= {v:>20}"
    elif isinstance(value, (int, float)):
        s = f"{key:<8}= {value!r:>20}"
    else:
        s = f"{key:<8}= '{value}'"
    if comment:
        s += f" / {comment}"
    return s.ljust(80)[:80].encode()


def encode_fits(arr: np.ndarray, bzero: float = 0.0,
                bscale: float = 1.0) -> bytes:
    """(H,W) -> FITS bytes (primary HDU).  Stored = (phys - bzero)
    / bscale must be exact for the given dtype."""
    arr = np.asarray(arr)
    if arr.ndim != 2:
        raise ValueError("fits: single-HDU (H,W) arrays only")
    if arr.dtype == np.uint8:
        dt = np.dtype("u1")
    elif arr.dtype in (np.int16,):
        dt = np.dtype(">i2")
    elif arr.dtype in (np.int32, np.int64):
        dt = np.dtype(">i4")
    elif arr.dtype == np.float32:
        dt = np.dtype(">f4")
    elif arr.dtype == np.float64:
        dt = np.dtype(">f8")
    else:
        raise ValueError(f"fits: unsupported dtype {arr.dtype}")
    h, w = arr.shape
    cards = [
        _card("SIMPLE", True, "conforms to FITS standard"),
        _card("BITPIX", _BITPIX[dt]),
        _card("NAXIS", 2),
        _card("NAXIS1", w),
        _card("NAXIS2", h),
        _card("BZERO", float(bzero)),
        _card("BSCALE", float(bscale)),
        _card("END"),
    ]
    hdr = b"".join(cards)
    hdr += b" " * ((-len(hdr)) % _BLOCK)
    stored = (arr.astype(np.float64) - bzero) / bscale
    if dt.kind in "iu":
        si = np.floor(stored + 0.5).astype(np.int64)
        if np.abs(stored - si).max(initial=0) > 1e-9:
            raise ValueError("fits: data not exact at BSCALE/BZERO")
        data = si.astype(dt)[::-1, :].tobytes()   # FITS rows bottom-up
    else:
        data = stored.astype(dt)[::-1, :].tobytes()
    data += b"\x00" * ((-len(data)) % _BLOCK)
    return hdr + data


def decode_fits(data: bytes):
    """FITS bytes -> ((H,W) north-up array, meta dict)."""
    kv = {}
    pos = 0
    while True:
        card = data[pos:pos + 80].decode("ascii", errors="replace")
        pos += 80
        key = card[:8].strip()
        if key == "END":
            break
        if "=" in card:
            val = card[10:].split("/")[0].strip()
            kv[key] = val
        if pos >= len(data):
            raise ValueError("fits: no END card")
    if kv.get("SIMPLE") != "T":
        raise ValueError("fits: missing SIMPLE = T")
    pos = (pos + _BLOCK - 1) // _BLOCK * _BLOCK
    bitpix = int(kv["BITPIX"])
    w = int(kv["NAXIS1"])
    h = int(kv["NAXIS2"])
    bzero = float(kv.get("BZERO", "0"))
    bscale = float(kv.get("BSCALE", "1"))
    dt = {8: "u1", 16: ">i2", 32: ">i4", -32: ">f4", -64: ">f8"}[bitpix]
    raw = np.frombuffer(data, dtype=np.dtype(dt), count=h * w,
                        offset=pos).reshape(h, w)[::-1, :]
    meta = {"bitpix": bitpix, "bzero": bzero, "bscale": bscale}
    if bzero == 0.0 and bscale == 1.0:
        return raw.copy(), meta
    return raw.astype(np.float64) * bscale + bzero, meta
