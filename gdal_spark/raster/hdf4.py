"""HDF4 (Hierarchical Data Format v4) scientific-dataset codec.

Layout from the public "HDF Specification and Developer's Guide"
(HDF 4.2, NCSA/The HDF Group): magic 0x0E031301, chained DD blocks
(ndd:int16be, next:uint32be, then 12-byte DDs tag/ref/offset/length,
all big-endian), and the DFSD object family GDAL's HDF4 driver
surfaces as subdatasets (frmts/hdf4/hdf4dataset.cpp reads these via
libdf; this module re-implements the container from the spec — the
reference links the external library rather than parsing bytes):

- DFTAG_VERSION (30): library-version stamp.
- DFTAG_NT (106): number type — version 1, DFNT type code, bit
  width, class (IEEE / big-endian MBO).
- DFTAG_SDD (701): rank:uint16, dims rank x uint32, then (tag,ref)
  of the data NT followed by rank scale-NT (tag,ref) pairs.
- DFTAG_SD (702): the raw array, big-endian, C row-major.
- DFTAG_NDG (720): numeric data group — (tag,ref) member list
  tying one SDD + SD together; one NDG per dataset.

Scope: int8/uint8/int16/uint16/int32/float32/float64 arrays of any
rank, multiple datasets per file, full roundtrip.  Unknown tags are
skipped on read (per the spec's forward-compatibility rule); V-group
(SD-API) attribute vdatas are out of scope.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["encode_hdf4", "decode_hdf4", "is_hdf4"]

_MAGIC = b"\x0e\x03\x13\x01"

DFTAG_NULL = 1
DFTAG_VERSION = 30
DFTAG_NT = 106
DFTAG_SDD = 701
DFTAG_SD = 702
DFTAG_NDG = 720

# DFNT codes (hntdefs.h, public)
_DFNT = {
    "f4": (5, 32),   # FLOAT32
    "f8": (6, 64),   # FLOAT64
    "i1": (20, 8),   # INT8
    "u1": (21, 8),   # UINT8
    "i2": (22, 16),  # INT16
    "u2": (23, 16),  # UINT16
    "i4": (24, 32),  # INT32
    "u4": (25, 32),  # UINT32
}
_DFNT_NP = {code: key for key, (code, _) in _DFNT.items()}


def is_hdf4(data: bytes) -> bool:
    return data[:4] == _MAGIC


def encode_hdf4(arrays: list[np.ndarray]) -> bytes:
    """arrays (any rank, dtypes in the DFNT table) -> HDF4 bytes;
    one NDG-grouped scientific dataset per array."""
    objs: list[tuple[int, int, bytes]] = []  # (tag, ref, payload)
    ref = 1
    objs.append((DFTAG_VERSION, ref, struct.pack(">III", 4, 2, 0) + b"gdal_spark"))
    for arr in arrays:
        a = np.ascontiguousarray(arr)
        key = a.dtype.str.lstrip("<>=|")
        if key not in _DFNT:
            raise ValueError(f"hdf4: dtype {a.dtype} unsupported")
        code, bits = _DFNT[key]
        nt_ref = ref + 1
        sdd_ref = ref + 2
        sd_ref = ref + 3
        objs.append((DFTAG_NT, nt_ref, struct.pack(">BBBB", 1, code, bits, 1)))
        sdd = struct.pack(">H", a.ndim)
        sdd += b"".join(struct.pack(">I", d) for d in a.shape)
        sdd += struct.pack(">HH", DFTAG_NT, nt_ref)
        sdd += struct.pack(">HH", DFTAG_NT, nt_ref) * a.ndim  # scale NTs
        objs.append((DFTAG_SDD, sdd_ref, sdd))
        objs.append((DFTAG_SD, sd_ref, a.astype(">" + key).tobytes()))
        ndg = struct.pack(">HHHH", DFTAG_SDD, sdd_ref, DFTAG_SD, sd_ref)
        objs.append((DFTAG_NDG, ref, ndg))
        ref += 4

    ndd = len(objs)
    header_len = 4 + 2 + 4 + 12 * ndd
    out = bytearray(_MAGIC)
    out += struct.pack(">hI", ndd, 0)  # one DD block, no chain
    off = header_len
    dds, payloads = [], []
    for tag, r, payload in objs:
        dds.append(struct.pack(">HHII", tag, r, off, len(payload)))
        payloads.append(payload)
        off += len(payload)
    out += b"".join(dds) + b"".join(payloads)
    return bytes(out)


def decode_hdf4(data: bytes) -> tuple[list[np.ndarray], dict]:
    """-> (arrays in NDG order, meta {types: [dtype keys]})."""
    data = bytes(data)
    if not is_hdf4(data):
        raise ValueError("hdf4: bad magic")
    # walk the DD chain
    dds: dict[tuple[int, int], tuple[int, int]] = {}
    order: list[tuple[int, int]] = []
    pos = 4
    while True:
        ndd, nxt = struct.unpack_from(">hI", data, pos)
        for k in range(ndd):
            tag, ref, off, length = struct.unpack_from(
                ">HHII", data, pos + 6 + 12 * k
            )
            if tag != DFTAG_NULL:
                dds[(tag, ref)] = (off, length)
                order.append((tag, ref))
        if nxt == 0:
            break
        pos = nxt

    arrays, types = [], []
    for tag, ref in order:
        if tag != DFTAG_NDG:
            continue
        off, length = dds[(tag, ref)]
        members = [
            struct.unpack_from(">HH", data, off + 4 * k)
            for k in range(length // 4)
        ]
        sdd_ref = sd_ref = None
        for mtag, mref in members:
            if mtag == DFTAG_SDD:
                sdd_ref = mref
            elif mtag == DFTAG_SD:
                sd_ref = mref
        if sdd_ref is None or sd_ref is None:
            raise ValueError(f"hdf4: NDG {ref} lacks SDD/SD members")
        soff, slen = dds[(DFTAG_SDD, sdd_ref)]
        rank = struct.unpack_from(">H", data, soff)[0]
        dims = struct.unpack_from(f">{rank}I", data, soff + 2)
        nt_tag, nt_ref = struct.unpack_from(">HH", data, soff + 2 + 4 * rank)
        if nt_tag != DFTAG_NT:
            raise ValueError("hdf4: SDD data-NT pointer is not an NT")
        ntoff, _ = dds[(DFTAG_NT, nt_ref)]
        ver, code, bits, _cls = struct.unpack_from(">BBBB", data, ntoff)
        if ver != 1 or code not in _DFNT_NP:
            raise ValueError(f"hdf4: number type {code} unsupported")
        key = _DFNT_NP[code]
        if int(np.dtype(key).itemsize) * 8 != bits:
            raise ValueError("hdf4: NT width disagrees with type code")
        doff, dlen = dds[(DFTAG_SD, sd_ref)]
        n = int(np.prod(dims))
        arr = np.frombuffer(data, dtype=">" + key, count=n, offset=doff)
        arrays.append(arr.reshape(dims).astype(key))
        types.append(key)
    return arrays, {"types": types}
