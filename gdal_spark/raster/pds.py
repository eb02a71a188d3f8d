"""PDS3 labeled raster codec (NASA Planetary Data System v3).

Semantics re-derived from the reference driver
(/root/reference/frmts/pds/pdsdataset.cpp):

- an ODL label of KEY = VALUE lines padded to RECORD_BYTES records,
  terminated by END; `^IMAGE = n` points at the 1-based record where
  pixel data starts (skip = (n-1) * RECORD_BYTES, :794-800, :973);
- the IMAGE object carries LINES / LINE_SAMPLES / BANDS /
  BAND_STORAGE_TYPE (BAND_SEQUENTIAL here) / SAMPLE_BITS /
  SAMPLE_TYPE (:882-1010); MSB_* types are big-endian, LSB_*/PC_*
  little (:1001-1015);
- SAMPLE_BITS 8 -> Byte, 16 -> (U)Int16 by UNSIGNED in SAMPLE_TYPE,
  32 -> Float32 (:1031-1056);
- value = raw * SCALING_FACTOR + OFFSET (:1069-1071).
"""

from __future__ import annotations

import numpy as np

__all__ = ["encode_pds", "decode_pds"]

_RECORD = 512


def _dtype_for(bits: int, sample_type: str):
    unsigned = "UNSIGNED" in sample_type
    be = not (
        sample_type.startswith("LSB") or sample_type.startswith("PC")
    )
    pre = ">" if be else "<"
    if bits == 8:
        return np.dtype("u1")
    if bits == 16:
        return np.dtype(pre + ("u2" if unsigned else "i2"))
    if bits == 32 and "REAL" in sample_type:
        return np.dtype(pre + "f4")
    if bits == 32:
        return np.dtype(pre + ("u4" if unsigned else "i4"))
    raise ValueError(f"pds: unsupported SAMPLE_BITS {bits}")


def encode_pds(arr: np.ndarray, scale: float = 1.0,
               offset: float = 0.0) -> bytes:
    """(H,W) or (H,W,B) -> attached-label PDS3 bytes
    (BAND_SEQUENTIAL, MSB sample types)."""
    arr = np.asarray(arr)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, nb = arr.shape
    if arr.dtype == np.uint8:
        st, bits, dt = "MSB_UNSIGNED_INTEGER", 8, np.dtype("u1")
    elif arr.dtype in (np.int16, np.int32, np.int64):
        st, bits, dt = "MSB_INTEGER", 16, np.dtype(">i2")
        if np.abs(arr).max(initial=0) > 0x7FFF:
            raise ValueError("pds: int data exceeds 16-bit range")
    elif arr.dtype in (np.float32, np.float64):
        st, bits, dt = "IEEE_REAL", 32, np.dtype(">f4")
    else:
        raise ValueError(f"pds: unsupported dtype {arr.dtype}")

    data = np.moveaxis(arr.astype(dt), 2, 0).tobytes()
    # label occupies whole records; data starts at the next record
    lines = [
        "PDS_VERSION_ID = PDS3",
        "RECORD_TYPE = FIXED_LENGTH",
        f"RECORD_BYTES = {_RECORD}",
        "LABEL_RECORDS = @LR@",
        "^IMAGE = @PTR@",
        "OBJECT = IMAGE",
        f"  LINES = {h}",
        f"  LINE_SAMPLES = {w}",
        f"  BANDS = {nb}",
        "  BAND_STORAGE_TYPE = BAND_SEQUENTIAL",
        f"  SAMPLE_BITS = {bits}",
        f"  SAMPLE_TYPE = {st}",
        f"  SCALING_FACTOR = {scale!r}",
        f"  OFFSET = {offset!r}",
        "END_OBJECT = IMAGE",
        "END",
        "",
    ]
    txt = "\r\n".join(lines)
    # fixed-point: placeholder lengths never change the record count
    lr = (len(txt) + _RECORD - 1) // _RECORD
    for _ in range(3):
        cand = txt.replace("@LR@", str(lr)).replace("@PTR@", str(lr + 1))
        new_lr = (len(cand) + _RECORD - 1) // _RECORD
        if new_lr == lr:
            txt = cand
            break
        lr = new_lr
    label = txt.encode().ljust(lr * _RECORD, b" ")
    return label + data


def _parse_label(data: bytes) -> dict:
    kv: dict = {}
    text = data.decode("ascii", errors="replace")
    obj = []
    for raw in text.split("\r\n"):
        line = raw.strip()
        if line == "END":
            break
        if "=" not in line:
            continue
        k, v = (s.strip() for s in line.split("=", 1))
        if k == "OBJECT":
            obj.append(v)
            continue
        if k == "END_OBJECT":
            if obj:
                obj.pop()
            continue
        kv[".".join(obj + [k])] = v.strip('"')
    return kv


def decode_pds(data: bytes):
    """PDS3 bytes -> ((H,W,B) array, meta dict); applies
    SCALING_FACTOR/OFFSET only when non-identity (returns raw ints
    otherwise)."""
    kv = _parse_label(data)
    if kv.get("PDS_VERSION_ID") != "PDS3":
        raise ValueError("pds: missing PDS_VERSION_ID = PDS3")
    record = int(kv.get("RECORD_BYTES", "0") or 1)
    ptr = kv.get("^IMAGE")
    if ptr is None:
        raise ValueError("pds: no ^IMAGE pointer")
    if "<BYTES>" in ptr:
        skip = int(ptr.split("<")[0].strip("( ")) - 1
    else:
        skip = (int(ptr) - 1) * record
    h = int(kv["IMAGE.LINES"])
    w = int(kv["IMAGE.LINE_SAMPLES"])
    nb = int(kv.get("IMAGE.BANDS", "1"))
    storage = kv.get("IMAGE.BAND_STORAGE_TYPE", "BAND_SEQUENTIAL")
    if nb > 1 and storage != "BAND_SEQUENTIAL":
        raise ValueError(f"pds: unsupported BAND_STORAGE_TYPE {storage}")
    bits = int(kv["IMAGE.SAMPLE_BITS"])
    st = kv.get("IMAGE.SAMPLE_TYPE", "MSB_INTEGER")
    dt = _dtype_for(bits, st)
    n = h * w * nb
    raw = np.frombuffer(data, dtype=dt, count=n, offset=skip)
    arr = np.moveaxis(raw.reshape(nb, h, w), 0, 2)
    scale = float(kv.get("IMAGE.SCALING_FACTOR", "1.0"))
    off = float(kv.get("IMAGE.OFFSET", "0.0"))
    meta = {"scale": scale, "offset": off, "sample_type": st}
    if scale != 1.0 or off != 0.0:
        return arr.astype(np.float64) * scale + off, meta
    return arr, meta
