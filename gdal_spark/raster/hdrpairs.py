"""ERS (ERMapper) and ILWIS header+raw raster pairs — the remaining
ENVI-style sidecar formats.

Semantics re-derived from the reference drivers:

- ERS (/root/reference/frmts/ers/ersdataset.cpp): a nested-text
  header `DatasetHeader Begin ... End` with RasterInfo.NrOfLines /
  NrOfCellsPerLine / NrOfBands (:899-925), CellType names like
  Unsigned8BitInteger / Signed16BitInteger / IEEE4ByteReal
  (:953-975), CellInfo.Xdimension/Ydimension + RegistrationCoord
  for georeferencing (:551-564); raw data is BIL interleaved,
  ByteOrder LSBFirst.
- ILWIS (/root/reference/frmts/ilwis/ilwisdataset.cpp): an ODF ini
  (`[MapStore]` section with Data=<file>.mp#, Type=Byte|Int|Real,
  :424,:982-1010; `[Size]`-style rows/cols via [Map] Size) + raw
  row-major little-endian data in the .mp# companion.
"""

from __future__ import annotations

import numpy as np

__all__ = ["encode_ers", "decode_ers", "encode_ilwis", "decode_ilwis"]

_ERS_TYPES = {
    np.dtype(np.uint8): "Unsigned8BitInteger",
    np.dtype(np.int16): "Signed16BitInteger",
    np.dtype(np.uint16): "Unsigned16BitInteger",
    np.dtype(np.int32): "Signed32BitInteger",
    np.dtype(np.float32): "IEEE4ByteReal",
}
_ERS_DTYPES = {v: k for k, v in _ERS_TYPES.items()}


def encode_ers(arr: np.ndarray, geo: tuple | None = None
               ) -> tuple[bytes, str]:
    """(H,W) or (H,W,B) -> (raw BIL bytes, .ers header text)."""
    arr = np.asarray(arr)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, nb = arr.shape
    ct = _ERS_TYPES.get(arr.dtype)
    if ct is None:
        raise ValueError(f"ers: unsupported dtype {arr.dtype}")
    raw = np.moveaxis(arr, 2, 1).astype(
        arr.dtype.newbyteorder("<")
    ).tobytes()
    lines = [
        "DatasetHeader Begin",
        '\tVersion = "6.0"',
        "\tDataSetType = ERStorage",
        "\tDataType = Raster",
        "\tByteOrder = LSBFirst",
        "\tRasterInfo Begin",
        f"\t\tCellType = {ct}",
        f"\t\tNrOfLines = {h}",
        f"\t\tNrOfCellsPerLine = {w}",
        f"\t\tNrOfBands = {nb}",
    ]
    if geo is not None:
        gt = geo[0]
        if gt[2] != 0.0 or gt[4] != 0.0:
            raise ValueError("ers: rotated geotransforms unsupported")
        lines += [
            "\t\tCellInfo Begin",
            f"\t\t\tXdimension = {gt[1]!r}",
            f"\t\t\tYdimension = {abs(gt[5])!r}",
            "\t\tCellInfo End",
            "\t\tRegistrationCoord Begin",
            f"\t\t\tEastings = {gt[0]!r}",
            f"\t\t\tNorthings = {gt[3]!r}",
            "\t\tRegistrationCoord End",
        ]
    lines += ["\tRasterInfo End", "DatasetHeader End", ""]
    return raw, "\n".join(lines)


def _ers_find(text: str, key: str, default=None):
    for line in text.splitlines():
        s = line.strip()
        if s.startswith(key) and "=" in s:
            return s.split("=", 1)[1].strip().strip('"')
    return default


def decode_ers(raw: bytes, header: str):
    h = int(_ers_find(header, "NrOfLines"))
    w = int(_ers_find(header, "NrOfCellsPerLine"))
    nb = int(_ers_find(header, "NrOfBands", "1"))
    ct = _ers_find(header, "CellType", "Unsigned8BitInteger")
    dt = _ERS_DTYPES.get(ct)
    if dt is None:
        raise ValueError(f"ers: unknown CellType {ct!r}")
    arr = np.frombuffer(raw, dtype=dt.newbyteorder("<"),
                        count=h * w * nb).reshape(h, nb, w)
    out = np.moveaxis(arr, 1, 2)
    meta = {}
    xd = _ers_find(header, "Xdimension")
    if xd is not None:
        yd = float(_ers_find(header, "Ydimension"))
        e = float(_ers_find(header, "Eastings", "0"))
        n = float(_ers_find(header, "Northings", "0"))
        meta["geotransform"] = (e, float(xd), 0.0, n, 0.0, -yd)
    return out, meta


_ILWIS_TYPES = {
    np.dtype(np.uint8): "Byte",
    np.dtype(np.int32): "Int",
    np.dtype(np.float64): "Real",
}
_ILWIS_DTYPES = {"Byte": np.dtype("u1"), "Int": np.dtype("<i4"),
                 "Real": np.dtype("<f8")}


def encode_ilwis(arr: np.ndarray, name: str = "map"
                 ) -> tuple[bytes, str]:
    """(H,W) -> (.mp# raw bytes, .mpr ODF ini text)."""
    arr = np.asarray(arr)
    if arr.ndim != 2:
        raise ValueError("ilwis: single-band maps only")
    t = _ILWIS_TYPES.get(arr.dtype)
    if t is None:
        raise ValueError(f"ilwis: unsupported dtype {arr.dtype}")
    h, w = arr.shape
    raw = arr.astype(_ILWIS_DTYPES[t]).tobytes()
    odf = "\n".join(
        [
            "[Ilwis]",
            "Type=BaseMap",
            "[BaseMap]",
            "Type=Map",
            "[Map]",
            "Type=MapStore",
            f"Size={h} {w}",
            "[MapStore]",
            f"Data={name}.mp#",
            "Structure=Line",
            f"Type={t}",
            "",
        ]
    )
    return raw, odf


def decode_ilwis(raw: bytes, odf: str):
    kv = {}
    section = ""
    for line in odf.splitlines():
        s = line.strip()
        if s.startswith("["):
            section = s.strip("[]")
        elif "=" in s:
            k, v = s.split("=", 1)
            kv[f"{section}.{k.strip()}"] = v.strip()
    size = kv.get("Map.Size")
    if size is None or kv.get("MapStore.Type") is None:
        raise ValueError("ilwis: missing Map.Size / MapStore.Type")
    h, w = (int(v) for v in size.split())
    dt = _ILWIS_DTYPES[kv["MapStore.Type"]]
    return np.frombuffer(raw, dtype=dt, count=h * w).reshape(h, w), kv
