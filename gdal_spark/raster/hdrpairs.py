"""ERS (ERMapper), ILWIS, EHdr (ESRI BIL) and SAGA header+raw raster
pairs — the ENVI-style sidecar formats.

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
- EHdr (/root/reference/frmts/raw/ehdrdataset.cpp): whitespace
  key/value .hdr (NROWS/NCOLS/NBANDS at :1060-1068, NBITS :1079,
  PIXELTYPE :1083, BYTEORDER I|M :1089, LAYOUT BIL|BIP|BSQ :1070,
  ULXMAP/ULYMAP = CENTER of the UL pixel + XDIM/YDIM :640-647,
  CELLSIZE sets both dims); the reference writer emits BYTEORDER I
  + LAYOUT BIL (:1712-1713).
- SAGA (/root/reference/frmts/saga/sagadataset.cpp): tab-aligned
  .sgrd keys (WriteHeader :780-833 — DATAFORMAT names, BYTEORDER_BIG,
  POSITION_XMIN/YMIN = CENTER of the LOWER-LEFT cell, CELLCOUNT_X/Y,
  CELLSIZE, NODATA_VALUE, TOPTOBOTTOM); the .sdat raster is stored
  BOTTOM-TO-TOP (TOPTOBOTTOM=TRUE is rejected, :545-551), single
  band, little-endian unless BYTEORDER_BIG.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "encode_ers", "decode_ers", "encode_ilwis", "decode_ilwis",
    "encode_ehdr", "decode_ehdr", "encode_saga", "decode_saga",
    "encode_paux", "decode_paux",
]

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


# ---------------------------------------------------------------------------
# EHdr (ESRI BIL .hdr) — frmts/raw/ehdrdataset.cpp
# ---------------------------------------------------------------------------

_EHDR_DTYPES = {
    (8, "UNSIGNEDINT"): np.dtype("u1"),
    (16, "SIGNEDINT"): np.dtype("i2"),
    (16, "UNSIGNEDINT"): np.dtype("u2"),
    (32, "SIGNEDINT"): np.dtype("i4"),
    (32, "UNSIGNEDINT"): np.dtype("u4"),
    (32, "FLOAT"): np.dtype("f4"),
}
_EHDR_TYPES = {v: k for k, v in _EHDR_DTYPES.items()}


def encode_ehdr(arr: np.ndarray, geo: tuple | None = None
                ) -> tuple[bytes, str]:
    """(H,W) or (H,W,B) -> (.bil raw bytes, .hdr text) — the
    reference writer's shape: BYTEORDER I, LAYOUT BIL
    (ehdrdataset.cpp:1712-1728)."""
    arr = np.asarray(arr)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, nb = arr.shape
    tk = _EHDR_TYPES.get(arr.dtype)
    if tk is None:
        raise ValueError(f"ehdr: unsupported dtype {arr.dtype}")
    nbits, ptype = tk
    raw = np.moveaxis(arr, 2, 1).astype(
        arr.dtype.newbyteorder("<")
    ).tobytes()
    lines = [
        "BYTEORDER      I",
        "LAYOUT         BIL",
        f"NROWS          {h}",
        f"NCOLS          {w}",
        f"NBANDS         {nb}",
        f"NBITS          {nbits}",
        f"BANDROWBYTES   {w * (nbits // 8)}",
        f"TOTALROWBYTES  {nb * w * (nbits // 8)}",
        f"PIXELTYPE      {ptype}",
    ]
    if geo is not None:
        gt = geo[0]
        if gt[2] != 0.0 or gt[4] != 0.0:
            raise ValueError("ehdr: rotated geotransforms unsupported")
        # ULXMAP/ULYMAP are the CENTER of the UL pixel (:640-647)
        lines += [
            f"ULXMAP         {gt[0] + gt[1] / 2.0!r}",
            f"ULYMAP         {gt[3] + gt[5] / 2.0!r}",
            f"XDIM           {gt[1]!r}",
            f"YDIM           {abs(gt[5])!r}",
        ]
    return raw, "\n".join(lines) + "\n"


def decode_ehdr(raw: bytes, header: str):
    kv = {}
    for line in header.splitlines():
        toks = line.split()
        if len(toks) >= 2:
            kv[toks[0].upper()] = toks[1]
    h, w = int(kv["NROWS"]), int(kv["NCOLS"])
    nb = int(kv.get("NBANDS", "1"))
    nbits = int(kv.get("NBITS", "8"))
    ptype = kv.get(
        "PIXELTYPE", "UNSIGNEDINT" if nbits == 8 else "SIGNEDINT"
    ).upper()
    dt = _EHDR_DTYPES.get((nbits, ptype))
    if dt is None:
        raise ValueError(f"ehdr: unsupported NBITS={nbits}/{ptype}")
    dt = dt.newbyteorder(
        ">" if kv.get("BYTEORDER", "I").upper().startswith("M") else "<"
    )
    layout = kv.get("LAYOUT", "BIL").upper()
    a = np.frombuffer(raw, dtype=dt, count=h * w * nb)
    if layout == "BIL":
        out = np.moveaxis(a.reshape(h, nb, w), 1, 2)
    elif layout == "BIP":
        out = a.reshape(h, w, nb)
    elif layout == "BSQ":
        out = np.moveaxis(a.reshape(nb, h, w), 0, 2)
    else:
        raise ValueError(f"ehdr: unknown LAYOUT {layout!r}")
    meta = {}
    if "ULXMAP" in kv:
        xd = float(kv.get("XDIM", kv.get("CELLSIZE", "1")))
        yd = float(kv.get("YDIM", kv.get("CELLSIZE", "1")))
        meta["geotransform"] = (
            float(kv["ULXMAP"]) - xd / 2.0, xd, 0.0,
            float(kv["ULYMAP"]) + yd / 2.0, 0.0, -yd,
        )
    return out, meta


# ---------------------------------------------------------------------------
# SAGA (.sgrd / .sdat) — frmts/saga/sagadataset.cpp
# ---------------------------------------------------------------------------

_SAGA_FORMATS = {
    np.dtype("u1"): "BYTE_UNSIGNED",
    np.dtype("i2"): "SHORTINT",
    np.dtype("u2"): "SHORTINT_UNSIGNED",
    np.dtype("i4"): "INTEGER",
    np.dtype("u4"): "INTEGER_UNSIGNED",
    np.dtype("f4"): "FLOAT",
    np.dtype("f8"): "DOUBLE",
}
_SAGA_DTYPES = {v: k for k, v in _SAGA_FORMATS.items()}


def encode_saga(arr: np.ndarray, name: str = "grid",
                xmin_center: float = 0.0, ymin_center: float = 0.0,
                cellsize: float = 1.0, nodata: float = -99999.0
                ) -> tuple[bytes, str]:
    """(H,W) -> (.sdat raw bytes BOTTOM-TO-TOP, .sgrd header text) —
    WriteHeader's exact key set (sagadataset.cpp:780-833)."""
    arr = np.asarray(arr)
    if arr.ndim != 2:
        raise ValueError("saga: single-band grids only")
    fmt = _SAGA_FORMATS.get(arr.dtype)
    if fmt is None:
        raise ValueError(f"saga: unsupported dtype {arr.dtype}")
    raw = arr[::-1].astype(arr.dtype.newbyteorder("<")).tobytes()
    h, w = arr.shape
    hdr = "".join(
        [
            f"NAME\t= {name}\n",
            "DESCRIPTION\t=\n",
            "UNIT\t=\n",
            "DATAFILE_OFFSET\t= 0\n",
            f"DATAFORMAT\t= {fmt}\n",
            "BYTEORDER_BIG\t= FALSE\n",
            f"POSITION_XMIN\t= {xmin_center:.10f}\n",
            f"POSITION_YMIN\t= {ymin_center:.10f}\n",
            f"CELLCOUNT_X\t= {w}\n",
            f"CELLCOUNT_Y\t= {h}\n",
            f"CELLSIZE\t= {cellsize:.10f}\n",
            "Z_FACTOR\t= 1.000000\n",
            f"NODATA_VALUE\t= {nodata:f}\n",
            "TOPTOBOTTOM\t= FALSE\n",
        ]
    )
    return raw, hdr


def decode_saga(raw: bytes, header: str):
    kv = {}
    for line in header.splitlines():
        if "=" in line:
            k, v = line.split("=", 1)
            kv[k.strip().upper()] = v.strip()
    if kv.get("TOPTOBOTTOM", "FALSE").upper().startswith("T"):
        # sagadataset.cpp:545-551 — the reference rejects these
        raise ValueError("saga: TOPTOBOTTOM grids unsupported")
    w, h = int(kv["CELLCOUNT_X"]), int(kv["CELLCOUNT_Y"])
    dt = _SAGA_DTYPES.get(kv.get("DATAFORMAT", "FLOAT"))
    if dt is None:
        raise ValueError(f"saga: unknown DATAFORMAT {kv.get('DATAFORMAT')!r}")
    if kv.get("BYTEORDER_BIG", "FALSE").upper().startswith("T"):
        dt = dt.newbyteorder(">")
    else:
        dt = dt.newbyteorder("<")
    arr = np.frombuffer(raw, dtype=dt, count=h * w).reshape(h, w)[::-1]
    cs = float(kv.get("CELLSIZE", "1"))
    meta = {
        "nodata": float(kv.get("NODATA_VALUE", "nan")),
        "geotransform": (
            float(kv.get("POSITION_XMIN", "0")) - cs / 2.0, cs, 0.0,
            float(kv.get("POSITION_YMIN", "0")) - cs / 2.0 + cs * h,
            0.0, -cs,
        ),
    }
    return arr, meta


# ---------------------------------------------------------------------------
# PAux (PCI .aux sidecar) — frmts/raw/pauxdataset.cpp
# ---------------------------------------------------------------------------
# .aux text: "AuxilaryTarget: <rawfile>" (:545), "RawDefinition: W H
# nbands" (:567-588), per band "ChanDefinition-N: <type> <offset>
# <pixoffset> <lineoffset> [Swapped|Unswapped]" (:631-669) with types
# 16U/16S/32R and 8U default; "Swapped" marks little-endian bytes
# (the :660 native test on CPL_LSB hosts).

_PAUX_TYPES = {
    np.dtype("u1"): "8U",
    np.dtype("u2"): "16U",
    np.dtype("i2"): "16S",
    np.dtype("f4"): "32R",
}
_PAUX_DTYPES = {v: k for k, v in _PAUX_TYPES.items()}


def encode_paux(bands: list[np.ndarray], target: str = "raw.img"
                ) -> tuple[bytes, str]:
    """[per-band 2-D arrays, mixed dtypes] -> (raw bytes, .aux text).
    Bands pack band-sequential at explicit offsets, little-endian."""
    if not bands:
        raise ValueError("paux: no bands")
    h, w = bands[0].shape
    lines = [f"AuxilaryTarget: {target}",
             f"RawDefinition: {w} {h} {len(bands)}"]
    raw = bytearray()
    for i, b in enumerate(bands):
        b = np.asarray(b)
        if b.shape != (h, w):
            raise ValueError("paux: band shape mismatch")
        t = _PAUX_TYPES.get(b.dtype)
        if t is None:
            raise ValueError(f"paux: unsupported dtype {b.dtype}")
        sz = b.dtype.itemsize
        lines.append(
            f"ChanDefinition-{i + 1}: {t} {len(raw)} {sz} {w * sz} Swapped"
        )
        raw += b.astype(b.dtype.newbyteorder("<")).tobytes()
    return bytes(raw), "\n".join(lines) + "\n"


def decode_paux(raw: bytes, aux: str):
    """-> list of per-band 2-D arrays (mixed dtypes preserved)."""
    kv = {}
    for line in aux.splitlines():
        if ":" in line:
            k, v = line.split(":", 1)
            kv[k.strip()] = v.strip()
    if "RawDefinition" not in kv:
        raise ValueError("paux: RawDefinition missing")
    w, h, nb = (int(t) for t in kv["RawDefinition"].split())
    out = []
    for i in range(nb):
        toks = kv[f"ChanDefinition-{i + 1}"].split()
        dt = _PAUX_DTYPES.get(toks[0], np.dtype("u1"))
        off, pix, line_off = int(toks[1]), int(toks[2]), int(toks[3])
        if len(toks) > 4 and toks[4] == "Unswapped":
            dt = dt.newbyteorder(">")
        else:
            dt = dt.newbyteorder("<")
        if pix != dt.itemsize or line_off != w * dt.itemsize:
            raise ValueError("paux: non-contiguous channel layouts "
                             "unsupported")
        out.append(
            np.frombuffer(raw, dtype=dt, count=h * w,
                          offset=off).reshape(h, w)
        )
    return out
