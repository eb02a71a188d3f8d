"""ISIS3 cube (.cub) codec — the USGS planetary format.

Semantics re-derived from the reference driver
(/root/reference/frmts/pds/isis3dataset.cpp):

- PVL label (Object/Group nesting, dotted keyword lookup like
  GetKeyword("IsisCube.Core.Dimensions.Samples"), :1733-1735) at the
  file head; pixel data begins at the 1-based
  ``IsisCube.Core.StartByte`` (:1699).
- ``Core.Format`` is BandSequential or Tile (:1706-1716); Tile
  storage is band-major full PADDED tiles, offset = first +
  (band-1)*blocksPerColumn*yTileOff + tileY*yTileOff + tileX*xTileOff
  with xTileOff = tile bytes and yTileOff = xTileOff * blocksPerRow
  (ISISTiledBand::ISISTiledBand, :389-430).
- ``Pixels.Type`` in {UnsignedByte, UnsignedWord, SignedWord, Real}
  (:1741-1766), ``ByteOrder`` Lsb/Msb (:1773), ``Base``/``Multiplier``
  surface as offset/scale metadata, never applied to pixels.
"""

from __future__ import annotations

import numpy as np

__all__ = ["encode_isis3", "decode_isis3"]

_TYPES = {
    np.dtype("u1"): "UnsignedByte",
    np.dtype("u2"): "UnsignedWord",
    np.dtype("i2"): "SignedWord",
    np.dtype("f4"): "Real",
}
_DTYPES = {v: k for k, v in _TYPES.items()}


def encode_isis3(arr: np.ndarray, fmt: str = "BandSequential",
                 tile: tuple[int, int] = (128, 128),
                 base: float = 0.0, multiplier: float = 1.0) -> bytes:
    """(H,W) or (H,W,B) -> .cub bytes (label + core)."""
    arr = np.asarray(arr)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, nb = arr.shape
    t = _TYPES.get(arr.dtype)
    if t is None:
        raise ValueError(f"isis3: unsupported dtype {arr.dtype}")
    if fmt == "BandSequential":
        core = np.moveaxis(arr, 2, 0).astype(
            arr.dtype.newbyteorder("<")
        ).tobytes()
        tile_lines = []
    elif fmt == "Tile":
        tw, th = tile
        bpr = -(-w // tw)
        bpc = -(-h // th)
        pad = np.zeros((bpc * th, bpr * tw, nb), dtype=arr.dtype)
        pad[:h, :w] = arr
        chunks = []
        for b in range(nb):          # band-major, then tileY, tileX
            for ty in range(bpc):
                for tx in range(bpr):
                    chunks.append(
                        pad[ty * th:(ty + 1) * th,
                            tx * tw:(tx + 1) * tw, b]
                        .astype(arr.dtype.newbyteorder("<")).tobytes()
                    )
        core = b"".join(chunks)
        tile_lines = [f"    TileSamples = {tw}",
                      f"    TileLines   = {th}"]
    else:
        raise ValueError(f"isis3: unknown Format {fmt!r}")

    # StartByte is self-referencing (1-based) — fixed-point iterate
    # over the rendered label like the PDS3 writer (raster/pds.py)
    start = 1
    for _ in range(4):
        label = "\n".join(
            [
                "Object = IsisCube",
                "  Object = Core",
                f"    StartByte   = {start}",
                f"    Format      = {fmt}",
                *tile_lines,
                "    Group = Dimensions",
                f"      Samples = {w}",
                f"      Lines   = {h}",
                f"      Bands   = {nb}",
                "    End_Group",
                "    Group = Pixels",
                f"      Type       = {t}",
                "      ByteOrder  = Lsb",
                f"      Base       = {base!r}",
                f"      Multiplier = {multiplier!r}",
                "    End_Group",
                "  End_Object",
                "End_Object",
                "End",
                "",
            ]
        ).encode()
        if len(label) + 1 == start:
            break
        start = len(label) + 1
    return label + core


def _parse_pvl(text: str) -> dict:
    """Nested Object/Group PVL -> dotted keyword dict."""
    kv: dict[str, str] = {}
    stack: list[str] = []
    for line in text.splitlines():
        s = line.strip()
        if not s or s == "End":
            continue
        if s.startswith(("End_Object", "End_Group")):
            stack.pop()
        elif "=" in s:
            k, v = (p.strip() for p in s.split("=", 1))
            if k in ("Object", "Group"):
                stack.append(v)
            else:
                kv[".".join(stack + [k])] = v
    return kv


def decode_isis3(data: bytes):
    """-> ((H, W, B) array, metadata dict)."""
    head = data[: min(len(data), 65536)].decode("latin-1")
    end = head.find("\nEnd\n")
    if end < 0:
        raise ValueError("isis3: no label End")
    kv = _parse_pvl(head[: end + 5])
    g = lambda k, d=None: kv.get(f"IsisCube.Core.{k}", d)  # noqa: E731
    start = int(g("StartByte", "1")) - 1
    w = int(g("Dimensions.Samples"))
    h = int(g("Dimensions.Lines"))
    nb = int(g("Dimensions.Bands", "1"))
    t = g("Pixels.Type", "Real")
    dt = _DTYPES.get(t)
    if dt is None:
        raise ValueError(f"isis3: unsupported Pixels.Type {t!r}")
    dt = dt.newbyteorder(
        "<" if g("Pixels.ByteOrder", "Msb") == "Lsb" else ">"
    )
    fmt = g("Format", "BandSequential")
    if fmt == "Tile":
        tw, th = int(g("TileSamples")), int(g("TileLines"))
        bpr, bpc = -(-w // tw), -(-h // th)
        a = np.frombuffer(
            data, dtype=dt, count=nb * bpc * bpr * th * tw, offset=start
        ).reshape(nb, bpc, bpr, th, tw)
        # (nb,bpc,bpr,th,tw) -> (bpc,th,bpr,tw,nb) -> unpad
        out = a.transpose(1, 3, 2, 4, 0).reshape(
            bpc * th, bpr * tw, nb
        )[:h, :w]
    elif fmt == "BandSequential":
        a = np.frombuffer(data, dtype=dt, count=nb * h * w, offset=start)
        out = np.moveaxis(a.reshape(nb, h, w), 0, 2)
    else:
        raise ValueError(f"isis3: unknown Format {fmt!r}")
    meta = {
        "base": float(g("Pixels.Base", "0")),
        "multiplier": float(g("Pixels.Multiplier", "1")),
        "format": fmt,
    }
    return out, meta
