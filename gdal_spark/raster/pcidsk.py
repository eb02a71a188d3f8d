"""PCIDSK (.pix) raster codec — GDAL's bundled native database format.

Semantics re-derived from the reference's open PCIDSK SDK (no code
translated):

- file-header field offsets: frmts/pcidsk/sdk/core/cpcidskfile.cpp:
  518-544 (width 384:8, height 392:8, channel_count 376:8, file
  size in 512-byte blocks 16:16, image_start_block 304:16,
  ih_start_block 336:16, interleaving 360:8, segment pointers
  440:16 + 456:8) and pcidskcreate.cpp:310-430 (creation-time
  values incl. the per-type channel-count fields at 464..505).
- image headers: 1024 bytes per channel at (ih_start_block-1)*512 +
  (chan-1)*1024; pixel-type name at 160:8
  (cpcidskfile.cpp:816-820), byte-order marker at byte 201 — 'S'
  little-endian, 'N' big-endian (channel/cpcidskchannel.cpp:63-67).
- BAND interleaving: whole-band rasters appended in channel order
  (cpcidskfile.cpp:846-856); PIXEL interleaving: per-scanline pixel
  groups padded out to a 512-byte boundary
  (cpcidskfile.cpp:698-739).

Scope: 8U / 16S / 16U / 32R channels, BAND and PIXEL interleaving,
segment pointer block present-but-empty (every entry inactive).
FILE-interleaved/tiled channels and segments (GEO/LUT/PCT/...) are
out of scope and rejected loudly.
"""

from __future__ import annotations

import numpy as np

__all__ = ["encode_pcidsk", "decode_pcidsk", "is_pcidsk"]

_MAGIC = b"PCIDSK  "

_TYPE_NAME = {"u1": "8U", "i2": "16S", "u2": "16U", "f4": "32R"}
_TYPE_SIZE = {"8U": 1, "16S": 2, "16U": 2, "32R": 4}
_TYPE_NP = {"8U": "<u1", "16S": "<i2", "16U": "<u2", "32R": "<f4"}


def is_pcidsk(data: bytes) -> bool:
    return data[:8] == _MAGIC


def _put(buf: bytearray, val: str, off: int, width: int,
         right: bool = False) -> None:
    b = val.encode("ascii")
    if len(b) > width:
        raise ValueError(f"pcidsk: {val!r} exceeds field width {width}")
    b = b.rjust(width) if right else b.ljust(width)
    assert len(b) == width
    buf[off : off + width] = b


def _pad512(n: int) -> int:
    return (n + 511) // 512 * 512


def encode_pcidsk(channels: list[np.ndarray],
                  interleaving: str = "BAND") -> bytes:
    """channels: 2D arrays (same h, w) with dtype uint8/int16/uint16/
    float32 -> .pix bytes."""
    if interleaving not in ("BAND", "PIXEL"):
        raise ValueError(f"pcidsk: interleaving {interleaving!r}")
    chans = [np.ascontiguousarray(c) for c in channels]
    h, w = chans[0].shape
    names = []
    for c in chans:
        if c.shape != (h, w):
            raise ValueError("pcidsk: channel shapes differ")
        key = c.dtype.str.lstrip("<>=|")
        if key not in _TYPE_NAME:
            raise ValueError(f"pcidsk: dtype {c.dtype} unsupported")
        names.append(_TYPE_NAME[key])
    nchan = len(chans)

    # block layout: [file header][image headers][segment ptrs][data]
    ih_blocks = 2 * nchan                 # 1024 B per channel
    seg_blocks = 1                        # one empty pointer block
    ih_start = 1                          # 0-based block index
    seg_start = ih_start + ih_blocks
    data_start = seg_start + seg_blocks

    if interleaving == "BAND":
        data_len = sum(h * w * _TYPE_SIZE[n] for n in names)
    else:
        pgs = sum(_TYPE_SIZE[n] for n in names)
        line_len = _pad512(pgs * w)
        data_len = line_len * h
    data_blocks = _pad512(data_len) // 512
    total_blocks = data_start + data_blocks

    fh = bytearray(b" " * 512)
    fh[0:8] = _MAGIC
    _put(fh, "SDK V1.0", 8, 8)
    _put(fh, str(total_blocks), 16, 16, right=True)
    _put(fh, "gdal_spark", 48, 64)
    _put(fh, str(data_start + 1), 304, 16, right=True)
    _put(fh, str(data_blocks), 320, 16, right=True)
    _put(fh, str(ih_start + 1), 336, 16, right=True)
    _put(fh, str(ih_blocks), 352, 8, right=True)
    _put(fh, interleaving, 360, 8)
    _put(fh, "MIXED", 368, 8)
    _put(fh, str(nchan), 376, 8, right=True)
    _put(fh, str(w), 384, 8, right=True)
    _put(fh, str(h), 392, 8, right=True)
    _put(fh, "METRE", 400, 8)
    _put(fh, "1.0", 408, 16)
    _put(fh, "1.0", 424, 16)
    _put(fh, str(seg_start + 1), 440, 16, right=True)
    _put(fh, str(seg_blocks), 456, 8, right=True)
    for off, tname in ((464, "8U"), (468, "16S"), (472, "16U"), (476, "32R")):
        _put(fh, str(sum(1 for n in names if n == tname)), off, 4, right=True)
    for off in (480, 484, 488):          # complex counts
        _put(fh, "0", off, 4, right=True)
    fh[492:506] = b"\x00" * 14           # binary int16 extended counts

    ihs = bytearray()
    for name in names:
        ih = bytearray(b" " * 1024)
        _put(ih, "Contents Not Specified", 0, 64)
        _put(ih, "<uninitialized>", 64, 64)
        _put(ih, name, 160, 8)
        ih[201] = ord("S")               # little-endian payload
        ihs += ih

    seg = bytearray(b" " * (seg_blocks * 512))

    if interleaving == "BAND":
        body = b"".join(
            c.astype(_TYPE_NP[n]).tobytes() for c, n in zip(chans, names)
        )
    else:
        line = np.zeros((h, line_len), dtype=np.uint8)
        off = 0
        for c, n in zip(chans, names):
            sz = _TYPE_SIZE[n]
            raw = c.astype(_TYPE_NP[n]).view(np.uint8).reshape(h, w, sz)
            idx = np.arange(w)[:, None] * pgs + off + np.arange(sz)[None, :]
            line[:, idx.ravel()] = raw.reshape(h, w * sz)
            off += sz
        body = line.tobytes()

    out = bytes(fh) + bytes(ihs) + bytes(seg) + body
    return out + b"\x00" * (total_blocks * 512 - len(out))


def decode_pcidsk(data: bytes) -> tuple[list[np.ndarray], dict]:
    """-> (per-channel 2D arrays, meta {interleaving, types})."""
    data = bytes(data)
    if not is_pcidsk(data):
        raise ValueError("pcidsk: bad magic")
    fh = data[:512]

    def geti(off, width):
        return int(fh[off : off + width].decode("ascii").strip() or "0")

    w = geti(384, 8)
    h = geti(392, 8)
    nchan = geti(376, 8)
    ilv = fh[360:368].decode("ascii").strip()
    image_start = geti(304, 16)
    ih_start = geti(336, 16)
    if ilv not in ("BAND", "PIXEL"):
        raise ValueError(f"pcidsk: interleaving {ilv!r} not supported")

    names, orders = [], []
    for ch in range(nchan):
        off = (ih_start - 1) * 512 + ch * 1024
        ih = data[off : off + 1024]
        name = ih[160:168].decode("ascii").strip()
        if name not in _TYPE_SIZE:
            raise ValueError(f"pcidsk: channel type {name!r} not supported")
        names.append(name)
        orders.append(chr(ih[201]))

    chans: list[np.ndarray] = []
    base = (image_start - 1) * 512
    if ilv == "BAND":
        off = base
        for name, order in zip(names, orders):
            dt = np.dtype(_TYPE_NP[name])
            if order != "S":
                dt = dt.newbyteorder(">")
            n = h * w
            arr = np.frombuffer(data, dtype=dt, count=n, offset=off)
            chans.append(arr.reshape(h, w).astype(dt.newbyteorder("=")))
            off += n * dt.itemsize
    else:
        pgs = sum(_TYPE_SIZE[n] for n in names)
        line_len = _pad512(pgs * w)
        raw = np.frombuffer(
            data, dtype=np.uint8, count=line_len * h, offset=base
        ).reshape(h, line_len)
        coff = 0
        for name, order in zip(names, orders):
            sz = _TYPE_SIZE[name]
            idx = np.arange(w)[:, None] * pgs + coff + np.arange(sz)[None, :]
            piece = raw[:, idx.ravel()].reshape(h, w, sz).copy()
            dt = np.dtype(_TYPE_NP[name])
            if order != "S":
                dt = dt.newbyteorder(">")
            arr = piece.reshape(h, -1).view(dt)[:, :w]
            chans.append(arr.astype(dt.newbyteorder("=")))
            coff += sz
    return chans, {"interleaving": ilv, "types": names}
