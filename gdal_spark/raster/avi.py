"""RIFF/AVI video codec (pure struct/numpy) — a REAL video container
for the multimodal frame-sampling pipeline, replacing the
fixed-64-byte stub for payloads that carry RIFF 'AVI ' bytes
(the stub remains the documented fallback for codec-bearing formats
this container genuinely cannot decode — MP4/H.264, Ogg, ...).

Scope — two codecs, selected by BITMAPINFOHEADER.biCompression:

- BI_RGB (0): uncompressed 24-bit DIB — '00db' frames of bottom-up
  BGR rows padded to 4 bytes (the classic DIB layout).
- 'MJPG': Motion-JPEG — '00dc' frames, each a complete baseline
  JPEG image decoded by the repo's own from-scratch codec
  (raster/jpeg.py).  Lossy: parity criterion is the BASELINE.json
  PSNR >= 40 dB rule, same as still JPEG.

Container layout either way: RIFF('AVI ') with LIST('hdrl')
{ 'avih', LIST('strl') { 'strh' vids, 'strf' BITMAPINFOHEADER } },
LIST('movi') of frame chunks, and an 'idx1' index.  Same RIFF
chunk-walking discipline as raster/wav.py.

The multimodal dispatch parallel in the reference is the
header-identify driver loop (gcore/gdaldataset.cpp:3809-3862): a
format is recognized by its magic bytes, never by file name.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["encode_avi", "decode_avi", "is_avi"]

_FOURCC_MJPG = int.from_bytes(b"MJPG", "little")


def is_avi(data: bytes) -> bool:
    return len(data) >= 12 and data[:4] == b"RIFF" and data[8:12] == b"AVI "


def _dib(frame: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB -> bottom-up padded BGR rows."""
    h, w, _ = frame.shape
    stride = (w * 3 + 3) & ~3
    row = np.zeros((h, stride), dtype=np.uint8)
    row[:, : w * 3] = frame[::-1, :, ::-1].reshape(h, w * 3)
    return row.tobytes()


def encode_avi(frames: np.ndarray, fps: int = 25, codec: str = "DIB",
               quality: int = 90) -> bytes:
    """frames: (n, h, w, 3) uint8 RGB -> RIFF/AVI bytes.

    codec="DIB" writes uncompressed bottom-up BGR '00db' frames;
    codec="MJPG" writes one baseline JPEG per frame ('00dc' chunks,
    raster/jpeg.py at the given quality)."""
    frames = np.asarray(frames, dtype=np.uint8)
    n, h, w, _ = frames.shape
    stride = (w * 3 + 3) & ~3

    if codec == "MJPG":
        from gdal_spark.raster.jpeg import encode_jpeg

        payloads = [encode_jpeg(frames[k], quality) for k in range(n)]
        chunk_id, handler, compression = b"00dc", b"MJPG", _FOURCC_MJPG
        size_image = max(len(p) for p in payloads) if payloads else 0
    elif codec == "DIB":
        payloads = [_dib(frames[k]) for k in range(n)]
        chunk_id, handler, compression = b"00db", b"DIB ", 0
        size_image = stride * h
    else:
        raise ValueError(f"avi codec: unsupported codec {codec!r}")

    strf = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, compression, size_image, 0, 0, 0, 0
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIIi4H",
        b"vids", handler, 0, 0, 0, 0,
        1, fps, 0, n, size_image, 0, 0,
        0, 0, w, h,
    )
    strl = (
        b"LIST"
        + struct.pack("<I", 4 + 8 + len(strh) + 8 + len(strf))
        + b"strl"
        + b"strh" + struct.pack("<I", len(strh)) + strh
        + b"strf" + struct.pack("<I", len(strf)) + strf
    )
    avih = struct.pack(
        "<IIIIIIIIII4I",
        1000000 // fps, size_image * fps, 0, 0x10,  # AVIF_HASINDEX
        n, 0, 1, size_image, w, h, 0, 0, 0, 0,
    )
    hdrl = (
        b"LIST"
        + struct.pack("<I", 4 + 8 + len(avih) + len(strl))
        + b"hdrl"
        + b"avih" + struct.pack("<I", len(avih)) + avih
        + strl
    )
    movi = bytearray(b"LIST" + b"\x00" * 4 + b"movi")
    entries = []
    for payload in payloads:
        entries.append((len(movi) - 8, len(payload)))  # offset from 'movi'
        movi += chunk_id + struct.pack("<I", len(payload)) + payload
        if len(payload) & 1:
            movi += b"\x00"  # RIFF chunks are word-aligned
    struct.pack_into("<I", movi, 4, len(movi) - 8)
    idx1 = bytearray(b"idx1" + struct.pack("<I", 16 * n))
    for off, sz in entries:
        idx1 += struct.pack("<4sIII", chunk_id, 0x10, off, sz)
    body = b"AVI " + hdrl + bytes(movi) + bytes(idx1)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_avi(data: bytes) -> tuple[np.ndarray, int]:
    """-> ((n, h, w, 3) uint8 RGB frames, fps).  Walks RIFF chunks;
    tolerates extra chunks ('JUNK', vedit lists, ...)."""
    if not is_avi(data):
        raise ValueError("not a RIFF/AVI payload")
    w = h = bits = compression = None
    scale, rate = 1, 25
    frames: list[bytes] = []
    last_strh = None  # fccType of the most recent strh seen

    def walk(off: int, end: int) -> None:
        nonlocal w, h, bits, compression, scale, rate, last_strh
        while off + 8 <= end:
            cid, sz = struct.unpack_from("<4sI", data, off)
            off += 8
            if cid == b"LIST":
                walk(off + 4, off + sz)  # skip the list-type fourcc
            elif cid == b"strh":
                fcc_type, _h, _f, _p, _l, _init, sc, rt = (
                    struct.unpack_from("<4s4sIHHIII", data, off)
                )
                last_strh = fcc_type
                # only the VIDEO stream header sets the frame rate —
                # a later audio strh must not clobber it
                if fcc_type == b"vids":
                    scale, rate = sc, rt
            elif cid == b"strf" and w is None and last_strh == b"vids":
                # only the strf that FOLLOWS the vids strh is a
                # BITMAPINFOHEADER — an audio strl's strf is a
                # WAVEFORMATEX and must not bind w/h/bits
                _bsz, w, h, _planes, bits, compression = struct.unpack_from(
                    "<IiiHHI", data, off
                )
            elif cid in (b"00db", b"00dc"):
                frames.append(data[off : off + sz])
            off += sz + (sz & 1)

    walk(12, len(data))
    if w is None or not frames:
        raise ValueError("missing strf/frame chunks")

    if compression == _FOURCC_MJPG:
        from gdal_spark.raster.jpeg import decode_jpeg

        out = np.empty((len(frames), h, w, 3), dtype=np.uint8)
        for k, payload in enumerate(frames):
            img = decode_jpeg(bytes(payload))
            if img.shape != (h, w, 3):
                raise ValueError(
                    f"mjpeg frame {k}: {img.shape} != strf ({h}, {w}, 3)"
                )
            out[k] = img
        return out, int(round(rate / max(1, scale)))

    if compression != 0:
        fourcc = struct.pack("<I", compression)
        raise ValueError(f"unsupported biCompression {fourcc!r} "
                         "(BI_RGB and MJPG only)")
    if bits != 24:
        raise ValueError(f"unsupported biBitCount={bits} (24-bit DIB only)")
    stride = (w * 3 + 3) & ~3
    out = np.empty((len(frames), h, w, 3), dtype=np.uint8)
    for k, payload in enumerate(frames):
        rows = np.frombuffer(payload, dtype=np.uint8, count=stride * h)
        rows = rows.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
        out[k] = rows[::-1, :, ::-1]  # bottom-up BGR -> top-down RGB
    fps = int(round(rate / max(1, scale)))
    return out, fps
