"""WAV/PCM audio codec (pure struct/numpy) — a REAL audio format for
the multimodal pipeline (replacing the round-1 int8 decode stub for
clips carrying RIFF payloads; the stub remains the documented
fallback for container-less formats).

Scope: canonical RIFF/WAVE with a `fmt ` chunk and a `data` chunk;
mono or interleaved multi-channel.  Format tags: 1 (PCM 16-bit),
6 (G.711 A-law, 8-bit) and 7 (G.711 mu-law, 8-bit) — the companding
codecs live in raster/g711.py and are bit-verified against CPython's
audioop over the full 16-bit domain.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["encode_wav", "encode_wav_g711", "decode_wav", "is_wav"]


def is_wav(data: bytes) -> bool:
    return len(data) >= 12 and data[:4] == b"RIFF" and data[8:12] == b"WAVE"


def encode_wav(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """samples: (n,) or (n, channels) int16 -> RIFF/WAVE bytes."""
    s = np.asarray(samples, dtype="<i2")
    if s.ndim == 1:
        s = s[:, None]
    n, ch = s.shape
    data = s.tobytes()
    byte_rate = sample_rate * ch * 2
    block_align = ch * 2
    fmt = struct.pack(
        "<4sIHHIIHH", b"fmt ", 16, 1, ch, sample_rate, byte_rate, block_align, 16
    )
    hdr = struct.pack("<4sI4s", b"RIFF", 4 + len(fmt) + 8 + len(data), b"WAVE")
    return hdr + fmt + struct.pack("<4sI", b"data", len(data)) + data


def encode_wav_g711(samples: np.ndarray, sample_rate: int = 8000,
                    law: str = "ulaw") -> bytes:
    """samples (n,) or (n, ch) int16 -> companded RIFF/WAVE bytes
    (format tag 7 = mu-law, 6 = A-law, 8 bits per sample)."""
    from gdal_spark.raster.g711 import alaw_encode, ulaw_encode

    s = np.asarray(samples, dtype=np.int16)
    if s.ndim == 1:
        s = s[:, None]
    n, ch = s.shape
    enc = ulaw_encode(s) if law == "ulaw" else alaw_encode(s)
    tag = 7 if law == "ulaw" else 6
    data = enc.astype("u1").tobytes()
    byte_rate = sample_rate * ch
    fmt = struct.pack(
        "<4sIHHIIHH", b"fmt ", 16, tag, ch, sample_rate, byte_rate, ch, 8
    )
    hdr = struct.pack("<4sI4s", b"RIFF", 4 + len(fmt) + 8 + len(data), b"WAVE")
    return hdr + fmt + struct.pack("<4sI", b"data", len(data)) + data


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """-> (samples (n, channels) int16, sample_rate). Walks chunks,
    so extra chunks (LIST, fact, ...) are tolerated."""
    if not is_wav(data):
        raise ValueError("not a RIFF/WAVE payload")
    off = 12
    ch = rate = bits = None
    pcm = None
    while off + 8 <= len(data):
        cid, sz = struct.unpack_from("<4sI", data, off)
        off += 8
        if cid == b"fmt ":
            tag, ch, rate, _br, _ba, bits = struct.unpack_from("<HHIIHH", data, off)
            if not ((tag == 1 and bits == 16)
                    or (tag in (6, 7) and bits == 8)):
                raise ValueError(f"unsupported WAV format tag={tag} bits={bits}")
        elif cid == b"data":
            pcm = data[off : off + sz]
        off += sz + (sz & 1)  # chunks are word-aligned
    if ch is None or pcm is None:
        raise ValueError("missing fmt/data chunk")
    if tag == 1:
        arr = np.frombuffer(pcm, dtype="<i2")
    else:
        from gdal_spark.raster.g711 import alaw_decode, ulaw_decode

        b = np.frombuffer(pcm, dtype="u1")
        arr = ulaw_decode(b) if tag == 7 else alaw_decode(b)
    return arr.reshape(-1, ch), rate
