"""WAV/PCM audio codec (pure struct/numpy) — a REAL audio format for
the multimodal pipeline (replacing the round-1 int8 decode stub for
clips carrying RIFF payloads; the stub remains the documented
fallback for container-less formats).

Scope: canonical RIFF/WAVE with a `fmt ` chunk (PCM, format tag 1,
16-bit) and a `data` chunk; mono or interleaved multi-channel.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["encode_wav", "decode_wav", "is_wav"]


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
            if tag != 1 or bits != 16:
                raise ValueError(f"unsupported WAV format tag={tag} bits={bits}")
        elif cid == b"data":
            pcm = data[off : off + sz]
        off += sz + (sz & 1)  # chunks are word-aligned
    if ch is None or pcm is None:
        raise ValueError("missing fmt/data chunk")
    arr = np.frombuffer(pcm, dtype="<i2")
    return arr.reshape(-1, ch), rate
