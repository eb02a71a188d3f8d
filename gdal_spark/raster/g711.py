"""G.711 mu-law / A-law audio codecs (pure numpy).

Semantics are the ITU-T G.711 / CCITT reference tables as implemented
by CPython's audioop (Modules/audioop.c, itself the Sun/CCITT
reference code) — the in-container external truth: the pytest suite
verifies BOTH directions against audioop over the full 16-bit domain
when the module is importable.

mu-law: 14-bit magnitude, bias 0x84/4=33 after >>2, 8 segments, 4-bit
mantissa, complemented output byte.  A-law: 13-bit magnitude, no
bias, even-bit inversion (0x55).  Both decode via the exact integer
staircase, so the quantization Q(v) = decode(encode(v)) mirrors
term-for-term into DuckDB CASE logic.
"""

from __future__ import annotations

import numpy as np

__all__ = ["ulaw_encode", "ulaw_decode", "alaw_encode", "alaw_decode",
           "sql_ulaw_quantize", "sql_alaw_quantize"]

_SEG_END_U = np.array([0x3F, 0x7F, 0xFF, 0x1FF, 0x3FF, 0x7FF, 0xFFF,
                       0x1FFF], dtype=np.int64)
_SEG_END_A = np.array([0x1F, 0x3F, 0x7F, 0xFF, 0x1FF, 0x3FF, 0x7FF,
                       0xFFF], dtype=np.int64)


def ulaw_encode(pcm: np.ndarray) -> np.ndarray:
    """int16 -> mu-law bytes (audioop.lin2ulaw dual)."""
    v = np.asarray(pcm, dtype=np.int64)
    neg = v < 0
    # audioop/CCITT order: ARITHMETIC >> 2 first (floors), THEN
    # negate (so negative magnitudes ceil), clip 8159, bias 33
    m14 = v >> 2
    m = np.minimum(np.where(neg, -m14, m14), 8159) + 33
    seg = np.minimum(np.searchsorted(_SEG_END_U, m, side="left"), 7)
    uval = (seg << 4) | ((m >> (seg + 1)) & 0xF)
    # CCITT saturation: seg would exceed 7 -> 0x7F (biased max 8192)
    uval = np.where(m > 0x1FFF, 0x7F, uval)
    out = np.where(neg, uval ^ 0x7F, uval ^ 0xFF)
    return out.astype(np.uint8)


def ulaw_decode(b: np.ndarray) -> np.ndarray:
    """mu-law bytes -> int16 (audioop.ulaw2lin dual)."""
    u = (~np.asarray(b, dtype=np.int64)) & 0xFF
    t = (((u & 0xF) << 3) + 0x84) << ((u & 0x70) >> 4)
    # audioop's output is already at 16-bit scale (max 32124)
    out = np.where(u & 0x80, 0x84 - t, t - 0x84)
    return out.astype(np.int16)


def alaw_encode(pcm: np.ndarray) -> np.ndarray:
    """int16 -> A-law bytes (audioop.lin2alaw dual)."""
    v = np.asarray(pcm, dtype=np.int64)
    neg = v < 0
    mask = np.where(neg, 0x55, 0xD5)
    m = np.where(neg, (-v) - 1, v) >> 3      # 13-bit, negatives -1
    m = np.minimum(m, 0xFFF)
    seg = np.searchsorted(_SEG_END_A, m, side="left")
    low = np.where(seg < 2, (m >> 1) & 0xF, (m >> seg) & 0xF)
    return (((seg << 4) | low) ^ mask).astype(np.uint8)


def alaw_decode(b: np.ndarray) -> np.ndarray:
    """A-law bytes -> int16 (audioop.alaw2lin dual)."""
    a = np.asarray(b, dtype=np.int64) ^ 0x55
    t = (a & 0xF) << 4
    seg = (a & 0x70) >> 4
    t = np.where(seg == 0, t + 8,
                 np.where(seg == 1, t + 0x108,
                          (t + 0x108) << np.maximum(seg - 1, 0)))
    out = np.where(a & 0x80, t, -t)
    return out.astype(np.int16)


# ---------------------------------------------------------------------------
# DuckDB twins of Q(v) = decode(encode(v)) — exact integer staircases
# ---------------------------------------------------------------------------

def sql_ulaw_quantize(v: str) -> str:
    # negative magnitudes CEIL (shift-then-negate): (abs+3)//4 on the
    # positive side avoids DuckDB's C-truncated negative division
    m = (f"(least((CASE WHEN ({v}) < 0 THEN ((-({v})) + 3) // 4 "
         f"ELSE ({v}) // 4 END), 8159) + 33)")
    seg = ("(CASE "
           + " ".join(
               f"WHEN {m} <= {int(e)} THEN {s}"
               for s, e in enumerate(_SEG_END_U[:-1])
           )
           + " ELSE 7 END)")
    uval = (f"(CASE WHEN {m} > 8191 THEN 127 ELSE "
            f"({seg} * 16) + (({m} // (1 << ({seg} + 1))) % 16) END)")
    t = f"(((({uval} % 16) * 8) + 132) * (1 << ({uval} // 16)))"
    mag = f"({t} - 132)"
    return f"(CASE WHEN ({v}) < 0 THEN -({mag}) ELSE ({mag}) END)"


def sql_alaw_quantize(v: str) -> str:
    m = (f"least(((CASE WHEN ({v}) < 0 THEN (-({v})) - 1 "
         f"ELSE ({v}) END) // 8), 4095)")
    seg = ("(CASE "
           + " ".join(
               f"WHEN ({m}) <= {int(e)} THEN {s}"
               for s, e in enumerate(_SEG_END_A[:-1])
           )
           + " ELSE 7 END)")
    low = (f"(CASE WHEN {seg} < 2 THEN (({m}) // 2) % 16 "
           f"ELSE (({m}) // (1 << {seg})) % 16 END)")
    t = (f"(CASE WHEN {seg} = 0 THEN ({low}) * 16 + 8 "
         f"WHEN {seg} = 1 THEN ({low}) * 16 + 264 "
         f"ELSE (({low}) * 16 + 264) * (1 << ({seg} - 1)) END)")
    return f"(CASE WHEN ({v}) < 0 THEN -({t}) ELSE ({t}) END)"
