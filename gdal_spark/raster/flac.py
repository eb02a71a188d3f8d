"""FLAC lossless audio codec — pure Python/numpy, from the public
xiph.org FLAC format specification (RFC 9639).  Closes the audio
slice of the codec-bearing-media gap: WAV/PCM was the only real audio
format in the engine; FLAC is the dominant *compressed* lossless one,
and lossless means the driver oracle can close in EXACT integer SQL
(unlike JPEG-family media, which live under the PSNR rule).

Encoder scope (everything the spec makes optional stays optional):

- 16-bit PCM, mono or independent stereo/multichannel (no side-channel
  coding on encode; the decoder handles all four assignments).
- Fixed-blocksize streams, 4096-sample blocks.
- Per-channel subframe choice: CONSTANT when a block is flat, else the
  best FIXED predictor (order 0-4, chosen by the classic sum-of-|res|
  estimate) with partition-order-0 Rice residuals, falling back to
  VERBATIM when Rice would exceed it.
- STREAMINFO with the interleaved-PCM MD5, frame-header CRC-8 (poly
  0x07) and whole-frame CRC-16 (poly 0x8005).

Decoder scope (a superset, to read foreign encoders' output):
CONSTANT / VERBATIM / FIXED 0-4 / LPC subframes, Rice + Rice2 residual
methods with any partition order and the escape-to-raw code, wasted
bits, and the left/side, right/side and mid/side channel assignments.

The MD5 in STREAMINFO is verified on decode — a corrupt stream raises
rather than returning wrong samples.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np

__all__ = ["encode_flac", "encode_flac_parts", "decode_flac", "is_flac"]

_BLOCK = 4096


def is_flac(data: bytes) -> bool:
    return len(data) >= 4 and data[:4] == b"fLaC"


# ---------------------------------------------------------------------------
# CRCs (spec polynomials, bit-MSB-first)
# ---------------------------------------------------------------------------


def _make_crc8_table():
    tbl = []
    for b in range(256):
        c = b
        for _ in range(8):
            c = ((c << 1) ^ 0x07) & 0xFF if c & 0x80 else (c << 1) & 0xFF
        tbl.append(c)
    return tbl


def _make_crc16_table():
    tbl = []
    for b in range(256):
        c = b << 8
        for _ in range(8):
            c = ((c << 1) ^ 0x8005) & 0xFFFF if c & 0x8000 else (c << 1) & 0xFFFF
        tbl.append(c)
    return tbl


_CRC8 = _make_crc8_table()
_CRC16 = _make_crc16_table()


def _crc8(data: bytes) -> int:
    c = 0
    for b in data:
        c = _CRC8[c ^ b]
    return c


def _crc16(data: bytes) -> int:
    c = 0
    for b in data:
        c = _CRC16[((c >> 8) ^ b) & 0xFF] ^ ((c << 8) & 0xFFFF)
    return c


# ---------------------------------------------------------------------------
# bit IO
# ---------------------------------------------------------------------------


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, nbits: int) -> None:
        if nbits == 0:
            return
        self.acc = (self.acc << nbits) | (value & ((1 << nbits) - 1))
        self.nbits += nbits
        while self.nbits >= 8:
            self.nbits -= 8
            self.buf.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def write_unary(self, q: int) -> None:
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)  # q zero bits then a 1

    def align(self) -> None:
        if self.nbits:
            self.write(0, 8 - self.nbits)

    def bytes(self) -> bytes:
        assert self.nbits == 0
        return bytes(self.buf)


class _BitReader:
    def __init__(self, data: bytes, pos_bytes: int = 0):
        self.data = data
        self.pos = pos_bytes * 8  # bit position

    def read(self, nbits: int) -> int:
        p, n = self.pos, nbits
        self.pos += n
        start, end = p >> 3, (p + n + 7) >> 3
        chunk = int.from_bytes(self.data[start:end], "big")
        shift = end * 8 - (p + n)
        return (chunk >> shift) & ((1 << n) - 1)

    def read_signed(self, nbits: int) -> int:
        v = self.read(nbits)
        return v - (1 << nbits) if v & (1 << (nbits - 1)) else v

    def read_unary(self) -> int:
        q = 0
        while True:
            # scan up to the next byte boundary at a time
            avail = 8 - (self.pos & 7)
            bits = self.read(avail)
            if bits:
                extra = avail - bits.bit_length()
                self.pos -= avail - extra - 1
                return q + extra
            q += avail

    def align(self) -> None:
        self.pos = (self.pos + 7) & ~7

    def byte_pos(self) -> int:
        return self.pos >> 3


# ---------------------------------------------------------------------------
# encode
# ---------------------------------------------------------------------------

_FIXED_COEF = [  # s_hat[i] for orders 0..4
    [],
    [1],
    [2, -1],
    [3, -3, 1],
    [4, -6, 4, -1],
]


def _fixed_residual(sig: np.ndarray, order: int) -> np.ndarray:
    r = sig.astype(np.int64)
    for _ in range(order):
        r = np.diff(r)
    return r


def _rice_param(res: np.ndarray) -> int:
    """Smallest k with mean(|res|) < 2^k (the classic estimator)."""
    if len(res) == 0:
        return 0
    s = int(np.abs(res).sum())
    k = 0
    while (len(res) << (k + 1)) < 2 * s and k < 14:
        k += 1
    return k


def _rice_bits(res: np.ndarray, k: int) -> int:
    zz = (np.abs(res.astype(np.int64)) * 2) - (res < 0)
    return int((zz >> k).sum()) + len(res) * (k + 1)


def _write_rice(w: _BitWriter, res: np.ndarray, k: int) -> None:
    zz = np.where(res >= 0, res.astype(np.int64) * 2,
                  -2 * res.astype(np.int64) - 1)
    mask = (1 << k) - 1
    for v in zz.tolist():
        w.write_unary(v >> k)
        if k:
            w.write(v & mask, k)


def _utf8_coded(n: int) -> bytes:
    """The frame-number coding: UTF-8-style, values to 2^36."""
    if n < 0x80:
        return bytes([n])
    nbytes = 1
    while True:
        nbytes += 1
        if n < (1 << (5 * nbytes + 1)):  # 6*(nbytes-1) + (7-nbytes) bits
            break
    # lead byte has nbytes high 1s then 0; 6 payload bits per tail byte
    tail = [(0x80 | ((n >> (6 * i)) & 0x3F)) for i in range(nbytes - 1)]
    lead_payload = n >> (6 * (nbytes - 1))
    lead = ((0xFF << (8 - nbytes)) & 0xFF) | lead_payload
    return bytes([lead] + tail[::-1])


def _read_utf8_coded(r: _BitReader) -> int:
    b0 = r.read(8)
    if b0 < 0x80:
        return b0
    nbytes = 8 - (~b0 & 0xFF).bit_length()
    n = b0 & (0x7F >> nbytes)
    for _ in range(nbytes - 1):
        n = (n << 6) | (r.read(8) & 0x3F)
    return n


def _encode_subframe(w: _BitWriter, sig: np.ndarray, bps: int) -> None:
    n = len(sig)
    if n and (sig == sig[0]).all():
        w.write(0, 1)
        w.write(0, 6)   # CONSTANT
        w.write(0, 1)   # no wasted bits
        w.write(int(sig[0]) & ((1 << bps) - 1), bps)
        return

    best_o, best_res, best_cost = 0, sig.astype(np.int64), None
    for o in range(0, min(5, n)):
        res = _fixed_residual(sig, o)
        cost = int(np.abs(res).sum())
        if best_cost is None or cost < best_cost:
            best_o, best_res, best_cost = o, res, cost
    k = _rice_param(best_res)
    rice_total = best_o * bps + 2 + 4 + 4 + _rice_bits(best_res, k)
    if rice_total >= n * bps:
        w.write(0, 1)
        w.write(1, 6)   # VERBATIM
        w.write(0, 1)
        for v in sig.tolist():
            w.write(int(v) & ((1 << bps) - 1), bps)
        return

    w.write(0, 1)
    w.write(0b001000 | best_o, 6)  # FIXED, order best_o
    w.write(0, 1)                  # no wasted bits
    for v in sig[:best_o].tolist():
        w.write(int(v) & ((1 << bps) - 1), bps)
    w.write(0, 2)  # residual method 0 (4-bit Rice)
    w.write(0, 4)  # partition order 0
    w.write(k, 4)
    _write_rice(w, best_res, k)


def encode_flac(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """samples: (n,) or (n, channels) int16 -> FLAC bytes."""
    header, frames = encode_flac_parts(samples, sample_rate)
    return header + b"".join(frames)


def encode_flac_parts(
    samples: np.ndarray, sample_rate: int = 16000
) -> tuple[bytes, list[bytes]]:
    """Structured encode: (native header incl. fLaC marker +
    STREAMINFO, per-block frame byte strings).  The Ogg FLAC mapping
    (raster/ogg.py) needs frame boundaries — each frame is one Ogg
    packet."""
    s = np.asarray(samples, dtype=np.int16)
    if s.ndim == 1:
        s = s[:, None]
    n, ch = s.shape
    if not 1 <= ch <= 8:
        raise ValueError(f"flac: {ch} channels (1..8 supported)")
    bps = 16

    md5 = hashlib.md5(s.astype("<i2").tobytes()).digest()

    frames: list[bytes] = []
    max_fr, min_fr = 0, 0
    for fi, off in enumerate(range(0, n, _BLOCK)):
        blk = s[off : off + _BLOCK]
        bs = len(blk)
        w = _BitWriter()
        w.write(0b11111111111110, 14)
        w.write(0, 1)          # mandatory 0
        w.write(0, 1)          # fixed-blocksize stream
        w.write(0b0111, 4)     # blocksize: 16-bit at end (bs-1)
        w.write(0b0000, 4)     # sample rate: from STREAMINFO
        w.write(ch - 1, 4)     # independent channels
        w.write(0b100, 3)      # 16 bps
        w.write(0, 1)          # reserved
        w.align()
        hdr = bytes(w.buf) + _utf8_coded(fi) + struct.pack(">H", bs - 1)
        hdr += bytes([_crc8(hdr)])
        w = _BitWriter()
        for c in range(ch):
            _encode_subframe(w, blk[:, c].astype(np.int64), bps)
        w.align()
        frame = hdr + w.bytes()
        frame += struct.pack(">H", _crc16(frame))
        frames.append(frame)
        max_fr = max(max_fr, len(frame))
        min_fr = len(frame) if min_fr == 0 else min(min_fr, len(frame))

    streaminfo = (
        struct.pack(">HH", min(_BLOCK, n), min(_BLOCK, n))
        + min_fr.to_bytes(3, "big")
        + max_fr.to_bytes(3, "big")
        + (
            (sample_rate << 44) | ((ch - 1) << 41) | ((bps - 1) << 36) | n
        ).to_bytes(8, "big")
        + md5
    )
    header = b"fLaC" + bytes([0x80]) + len(streaminfo).to_bytes(3, "big") + streaminfo
    return header, frames


# ---------------------------------------------------------------------------
# decode
# ---------------------------------------------------------------------------

_BLOCKSIZE_TBL = {
    0b0001: 192, 0b0010: 576, 0b0011: 1152, 0b0100: 2304, 0b0101: 4608,
    0b1000: 256, 0b1001: 512, 0b1010: 1024, 0b1011: 2048, 0b1100: 4096,
    0b1101: 8192, 0b1110: 16384, 0b1111: 32768,
}
_SAMPLERATE_TBL = {
    0b0001: 88200, 0b0010: 176400, 0b0011: 192000, 0b0100: 8000,
    0b0101: 16000, 0b0110: 22050, 0b0111: 24000, 0b1000: 32000,
    0b1001: 44100, 0b1010: 48000, 0b1011: 96000,
}
_BPS_TBL = {0b001: 8, 0b010: 12, 0b100: 16, 0b101: 20, 0b110: 24, 0b111: 32}


def _read_residual(r: _BitReader, n: int, order: int) -> np.ndarray:
    method = r.read(2)
    if method > 1:
        raise ValueError(f"flac: reserved residual method {method}")
    pbits = 4 if method == 0 else 5
    escape = (1 << pbits) - 1
    porder = r.read(4)
    nparts = 1 << porder
    if n % nparts:
        raise ValueError("flac: block size not divisible by partitions")
    out = np.empty(n - order, dtype=np.int64)
    pos = 0
    for p in range(nparts):
        cnt = n // nparts - (order if p == 0 else 0)
        k = r.read(pbits)
        if k == escape:
            raw = r.read(5)
            for i in range(cnt):
                out[pos + i] = r.read_signed(raw) if raw else 0
        else:
            for i in range(cnt):
                q = r.read_unary()
                v = (q << k) | (r.read(k) if k else 0)
                out[pos + i] = (v >> 1) ^ -(v & 1)  # un-zigzag
        pos += cnt
    return out


def _read_subframe(r: _BitReader, n: int, bps: int) -> np.ndarray:
    if r.read(1):
        raise ValueError("flac: subframe pad bit set")
    ftype = r.read(6)
    wasted = 0
    if r.read(1):
        wasted = 1 + r.read_unary()
        bps -= wasted
    if ftype == 0:  # CONSTANT
        sig = np.full(n, r.read_signed(bps), dtype=np.int64)
    elif ftype == 1:  # VERBATIM
        sig = np.array([r.read_signed(bps) for _ in range(n)], dtype=np.int64)
    elif 8 <= ftype <= 12:  # FIXED
        order = ftype - 8
        warm = [r.read_signed(bps) for _ in range(order)]
        res = _read_residual(r, n, order)
        sig = np.empty(n, dtype=np.int64)
        sig[:order] = warm
        coef = _FIXED_COEF[order]
        for i in range(order, n):
            acc = res[i - order]
            for j, cj in enumerate(coef):
                acc += cj * sig[i - 1 - j]
            sig[i] = acc
    elif ftype >= 32:  # LPC
        order = ftype - 31
        warm = [r.read_signed(bps) for _ in range(order)]
        prec = r.read(4) + 1
        if prec == 16:
            raise ValueError("flac: invalid qlp precision")
        shift = r.read_signed(5)
        coefs = [r.read_signed(prec) for _ in range(order)]
        res = _read_residual(r, n, order)
        sig = np.empty(n, dtype=np.int64)
        sig[:order] = warm
        for i in range(order, n):
            acc = 0
            for j in range(order):
                acc += coefs[j] * sig[i - 1 - j]
            sig[i] = (acc >> shift) + res[i - order]
    else:
        raise ValueError(f"flac: reserved subframe type {ftype}")
    return sig << wasted if wasted else sig


def decode_flac(data: bytes) -> tuple[np.ndarray, int]:
    """-> ((n, channels) int16 samples, sample_rate).  Verifies the
    STREAMINFO MD5; raises on mismatch."""
    if not is_flac(data):
        raise ValueError("not a FLAC payload")
    # metadata walk
    pos, streaminfo = 4, None
    while True:
        hdr = data[pos]
        btype, last = hdr & 0x7F, bool(hdr & 0x80)
        blen = int.from_bytes(data[pos + 1 : pos + 4], "big")
        if btype == 0:
            streaminfo = data[pos + 4 : pos + 4 + blen]
        pos += 4 + blen
        if last:
            break
    if streaminfo is None:
        raise ValueError("flac: missing STREAMINFO")
    packed = int.from_bytes(streaminfo[10:18], "big")
    sample_rate = packed >> 44
    ch = ((packed >> 41) & 0x7) + 1
    bps = ((packed >> 36) & 0x1F) + 1
    total = packed & ((1 << 36) - 1)
    md5_expect = streaminfo[18:34]

    out = np.empty((total, ch), dtype=np.int64)
    got = 0
    r = _BitReader(data, pos)
    while got < total:
        hdr_start = r.byte_pos()
        sync = r.read(14)
        if sync != 0b11111111111110:
            raise ValueError(f"flac: lost sync at byte {hdr_start}")
        r.read(1)  # mandatory 0
        r.read(1)  # blocking strategy
        bs_bits = r.read(4)
        sr_bits = r.read(4)
        ch_bits = r.read(4)
        bps_bits = r.read(3)
        r.read(1)
        _read_utf8_coded(r)
        if bs_bits == 0b0110:
            bs = r.read(8) + 1
        elif bs_bits == 0b0111:
            bs = r.read(16) + 1
        else:
            bs = _BLOCKSIZE_TBL[bs_bits]
        if sr_bits == 0b1100:
            r.read(8)
        elif sr_bits in (0b1101, 0b1110):
            r.read(16)
        fbps = _BPS_TBL.get(bps_bits, bps)
        crc_calc = _crc8(data[hdr_start : r.byte_pos()])
        if r.read(8) != crc_calc:
            raise ValueError("flac: frame header CRC-8 mismatch")

        if ch_bits < 8:
            nch, mode = ch_bits + 1, "indep"
        elif ch_bits == 0b1000:
            nch, mode = 2, "left_side"
        elif ch_bits == 0b1001:
            nch, mode = 2, "right_side"
        elif ch_bits == 0b1010:
            nch, mode = 2, "mid_side"
        else:
            raise ValueError(f"flac: reserved channel assignment {ch_bits}")
        if nch != ch:
            raise ValueError("flac: frame channel count != STREAMINFO")

        sigs = []
        for c in range(nch):
            sbps = fbps
            if (mode == "left_side" and c == 1) or \
               (mode == "right_side" and c == 0) or \
               (mode == "mid_side" and c == 1):
                sbps += 1  # the side channel carries one extra bit
            sigs.append(_read_subframe(r, bs, sbps))
        r.align()
        frame_crc = _crc16(data[hdr_start : r.byte_pos()])
        if r.read(16) != frame_crc:
            raise ValueError("flac: frame CRC-16 mismatch")

        if mode == "left_side":
            left, side = sigs
            sigs = [left, left - side]
        elif mode == "right_side":
            side, right = sigs
            sigs = [right + side, right]
        elif mode == "mid_side":
            mid, side = sigs
            m2 = (mid << 1) | (side & 1)
            sigs = [(m2 + side) >> 1, (m2 - side) >> 1]
        take = min(bs, total - got)
        for c in range(ch):
            out[got : got + take, c] = sigs[c][:take]
        got += take

    samples = out.astype(np.int16) if bps <= 16 else out.astype(np.int32)
    md5_got = hashlib.md5(
        samples.astype("<i2" if bps <= 16 else "<i4").tobytes()
    ).digest()
    if md5_got != md5_expect and md5_expect != b"\x00" * 16:
        raise ValueError("flac: decoded-PCM MD5 mismatch")
    return samples, sample_rate
