"""JPEG 2000 Part-1 lossless encoder/decoder, pure numpy/stdlib —
the reference reads/writes JPEG2000 through OpenJPEG
(frmts/openjpeg/openjpegdataset.cpp); this module re-derives the
codestream from the public ITU-T T.800 spec the same way the repo's
other from-scratch codecs do (png/tiff/webp/grib).

Implemented subset (documented, loud errors outside it):

- raw codestream (.j2c) + the JP2 box container (jP/ftyp/jp2h/jp2c);
- SIZ: single tile, origin 0, XRsiz=YRsiz=1, 1..4 components,
  8/16-bit signed or unsigned;
- COD: LRCP progression, 1 layer, no MCT, default precincts (2^15),
  code-block 64x64 (any power of two 4..64 accepted on read),
  5/3 reversible transform only, no SOP/EPH, code-block style 0;
- QCD: no quantization (reversible), guard bits 2, exponents
  depth+gain per subband;
- Tier-2: one precinct per resolution, inclusion + zero-bitplane
  tag trees, the T.800 B.10.6 coding-pass codewords, Lblock length
  signalling, 0xFF bit-stuffed packet headers;
- Tier-1: full EBCOT — MQ coder (T.800 C, the 47-state table),
  significance-propagation / magnitude-refinement / cleanup passes,
  run-length mode, the D.3 context tables for LL/LH vs HL vs HH
  bands, one codeword segment per code-block;
- 5/3 reversible DWT (T.800 F.4, whole-point symmetric extension),
  0..8 decomposition levels, odd sizes handled by the standard
  ceil/floor band splits;
- 9/7 irreversible DWT (lossy path, `lossy=True`): float lifting
  with the published alpha/beta/gamma/delta constants, scalar
  quantization with expounded QCD (style 2, per-band eps/mu), T.800
  E.1.1.2 midpoint dequantization — PSNR well above the 40 dB bar at
  the default step 0.5 on 8-bit imagery.

NOT implemented (raise loudly): multiple tiles/tile-parts beyond the
first, precinct partitions, SOP/EPH, RGN, COC/QCC overrides,
MCT/RCT, scalar-DERIVED quantization (style 1), progression orders
other than LRCP (both directions).  The 9/7 final normalization
uses the common (1/K, K) convention, mirrored exactly by the
inverse; foreign-stream lossy parity is unverifiable in-container
(subset caveat below).

CAVEAT (same class as raster/webp.py): the container has no external
JPEG2000 implementation, so conformance is spec-derived and verified
by exhaustive self-roundtrip + structural assertions; the MQ state
table and context tables are transcribed from the public standard.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["encode_j2k", "decode_j2k", "encode_jp2", "decode_jp2",
           "read_jp2_georef"]

# --------------------------------------------------------------------------
# MQ arithmetic coder (T.800 Annex C; table C.2)
# --------------------------------------------------------------------------

# (Qe, NMPS, NLPS, SWITCH)
_MQ_TABLE = (
    (0x5601, 1, 1, 1), (0x3401, 2, 6, 0), (0x1801, 3, 9, 0),
    (0x0AC1, 4, 12, 0), (0x0521, 5, 29, 0), (0x0221, 38, 33, 0),
    (0x5601, 7, 6, 1), (0x5401, 8, 14, 0), (0x4801, 9, 14, 0),
    (0x3801, 10, 14, 0), (0x3001, 11, 17, 0), (0x2401, 12, 18, 0),
    (0x1C01, 13, 20, 0), (0x1601, 29, 21, 0), (0x5601, 15, 14, 1),
    (0x5401, 16, 14, 0), (0x5101, 17, 15, 0), (0x4801, 18, 16, 0),
    (0x3801, 19, 17, 0), (0x3401, 20, 18, 0), (0x3001, 21, 19, 0),
    (0x2801, 22, 19, 0), (0x2401, 23, 20, 0), (0x2201, 24, 21, 0),
    (0x1C01, 25, 22, 0), (0x1801, 26, 23, 0), (0x1601, 27, 24, 0),
    (0x1401, 28, 25, 0), (0x1201, 29, 26, 0), (0x1101, 30, 27, 0),
    (0x0AC1, 31, 28, 0), (0x09C1, 32, 29, 0), (0x08A1, 33, 30, 0),
    (0x0521, 34, 31, 0), (0x0441, 35, 32, 0), (0x02A1, 36, 33, 0),
    (0x0221, 37, 34, 0), (0x0141, 38, 35, 0), (0x0111, 39, 36, 0),
    (0x0085, 40, 37, 0), (0x0049, 41, 38, 0), (0x0025, 42, 39, 0),
    (0x0015, 43, 40, 0), (0x0009, 44, 41, 0), (0x0005, 45, 42, 0),
    (0x0001, 45, 43, 0), (0x5601, 46, 46, 0),
)

_N_CTX = 19
_CTX_RL = 17
_CTX_UNI = 18
# D.2: initial index 4 for the all-zero significance context, 3 for
# run-length, 46 for uniform; everything else starts at 0, MPS 0.
_CTX_INIT = tuple(4 if c == 0 else 3 if c == _CTX_RL else
                  46 if c == _CTX_UNI else 0 for c in range(_N_CTX))


class _MQEncoder:
    """T.800 C.2 encoder. Decisions in, terminated byte segment out."""

    def __init__(self) -> None:
        self.a = 0x8000
        self.c = 0
        self.ct = 12
        self.b = -1  # pending byte; -1 = none yet
        self.out = bytearray()
        self.idx = list(_CTX_INIT)
        self.mps = [0] * _N_CTX

    def encode(self, d: int, cx: int) -> None:
        i = self.idx[cx]
        qe, nmps, nlps, switch = _MQ_TABLE[i]
        a = self.a - qe
        if d == self.mps[cx]:
            if a & 0x8000:
                self.a = a
                self.c += qe
                return
            if a < qe:
                self.a = qe
            else:
                self.a = a
                self.c += qe
            self.idx[cx] = nmps
        else:
            if a < qe:
                self.a = a
                self.c += qe
            else:
                self.a = qe
            if switch:
                self.mps[cx] = 1 - self.mps[cx]
            self.idx[cx] = nlps
        # RENORME
        a = self.a
        c = self.c
        ct = self.ct
        while True:
            a <<= 1
            c <<= 1
            ct -= 1
            if ct == 0:
                self.a, self.c, self.ct = a, c, ct
                self._byteout()
                a, c, ct = self.a, self.c, self.ct
            if a & 0x8000:
                break
        self.a, self.c, self.ct = a, c, ct

    def _byteout(self) -> None:
        c = self.c
        if self.b == 0xFF:
            self._emit(c >> 20, 0xFFFFF, 7)
        elif c < 0x8000000:
            self._emit(c >> 19, 0x7FFFF, 8)
        else:
            self.b += 1
            if self.b == 0xFF:
                self.c = c = c & 0x7FFFFFF
                self._emit(c >> 20, 0xFFFFF, 7)
            else:
                self._emit(c >> 19, 0x7FFFF, 8)

    def _emit(self, newb: int, cmask: int, ct: int) -> None:
        if self.b >= 0:
            self.out.append(self.b)
        self.b = newb & 0xFF
        self.c &= cmask
        self.ct = ct

    def flush(self) -> bytes:
        """C.2.9 FLUSH: set as many 1 bits as possible, push out."""
        tempc = self.c + self.a - 1
        self.c |= 0xFFFF
        if self.c >= tempc:
            self.c -= 0x8000
        self.c <<= self.ct
        self._byteout()
        self.c <<= self.ct
        self._byteout()
        if self.b >= 0 and self.b != 0xFF:
            self.out.append(self.b)  # trailing 0xFF is dropped (spec)
        return bytes(self.out)


class _MQDecoder:
    """T.800 C.3 decoder over one codeword segment."""

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.n = len(data)
        self.bp = 0
        b = data[0] if self.n else 0xFF
        self.c = b << 16
        self._bytein()
        self.c <<= 7
        self.ct -= 7
        self.a = 0x8000
        self.idx = list(_CTX_INIT)
        self.mps = [0] * _N_CTX

    def _bytein(self) -> None:
        data, bp, n = self.data, self.bp, self.n
        b = data[bp] if bp < n else 0xFF
        if b == 0xFF:
            b1 = data[bp + 1] if bp + 1 < n else 0xFF
            if b1 > 0x8F:
                self.c += 0xFF00
                self.ct = 8
            else:
                self.bp = bp + 1
                self.c += b1 << 9
                self.ct = 7
        else:
            self.bp = bp + 1
            b1 = data[bp + 1] if bp + 1 < n else 0xFF
            self.c += b1 << 8
            self.ct = 8

    def decode(self, cx: int) -> int:
        i = self.idx[cx]
        qe, nmps, nlps, switch = _MQ_TABLE[i]
        self.a -= qe
        if (self.c >> 16) < qe:
            # LPS exchange path
            if self.a < qe:
                d = self.mps[cx]
                self.idx[cx] = nmps
            else:
                d = 1 - self.mps[cx]
                if switch:
                    self.mps[cx] = 1 - self.mps[cx]
                self.idx[cx] = nlps
            self.a = qe
        else:
            self.c -= qe << 16
            if self.a & 0x8000:
                return self.mps[cx]
            if self.a < qe:
                d = 1 - self.mps[cx]
                if switch:
                    self.mps[cx] = 1 - self.mps[cx]
                self.idx[cx] = nlps
            else:
                d = self.mps[cx]
                self.idx[cx] = nmps
        # RENORMD
        a, c, ct = self.a, self.c, self.ct
        while True:
            if ct == 0:
                self.a, self.c, self.ct = a, c, ct
                self._bytein()
                a, c, ct = self.a, self.c, self.ct
            a <<= 1
            c <<= 1
            ct -= 1
            if a & 0x8000:
                break
        self.a, self.c, self.ct = a, c & 0xFFFFFFFF, ct
        return d


# --------------------------------------------------------------------------
# Packet-header bit I/O with 0xFF stuffing (T.800 B.10.1)
# --------------------------------------------------------------------------


class _HeadWriter:
    """MSB-first bit writer; a byte following an emitted 0xFF holds
    only 7 bits (its MSB is a forced stuffing 0)."""

    def __init__(self) -> None:
        self.out = bytearray()
        self.cur = 0
        self.nbits = 0

    def _cap(self) -> int:
        return 7 if (self.out and self.out[-1] == 0xFF) else 8

    def put(self, bit: int) -> None:
        self.cur = (self.cur << 1) | (bit & 1)
        self.nbits += 1
        if self.nbits == self._cap():
            self.out.append(self.cur)
            self.cur = 0
            self.nbits = 0

    def put_bits(self, val: int, n: int) -> None:
        for i in range(n - 1, -1, -1):
            self.put((val >> i) & 1)

    def finish(self) -> bytes:
        if self.nbits:
            self.out.append(self.cur << (self._cap() - self.nbits))
            self.cur = 0
            self.nbits = 0
        if self.out and self.out[-1] == 0xFF:
            self.out.append(0x00)
        return bytes(self.out)


class _HeadReader:
    def __init__(self, data: bytes, pos: int = 0) -> None:
        self.data = data
        self.pos = pos
        self.cur = 0
        self.nbits = 0
        self.prev_ff = False

    def get(self) -> int:
        if self.nbits == 0:
            b = self.data[self.pos]
            self.pos += 1
            self.cur = b
            self.nbits = 7 if self.prev_ff else 8
            self.prev_ff = b == 0xFF
            if self.nbits == 7:
                self.cur &= 0x7F
        self.nbits -= 1
        return (self.cur >> self.nbits) & 1

    def get_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.get()
        return v

    def align(self) -> int:
        """Byte-align and return the body start offset (skipping the
        0x00 pad that follows a terminal 0xFF header byte)."""
        self.nbits = 0
        if self.prev_ff:
            if self.pos < len(self.data) and self.data[self.pos] == 0x00:
                self.pos += 1
            self.prev_ff = False
        return self.pos


# --------------------------------------------------------------------------
# Tag trees (T.800 B.10.2)
# --------------------------------------------------------------------------


class _TagTree:
    """Quad-tree over an (nx x ny) leaf grid.  Encoder sets leaf
    values up front (internal node value = min over children); both
    sides share the threshold-driven bit protocol."""

    def __init__(self, nx: int, ny: int) -> None:
        self.levels = []  # list of (nx, ny) per level, leaves first
        lx, ly = nx, ny
        while True:
            self.levels.append((lx, ly))
            if lx == 1 and ly == 1:
                break
            lx = (lx + 1) // 2
            ly = (ly + 1) // 2
        self.value = [[0] * (lx * ly) for lx, ly in self.levels]
        self.low = [[0] * (lx * ly) for lx, ly in self.levels]
        self.known = [[False] * (lx * ly) for lx, ly in self.levels]

    def set_values(self, vals) -> None:
        """vals: list of leaf values in raster order (y-major)."""
        self.value[0] = list(vals)
        for lev in range(1, len(self.levels)):
            cx, cy = self.levels[lev - 1]
            nx, ny = self.levels[lev]
            below = self.value[lev - 1]
            cur = self.value[lev]
            for y in range(ny):
                for x in range(nx):
                    best = None
                    for dy in (0, 1):
                        for dx in (0, 1):
                            sx, sy = 2 * x + dx, 2 * y + dy
                            if sx < cx and sy < cy:
                                v = below[sy * cx + sx]
                                best = v if best is None else min(best, v)
                    cur[y * nx + x] = best if best is not None else 0

    def _path(self, x: int, y: int):
        path = []
        for lev, (nx, _ny) in enumerate(self.levels):
            path.append((lev, y * nx + x))
            x >>= 1
            y >>= 1
        return reversed(path)  # root first

    def encode(self, w: _HeadWriter, x: int, y: int, threshold: int) -> None:
        lo = 0
        for lev, i in self._path(x, y):
            if self.low[lev][i] < lo:
                self.low[lev][i] = lo
            while self.low[lev][i] < threshold and not self.known[lev][i]:
                if self.value[lev][i] > self.low[lev][i]:
                    w.put(0)
                    self.low[lev][i] += 1
                else:
                    w.put(1)
                    self.known[lev][i] = True
            lo = self.low[lev][i]

    def decode(self, r: _HeadReader, x: int, y: int, threshold: int) -> tuple[int, bool]:
        """Returns (lower bound, known). known => value == bound."""
        lo = 0
        lev = i = 0
        for lev, i in self._path(x, y):
            if self.low[lev][i] < lo:
                self.low[lev][i] = lo
            while self.low[lev][i] < threshold and not self.known[lev][i]:
                if r.get():
                    self.known[lev][i] = True
                else:
                    self.low[lev][i] += 1
            lo = self.low[lev][i]
        return self.low[lev][i], self.known[lev][i]

    def decode_value(self, r: _HeadReader, x: int, y: int) -> int:
        """Decode-until-known (zero-bitplane signalling)."""
        t = 1
        while True:
            v, known = self.decode(r, x, y, t)
            if known:
                return v
            t = v + 1


# --------------------------------------------------------------------------
# 5/3 reversible DWT (T.800 F.4; whole-point symmetric extension)
# --------------------------------------------------------------------------


def _fwd53_axis0(a: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Forward 5/3 lifting along axis 0 (vectorized over remaining
    axes). Returns (low, high); origin 0 => even samples are low."""
    n = a.shape[0]
    if n == 1:
        return a.copy(), a[:0]
    even = a[0::2]
    odd = a[1::2]
    no = odd.shape[0]
    if even.shape[0] > no:  # n odd
        even_r = even[1:]
    else:  # n even: x(n) mirrors to x(n-2) = even[-1]
        even_r = np.concatenate([even[1:], even[-1:]], axis=0)
    d = odd - (even[:no] + even_r) // 2
    if even.shape[0] > no:  # n odd: s[last] needs d at both sides = d[-1]
        d_l = np.concatenate([d[:1], d], axis=0)
        d_r = np.concatenate([d, d[-1:]], axis=0)
    else:
        d_l = np.concatenate([d[:1], d[:-1]], axis=0)
        d_r = d
    s = even + (d_l + d_r + 2) // 4
    return s, d


def _inv53_axis0(s: np.ndarray, d: np.ndarray, n: int) -> np.ndarray:
    if n == 1:
        return s.copy()
    if s.shape[0] > d.shape[0]:  # n odd
        d_l = np.concatenate([d[:1], d], axis=0)
        d_r = np.concatenate([d, d[-1:]], axis=0)
    else:
        d_l = np.concatenate([d[:1], d[:-1]], axis=0)
        d_r = d
    even = s - (d_l + d_r + 2) // 4
    no = d.shape[0]
    if s.shape[0] > no:
        even_r = even[1:]
    else:
        even_r = np.concatenate([even[1:], even[-1:]], axis=0)
    odd = d + (even[:no] + even_r) // 2
    out = np.empty((n,) + s.shape[1:], dtype=s.dtype)
    out[0::2] = even
    out[1::2] = odd
    return out


def _fwd53_2d(tile: np.ndarray, levels: int) -> np.ndarray:
    """In-place Mallat layout: returns int64 array with LL_levels in
    the top-left corner.  Horizontal split first, then vertical."""
    a = tile.astype(np.int64).copy()
    h, w = a.shape
    for _ in range(levels):
        sub = a[:h, :w]
        lo, hi = _fwd53_axis0(sub.T)
        sub2 = np.concatenate([lo, hi], axis=0).T  # cols: low | high
        lo2, hi2 = _fwd53_axis0(sub2)
        a[:h, :w] = np.concatenate([lo2, hi2], axis=0)
        w = (w + 1) // 2
        h = (h + 1) // 2
    return a


def _inv53_2d(a: np.ndarray, levels: int) -> np.ndarray:
    h0, w0 = a.shape
    dims = [(h0, w0)]
    for _ in range(levels):
        h, w = dims[-1]
        dims.append(((h + 1) // 2, (w + 1) // 2))
    out = a.astype(np.int64).copy()
    for lev in range(levels, 0, -1):
        h, w = dims[lev - 1]
        hl = (h + 1) // 2
        wl = (w + 1) // 2
        sub = out[:h, :w]
        # vertical inverse
        merged = _inv53_axis0(sub[:hl, :], sub[hl:, :], h)
        # horizontal inverse
        mt = merged.T
        merged2 = _inv53_axis0(mt[:wl, :], mt[wl:, :], w).T
        out[:h, :w] = merged2
    return out


# --------------------------------------------------------------------------
# 9/7 irreversible DWT (T.800 F.4.8.2) — the lossy path
# --------------------------------------------------------------------------

_ALPHA = -1.586134342059924
_BETA = -0.052980118572961
_GAMMA = 0.882911075530934
_DELTA = 0.443506852043971
_KSCALE = 1.230174104914001
# Final normalization: low * 1/K, high * K — mirrored exactly by the
# inverse, so self-roundtrip is exact up to float noise; foreign-
# stream parity is unverifiable in-container (documented subset).


def _pair_step(even: np.ndarray, odd: np.ndarray, coef: float) -> np.ndarray:
    """odd' = odd + coef*(evenL + evenR) with whole-point mirrors."""
    no = odd.shape[0]
    if even.shape[0] > no:  # n odd
        even_r = even[1:]
    else:
        even_r = np.concatenate([even[1:], even[-1:]], axis=0)
    return odd + coef * (even[:no] + even_r)


def _update_step(even: np.ndarray, d: np.ndarray, coef: float) -> np.ndarray:
    """even' = even + coef*(dL + dR) with whole-point mirrors."""
    if even.shape[0] > d.shape[0]:  # n odd
        d_l = np.concatenate([d[:1], d], axis=0)
        d_r = np.concatenate([d, d[-1:]], axis=0)
    else:
        d_l = np.concatenate([d[:1], d[:-1]], axis=0)
        d_r = d
    return even + coef * (d_l + d_r)


def _fwd97_axis0(a: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    n = a.shape[0]
    if n == 1:
        return a.copy(), a[:0]
    even = a[0::2].astype(np.float64)
    odd = a[1::2].astype(np.float64)
    d = _pair_step(even, odd, _ALPHA)
    s = _update_step(even, d, _BETA)
    d = _pair_step(s, d, _GAMMA)
    s = _update_step(s, d, _DELTA)
    return s * (1.0 / _KSCALE), d * _KSCALE


def _inv97_axis0(s: np.ndarray, d: np.ndarray, n: int) -> np.ndarray:
    if n == 1:
        return s.copy()
    s = s * _KSCALE
    d = d * (1.0 / _KSCALE)
    s = _update_step(s, d, -_DELTA)
    d = _pair_step(s, d, -_GAMMA)
    s = _update_step(s, d, -_BETA)
    d = _pair_step(s, d, -_ALPHA)
    out = np.empty((n,) + s.shape[1:], dtype=np.float64)
    out[0::2] = s
    out[1::2] = d
    return out


def _fwd97_2d(tile: np.ndarray, levels: int) -> np.ndarray:
    a = tile.astype(np.float64).copy()
    h, w = a.shape
    for _ in range(levels):
        sub = a[:h, :w]
        lo, hi = _fwd97_axis0(sub.T)
        sub2 = np.concatenate([lo, hi], axis=0).T
        lo2, hi2 = _fwd97_axis0(sub2)
        a[:h, :w] = np.concatenate([lo2, hi2], axis=0)
        w = (w + 1) // 2
        h = (h + 1) // 2
    return a


def _inv97_2d(a: np.ndarray, levels: int) -> np.ndarray:
    h0, w0 = a.shape
    dims = [(h0, w0)]
    for _ in range(levels):
        h, w = dims[-1]
        dims.append(((h + 1) // 2, (w + 1) // 2))
    out = a.astype(np.float64).copy()
    for lev in range(levels, 0, -1):
        h, w = dims[lev - 1]
        hl = (h + 1) // 2
        wl = (w + 1) // 2
        sub = out[:h, :w]
        merged = _inv97_axis0(sub[:hl, :], sub[hl:, :], h)
        mt = merged.T
        merged2 = _inv97_axis0(mt[:wl, :], mt[wl:, :], w).T
        out[:h, :w] = merged2
    return out


def _qstep(eps: int, mant: int, rb: int) -> float:
    """Scalar quantizer step (T.800 E.1): 2^(Rb-eps) * (1 + mu/2^11).
    Both sides derive the step from the STORED (eps, mu) so encoder
    and decoder use the identical value."""
    return (2.0 ** (rb - eps)) * (1.0 + mant / 2048.0)


def _qparams_for_step(step: float, rb: int) -> tuple[int, int]:
    """(eps, mu) whose _qstep best matches the requested step."""
    import math

    e = rb - math.floor(math.log2(step))
    mu = int(round((step / (2.0 ** (rb - e)) - 1.0) * 2048.0))
    if mu < 0:
        mu = 0
    if mu > 2047:
        mu = 2047
    if not 0 <= e <= 31:
        raise ValueError("jp2: quantizer step out of range")
    return e, mu


# --------------------------------------------------------------------------
# Tier-1: EBCOT code-block coder (T.800 Annex D)
# --------------------------------------------------------------------------

_BAND_LL, _BAND_HL, _BAND_LH, _BAND_HH = 0, 1, 2, 3
# context-table family: 0 = LL/LH (H-priority), 1 = HL (transposed),
# 2 = HH (diagonal-priority)
_BAND_FAMILY = {_BAND_LL: 0, _BAND_LH: 0, _BAND_HL: 1, _BAND_HH: 2}


def _ctx_from_counts(hsum: int, vsum: int, dsum: int, fam: int) -> int:
    """Significance-coding context from neighbor significance counts
    (T.800 Table D.1).  fam: 0 = LL/LH, 1 = HL (transposed), 2 = HH."""
    if fam == 1:
        hsum, vsum = vsum, hsum
    if fam != 2:
        if hsum == 2:
            return 8
        if hsum == 1:
            if vsum >= 1:
                return 7
            return 6 if dsum >= 1 else 5
        if vsum == 2:
            return 4
        if vsum == 1:
            return 3
        if dsum >= 2:
            return 2
        return 1 if dsum == 1 else 0
    hv = hsum + vsum
    if dsum >= 3:
        return 8
    if dsum == 2:
        return 7 if hv >= 1 else 6
    if dsum == 1:
        if hv >= 2:
            return 5
        return 4 if hv == 1 else 3
    if hv >= 2:
        return 2
    return 1 if hv == 1 else 0


# 45-entry LUTs indexed nh*15 + nv*5 + nd (nh, nv <= 2; nd <= 4) — the
# hot passes maintain neighbor counts incrementally instead of
# re-reading 8 neighbors per visit.
_SIG_LUTS = tuple(
    bytes(
        _ctx_from_counts(a, b, c, fam)
        for a in range(3) for b in range(3) for c in range(5)
    )
    for fam in (0, 1, 2)
)


def _ctx_sig(sigma, w, h, x, y, fam):
    """Reference (non-incremental) context computation — used by the
    tests to pin the LUT path and by nothing on the hot path."""
    idx = y * w + x
    left = sigma[idx - 1] if x > 0 else 0
    right = sigma[idx + 1] if x < w - 1 else 0
    up = sigma[idx - w] if y > 0 else 0
    down = sigma[idx + w] if y < h - 1 else 0
    dsum = 0
    if y > 0:
        if x > 0:
            dsum += sigma[idx - w - 1]
        if x < w - 1:
            dsum += sigma[idx - w + 1]
    if y < h - 1:
        if x > 0:
            dsum += sigma[idx + w - 1]
        if x < w - 1:
            dsum += sigma[idx + w + 1]
    return _ctx_from_counts(left + right, up + down, dsum, fam)


def _ctx_sign(sigma, signs, w, h, x, y):
    """Sign-coding context + XOR bit (T.800 Tables D.3/D.4)."""
    idx = y * w + x

    def contrib(i):
        if not sigma[i]:
            return 0
        return -1 if signs[i] else 1

    hc = 0
    if x > 0:
        hc += contrib(idx - 1)
    if x < w - 1:
        hc += contrib(idx + 1)
    hc = max(-1, min(1, hc))
    vc = 0
    if y > 0:
        vc += contrib(idx - w)
    if y < h - 1:
        vc += contrib(idx + w)
    vc = max(-1, min(1, vc))
    if hc == 1:
        return (13, 0) if vc == 1 else (12, 0) if vc == 0 else (11, 0)
    if hc == 0:
        return (10, 0) if vc == 1 else (9, 0) if vc == 0 else (10, 1)
    return (11, 1) if vc == 1 else (12, 1) if vc == 0 else (13, 1)


def _t1_encode(mags, signs, w, h, fam, nbits, mq: _MQEncoder) -> int:
    """Encode all passes of one code-block; returns pass count.

    Neighbor significance is maintained incrementally (nh/nv/nd
    bumped once when a sample becomes significant) so each visit is
    a 45-entry LUT index instead of an 8-neighbor re-read; the LUT
    is pinned against the direct Table-D.1 evaluation in tests."""
    n = w * h
    sigma = bytearray(n)
    pi = bytearray(n)
    refined = bytearray(n)
    nh = bytearray(n)
    nv = bytearray(n)
    nd = bytearray(n)
    lut = _SIG_LUTS[fam]
    enc = mq.encode

    def mark(idx, x, y):
        sigma[idx] = 1
        if x > 0:
            nh[idx - 1] += 1
            if y > 0:
                nd[idx - w - 1] += 1
            if y < h - 1:
                nd[idx + w - 1] += 1
        if x < w - 1:
            nh[idx + 1] += 1
            if y > 0:
                nd[idx - w + 1] += 1
            if y < h - 1:
                nd[idx + w + 1] += 1
        if y > 0:
            nv[idx - w] += 1
        if y < h - 1:
            nv[idx + w] += 1

    npasses = 0
    for plane in range(nbits - 1, -1, -1):
        first = plane == nbits - 1
        if not first:
            # significance propagation
            for s0 in range(0, h, 4):
                smax = min(s0 + 4, h)
                for x in range(w):
                    for y in range(s0, smax):
                        idx = y * w + x
                        if sigma[idx]:
                            continue
                        a = nh[idx]
                        b = nv[idx]
                        c = nd[idx]
                        if not (a or b or c):
                            continue
                        bit = (mags[idx] >> plane) & 1
                        enc(bit, lut[a * 15 + b * 5 + c])
                        pi[idx] = 1
                        if bit:
                            mark(idx, x, y)
                            scx, sxor = _ctx_sign(sigma, signs, w, h, x, y)
                            enc(signs[idx] ^ sxor, scx)
            npasses += 1
            # magnitude refinement
            for s0 in range(0, h, 4):
                smax = min(s0 + 4, h)
                for x in range(w):
                    for y in range(s0, smax):
                        idx = y * w + x
                        if not sigma[idx] or pi[idx]:
                            continue
                        if refined[idx]:
                            cx = 16
                        else:
                            cx = 15 if (nh[idx] or nv[idx] or nd[idx]) \
                                else 14
                        enc((mags[idx] >> plane) & 1, cx)
                        refined[idx] = 1
            npasses += 1
        # cleanup
        for s0 in range(0, h, 4):
            smax = min(s0 + 4, h)
            for x in range(w):
                ystart = s0
                if smax - s0 == 4:
                    rl = True
                    for y in range(s0, smax):
                        idx = y * w + x
                        if sigma[idx] or pi[idx] or nh[idx] or nv[idx] \
                                or nd[idx]:
                            rl = False
                            break
                    if rl:
                        r = -1
                        for y in range(s0, smax):
                            if (mags[y * w + x] >> plane) & 1:
                                r = y - s0
                                break
                        if r < 0:
                            enc(0, _CTX_RL)
                            continue
                        enc(1, _CTX_RL)
                        enc((r >> 1) & 1, _CTX_UNI)
                        enc(r & 1, _CTX_UNI)
                        y = s0 + r
                        idx = y * w + x
                        mark(idx, x, y)
                        scx, sxor = _ctx_sign(sigma, signs, w, h, x, y)
                        enc(signs[idx] ^ sxor, scx)
                        ystart = y + 1
                for y in range(ystart, smax):
                    idx = y * w + x
                    if sigma[idx] or pi[idx]:
                        continue
                    bit = (mags[idx] >> plane) & 1
                    enc(bit, lut[nh[idx] * 15 + nv[idx] * 5 + nd[idx]])
                    if bit:
                        mark(idx, x, y)
                        scx, sxor = _ctx_sign(sigma, signs, w, h, x, y)
                        enc(signs[idx] ^ sxor, scx)
        npasses += 1
        pi = bytearray(n)
    return npasses


def _t1_decode(mq: _MQDecoder, w, h, fam, nbits, npasses):
    """Decode npasses passes; returns (mags, signs) flat lists."""
    n = w * h
    sigma = bytearray(n)
    pi = bytearray(n)
    refined = bytearray(n)
    nh = bytearray(n)
    nv = bytearray(n)
    nd = bytearray(n)
    mags = [0] * n
    signs = bytearray(n)
    lut = _SIG_LUTS[fam]
    dec = mq.decode

    def mark(idx, x, y):
        sigma[idx] = 1
        if x > 0:
            nh[idx - 1] += 1
            if y > 0:
                nd[idx - w - 1] += 1
            if y < h - 1:
                nd[idx + w - 1] += 1
        if x < w - 1:
            nh[idx + 1] += 1
            if y > 0:
                nd[idx - w + 1] += 1
            if y < h - 1:
                nd[idx + w + 1] += 1
        if y > 0:
            nv[idx - w] += 1
        if y < h - 1:
            nv[idx + w] += 1

    left = npasses
    for plane in range(nbits - 1, -1, -1):
        first = plane == nbits - 1
        if not first:
            if left <= 0:
                break
            for s0 in range(0, h, 4):
                smax = min(s0 + 4, h)
                for x in range(w):
                    for y in range(s0, smax):
                        idx = y * w + x
                        if sigma[idx]:
                            continue
                        a = nh[idx]
                        b = nv[idx]
                        c = nd[idx]
                        if not (a or b or c):
                            continue
                        bit = dec(lut[a * 15 + b * 5 + c])
                        pi[idx] = 1
                        if bit:
                            mark(idx, x, y)
                            mags[idx] = 1 << plane
                            scx, sxor = _ctx_sign(sigma, signs, w, h, x, y)
                            signs[idx] = dec(scx) ^ sxor
            left -= 1
            if left <= 0:
                break
            for s0 in range(0, h, 4):
                smax = min(s0 + 4, h)
                for x in range(w):
                    for y in range(s0, smax):
                        idx = y * w + x
                        if not sigma[idx] or pi[idx]:
                            continue
                        if refined[idx]:
                            cx = 16
                        else:
                            cx = 15 if (nh[idx] or nv[idx] or nd[idx]) \
                                else 14
                        if dec(cx):
                            mags[idx] |= 1 << plane
                        refined[idx] = 1
            left -= 1
        if left <= 0:
            break
        for s0 in range(0, h, 4):
            smax = min(s0 + 4, h)
            for x in range(w):
                ystart = s0
                if smax - s0 == 4:
                    rl = True
                    for y in range(s0, smax):
                        idx = y * w + x
                        if sigma[idx] or pi[idx] or nh[idx] or nv[idx] \
                                or nd[idx]:
                            rl = False
                            break
                    if rl:
                        if not dec(_CTX_RL):
                            continue
                        r = (dec(_CTX_UNI) << 1) | dec(_CTX_UNI)
                        y = s0 + r
                        idx = y * w + x
                        mark(idx, x, y)
                        mags[idx] = 1 << plane
                        scx, sxor = _ctx_sign(sigma, signs, w, h, x, y)
                        signs[idx] = dec(scx) ^ sxor
                        ystart = y + 1
                for y in range(ystart, smax):
                    idx = y * w + x
                    if sigma[idx] or pi[idx]:
                        continue
                    if dec(lut[nh[idx] * 15 + nv[idx] * 5 + nd[idx]]):
                        mark(idx, x, y)
                        mags[idx] = 1 << plane
                        scx, sxor = _ctx_sign(sigma, signs, w, h, x, y)
                        signs[idx] = dec(scx) ^ sxor
        left -= 1
        pi = bytearray(n)
        if left <= 0:
            break
    return mags, signs


# --------------------------------------------------------------------------
# Tier-2: band layout, packets, markers (T.800 Annexes A/B)
# --------------------------------------------------------------------------

_GAIN = {_BAND_LL: 0, _BAND_HL: 1, _BAND_LH: 1, _BAND_HH: 2}
_GUARD = 2

_SOC = 0xFF4F
_SIZ = 0xFF51
_COD = 0xFF52
_COC = 0xFF53
_QCD = 0xFF5C
_QCC = 0xFF5D
_RGN = 0xFF5E
_POC = 0xFF5F
_COM = 0xFF64
_SOT = 0xFF90
_SOD = 0xFF93
_EOC = 0xFFD9


def _band_layout(W: int, H: int, NL: int):
    """Per resolution r=0..NL: list of (band_type, x0, y0, w, h) in
    the Mallat-layout coordinates of the full tile array."""
    sizes = [(W, H)]
    for _ in range(NL):
        w, h = sizes[-1]
        sizes.append(((w + 1) // 2, (h + 1) // 2))
    res = [[(_BAND_LL, 0, 0, sizes[NL][0], sizes[NL][1])]]
    for r in range(1, NL + 1):
        lev = NL - r + 1
        wp, hp = sizes[lev - 1]
        wl, hl = sizes[lev]
        res.append([
            (_BAND_HL, wl, 0, wp - wl, hl),
            (_BAND_LH, 0, hl, wl, hp - hl),
            (_BAND_HH, wl, hl, wp - wl, hp - hl),
        ])
    return res


def _ilog2(n: int) -> int:
    return n.bit_length() - 1


def _put_npasses(w: _HeadWriter, n: int) -> None:
    if n == 1:
        w.put(0)
    elif n == 2:
        w.put(1)
        w.put(0)
    elif n <= 5:
        w.put_bits(0b11, 2)
        w.put_bits(n - 3, 2)
    elif n <= 36:
        w.put_bits(0b1111, 4)
        w.put_bits(n - 6, 5)
    elif n <= 164:
        w.put_bits(0b111111111, 9)
        w.put_bits(n - 37, 7)
    else:
        raise ValueError("jp2: > 164 coding passes")


def _get_npasses(r: _HeadReader) -> int:
    if not r.get():
        return 1
    if not r.get():
        return 2
    v = r.get_bits(2)
    if v < 3:
        return 3 + v
    v = r.get_bits(5)
    if v < 31:
        return 6 + v
    return 37 + r.get_bits(7)


def _cb_grid(bw: int, bh: int, cb: int):
    if bw <= 0 or bh <= 0:
        return 0, 0
    return (bw + cb - 1) // cb, (bh + cb - 1) // cb


def _encode_packet(bands_blocks) -> bytes:
    """bands_blocks: list of (nbx, nby, mb, blocks) where blocks[i]
    is None (all-zero, excluded) or (zp, npasses, data)."""
    total = sum(len(b[3]) for b in bands_blocks)
    incl_any = any(blk is not None for b in bands_blocks for blk in b[3])
    w = _HeadWriter()
    if total == 0 or not incl_any:
        w.put(0)
        return w.finish()
    w.put(1)
    body = []
    for nbx, nby, mb, blocks in bands_blocks:
        if nbx == 0 or nby == 0:
            continue
        incl = _TagTree(nbx, nby)
        incl.set_values([0 if blk is not None else 1 for blk in blocks])
        zpt = _TagTree(nbx, nby)
        zpt.set_values([blk[0] if blk is not None else mb for blk in blocks])
        for i, blk in enumerate(blocks):
            bx, by = i % nbx, i // nbx
            incl.encode(w, bx, by, 1)
            if blk is None:
                continue
            zp, npasses, data = blk
            zpt.encode(w, bx, by, zp + 1)
            _put_npasses(w, npasses)
            lblock = 3
            bits = lblock + _ilog2(npasses)
            while bits < len(data).bit_length():
                w.put(1)
                bits += 1
            w.put(0)
            w.put_bits(len(data), bits)
            body.append(data)
    return w.finish() + b"".join(body)


def _decode_packet(data: bytes, pos: int, bands_blocks):
    """Mirror of _encode_packet.  bands_blocks: list of (nbx, nby)
    per band.  Returns (new_pos, per-band list of block entries
    (None | (npasses_left_unused, zp, npasses, segment bytes)))."""
    r = _HeadReader(data, pos)
    out = [[None] * (nbx * nby) for nbx, nby in bands_blocks]
    if not r.get():
        return r.align(), out
    lens = []
    for bi, (nbx, nby) in enumerate(bands_blocks):
        if nbx == 0 or nby == 0:
            continue
        incl = _TagTree(nbx, nby)
        zpt = _TagTree(nbx, nby)
        for i in range(nbx * nby):
            bx, by = i % nbx, i // nbx
            _, known = incl.decode(r, bx, by, 1)
            if not known:
                continue
            zp = zpt.decode_value(r, bx, by)
            npasses = _get_npasses(r)
            lblock = 3
            while r.get():
                lblock += 1
            seglen = r.get_bits(lblock + _ilog2(npasses))
            lens.append((bi, i, zp, npasses, seglen))
    pos = r.align()
    for bi, i, zp, npasses, seglen in lens:
        out[bi][i] = (zp, npasses, data[pos:pos + seglen])
        pos += seglen
    return pos, out


def _seg(marker: int, payload: bytes) -> bytes:
    return struct.pack(">HH", marker, len(payload) + 2) + payload


def encode_j2k(arr: np.ndarray, levels: int = 2, cb_exp: int = 6,
               lossy: bool = False, step: float = 0.5) -> bytes:
    """JPEG 2000 codestream (.j2c) for a (h, w) or (h, w, c)
    uint8/uint16/int16 array; single tile, LRCP, 1 layer.  `levels` =
    DWT decomposition count (0..8); `cb_exp` = log2 code-block side
    (2..6).  Default is the 5/3 reversible (lossless) path;
    `lossy=True` switches to the 9/7 irreversible transform with
    scalar quantization (T.800 E.1, expounded QCD) at base step
    `step` per band — step 0.5 lands far above the 40 dB PSNR bar on
    8-bit imagery."""
    arr = np.asarray(arr)
    if arr.ndim == 2:
        comps = [arr]
    elif arr.ndim == 3 and 1 <= arr.shape[2] <= 4:
        comps = [arr[:, :, c] for c in range(arr.shape[2])]
    else:
        raise ValueError("jp2: need (h,w) or (h,w,1..4) array")
    if arr.dtype not in (np.uint8, np.uint16, np.int16, np.int8):
        raise ValueError("jp2: dtype must be u8/u16/i8/i16")
    if not (0 <= levels <= 8):
        raise ValueError("jp2: levels must be 0..8")
    if not (2 <= cb_exp <= 6):
        raise ValueError("jp2: cb_exp must be 2..6")
    H, W = arr.shape[:2]
    if W < 1 or H < 1:
        raise ValueError("jp2: empty image")
    depth = arr.dtype.itemsize * 8
    signed = arr.dtype.kind == "i"
    cb = 1 << cb_exp
    layout = _band_layout(W, H, levels)
    nbands = 3 * levels + 1
    shift = 0 if signed else 1 << (depth - 1)

    # pass 1: DWT (+ scalar quantization when lossy) + per-band max
    # coefficient bits across components
    band_list = [bt for bands in layout for (bt, _x, _y, _w, _h) in bands]
    qmus = None
    if lossy:
        if not (step > 0):
            raise ValueError("jp2: quantizer step must be positive")
        qparams = [_qparams_for_step(step, depth + _GAIN[bt])
                   for bt in band_list]
    coeffs = []
    max_nbits = [0] * nbands
    for comp in comps:
        if lossy:
            cff = _fwd97_2d(comp.astype(np.float64) - shift, levels)
            cf = np.zeros(cff.shape, dtype=np.int64)
            bi = 0
            for bands in layout:
                for (bt, x0, y0, bw, bh) in bands:
                    if bw > 0 and bh > 0:
                        e, mu = qparams[bi]
                        delta = _qstep(e, mu, depth + _GAIN[bt])
                        reg = cff[y0:y0 + bh, x0:x0 + bw]
                        q = np.floor(np.abs(reg) / delta).astype(np.int64)
                        cf[y0:y0 + bh, x0:x0 + bw] = np.where(
                            reg < 0, -q, q)
                    bi += 1
        else:
            cf = _fwd53_2d(comp.astype(np.int64) - shift, levels)
        coeffs.append(cf)
        bi = 0
        for bands in layout:
            for (_bt, x0, y0, bw, bh) in bands:
                if bw > 0 and bh > 0:
                    m = int(np.abs(cf[y0:y0 + bh, x0:x0 + bw]).max())
                    max_nbits[bi] = max(max_nbits[bi], m.bit_length())
                bi += 1
    if lossy:
        eps = [e for (e, _mu) in qparams]
        qmus = [mu for (_e, mu) in qparams]
        guard = 2
        for bi in range(nbands):
            guard = max(guard, max_nbits[bi] - eps[bi] + 1)
        if guard > 7:
            raise ValueError("jp2: quantized magnitudes exceed guard range")
    else:
        # exponents: enough head-room for the data, at least depth+gain
        guard = _GUARD
        eps = []
        bi = 0
        for bands in layout:
            for (bt, _x0, _y0, _bw, _bh) in bands:
                eps.append(max(depth + _GAIN[bt],
                               max_nbits[bi] - _GUARD + 1))
                bi += 1

    # pass 2: Tier-1 encode every code-block
    packets = []  # LRCP: r-major, then component
    for r, bands in enumerate(layout):
        base_bi = sum(len(b) for b in layout[:r])
        for cf in coeffs:
            bands_blocks = []
            for k, (bt, x0, y0, bw, bh) in enumerate(bands):
                mb = eps[base_bi + k] + guard - 1
                nbx, nby = _cb_grid(bw, bh, cb)
                blocks = []
                fam = _BAND_FAMILY[bt]
                for iy in range(nby):
                    for ix in range(nbx):
                        w0 = min(cb, bw - ix * cb)
                        h0 = min(cb, bh - iy * cb)
                        sub = cf[y0 + iy * cb:y0 + iy * cb + h0,
                                 x0 + ix * cb:x0 + ix * cb + w0]
                        mags = np.abs(sub).astype(np.int64)
                        maxm = int(mags.max()) if mags.size else 0
                        nbits = maxm.bit_length()
                        if nbits == 0:
                            blocks.append(None)
                            continue
                        zp = mb - nbits
                        if zp < 0:  # cannot happen with data-driven eps
                            raise AssertionError("jp2: guard overflow")
                        signs = (sub < 0).astype(np.uint8)
                        mq = _MQEncoder()
                        npasses = _t1_encode(
                            mags.ravel().tolist(),
                            bytearray(signs.ravel().tobytes()),
                            w0, h0, fam, nbits, mq,
                        )
                        blocks.append((zp, npasses, mq.flush()))
                bands_blocks.append((nbx, nby, mb, blocks))
            packets.append(_encode_packet(bands_blocks))

    # markers
    siz = struct.pack(">HIIIIIIIIH", 0, W, H, 0, 0, W, H, 0, 0,
                      len(comps))
    ssiz = (depth - 1) | (0x80 if signed else 0)
    for _ in comps:
        siz += struct.pack(">BBB", ssiz, 1, 1)
    cod = struct.pack(">BBHB", 0, 0, 1, 0)  # Scod, LRCP, 1 layer, no MCT
    cod += struct.pack(">BBBBB", levels, cb_exp - 2, cb_exp - 2, 0,
                       0 if lossy else 1)
    if lossy:
        qcd = struct.pack(">B", (guard << 5) | 2)  # scalar expounded
        for e, mu in zip(eps, qmus):
            qcd += struct.pack(">H", (e << 11) | mu)
    else:
        qcd = struct.pack(">B", (guard << 5) | 0)
        for e in eps:
            qcd += struct.pack(">B", e << 3)
    body = b"".join(packets)
    psot = 12 + 2 + len(body)
    sot = struct.pack(">HIBB", 0, psot, 0, 1)
    return (struct.pack(">H", _SOC) + _seg(_SIZ, siz) + _seg(_COD, cod)
            + _seg(_QCD, qcd) + _seg(_SOT, sot) + struct.pack(">H", _SOD)
            + body + struct.pack(">H", _EOC))


def decode_j2k(buf: bytes, reduce: int = 0) -> np.ndarray:
    """Decode a codestream produced by the subset above (loud errors
    on features outside it).

    ``reduce`` discards the ``reduce`` highest resolutions and
    returns the level-``reduce`` LL plane — GDAL's JP2 overview read
    (frmts/openjpeg/openjpegdataset.cpp builds one overview per
    discarded resolution; opj_set_decoded_resolution_factor): only
    the packets of the retained resolutions are entropy-decoded, so
    the work drops ~4x per level exactly like the reference."""
    buf = bytes(buf)
    if buf[:2] != struct.pack(">H", _SOC):
        raise ValueError("jp2: missing SOC")
    pos = 2
    siz = cod = qcd = None
    while pos < len(buf):
        marker, = struct.unpack_from(">H", buf, pos)
        if marker == _SOT:
            break
        ln, = struct.unpack_from(">H", buf, pos + 2)
        payload = buf[pos + 4:pos + 2 + ln]
        if marker == _SIZ:
            siz = payload
        elif marker == _COD:
            cod = payload
        elif marker == _QCD:
            qcd = payload
        elif marker in (_COC, _QCC, _RGN, _POC):
            raise ValueError(f"jp2: unsupported marker 0x{marker:04X}")
        elif marker == _COM:
            pass
        else:
            raise ValueError(f"jp2: unexpected marker 0x{marker:04X}")
        pos += 2 + ln
    if siz is None or cod is None or qcd is None:
        raise ValueError("jp2: missing SIZ/COD/QCD")
    (rsiz, W, H, x0, y0, tw, th, tx0, ty0, ncomp) = struct.unpack_from(
        ">HIIIIIIIIH", siz, 0)
    if rsiz not in (0, 1, 2):
        raise ValueError("jp2: unsupported Rsiz")
    if (x0, y0, tx0, ty0) != (0, 0, 0, 0) or tw < W or th < H:
        raise ValueError("jp2: multi-tile / offset grids unsupported")
    ssiz0 = None
    for c in range(ncomp):
        ssiz, xr, yr = struct.unpack_from(">BBB", siz, 36 + 3 * c)
        if (xr, yr) != (1, 1):
            raise ValueError("jp2: subsampled components unsupported")
        if ssiz0 is None:
            ssiz0 = ssiz
        elif ssiz != ssiz0:
            raise ValueError("jp2: mixed component depths unsupported")
    depth = (ssiz0 & 0x7F) + 1
    signed = bool(ssiz0 & 0x80)
    scod, prog, nlayers, mct = struct.unpack_from(">BBHB", cod, 0)
    if scod & 0x01:
        raise ValueError("jp2: explicit precincts unsupported")
    if prog != 0 or nlayers != 1 or mct != 0:
        raise ValueError("jp2: only LRCP / 1 layer / no MCT supported")
    levels, xcb, ycb, cbstyle, transform = struct.unpack_from(">BBBBB",
                                                              cod, 5)
    if cbstyle != 0:
        raise ValueError("jp2: code-block style modes unsupported")
    if transform not in (0, 1):
        raise ValueError("jp2: unknown wavelet transform byte")
    if xcb != ycb or not (0 <= xcb <= 4):
        raise ValueError("jp2: non-square / oversized code-blocks")
    cb = 1 << (xcb + 2)
    sqcd = qcd[0]
    qstyle = sqcd & 0x1F
    guard = sqcd >> 5
    if qstyle == 0:
        if transform != 1:
            raise ValueError("jp2: no-quantization QCD needs the 5/3")
        eps = [b >> 3 for b in qcd[1:]]
        qmus = None
    elif qstyle == 2:
        if transform != 0:
            raise ValueError("jp2: expounded QCD needs the 9/7")
        vals = [struct.unpack_from(">H", qcd, 1 + 2 * i)[0]
                for i in range((len(qcd) - 1) // 2)]
        eps = [v >> 11 for v in vals]
        qmus = [v & 0x7FF for v in vals]
    else:
        raise ValueError("jp2: scalar-derived quantization unsupported")
    layout = _band_layout(W, H, levels)
    if len(eps) < 3 * levels + 1:
        raise ValueError("jp2: QCD subband count mismatch")

    # tile-part
    marker, ln = struct.unpack_from(">HH", buf, pos)
    isot, psot, tpsot, tnsot = struct.unpack_from(">HIBB", buf, pos + 4)
    if isot != 0 or tpsot != 0:
        raise ValueError("jp2: multiple tiles/tile-parts unsupported")
    sod_at = pos + 2 + ln
    if struct.unpack_from(">H", buf, sod_at)[0] != _SOD:
        raise ValueError("jp2: SOT not followed by SOD")
    body_start = sod_at + 2
    body_end = pos + psot if psot else len(buf) - 2
    data = buf[body_start:body_end]

    if not (0 <= reduce <= levels):
        raise ValueError(
            f"jp2: reduce must be 0..{levels} for this stream")
    keep = levels - reduce  # retained resolutions: 0..keep

    out = [np.zeros((H, W), dtype=np.int64) for _ in range(ncomp)]
    p = 0
    for r, bands in enumerate(layout[: keep + 1]):
        base_bi = sum(len(b) for b in layout[:r])
        for c in range(ncomp):
            grids = [_cb_grid(bw, bh, cb) for (_bt, _x, _y, bw, bh) in bands]
            p, per_band = _decode_packet(data, p, grids)
            for k, (bt, x0b, y0b, bw, bh) in enumerate(bands):
                nbx, nby = grids[k]
                mb = eps[base_bi + k] + guard - 1
                fam = _BAND_FAMILY[bt]
                for i, blk in enumerate(per_band[k]):
                    if blk is None:
                        continue
                    zp, npasses, seg = blk
                    nbits = mb - zp
                    if nbits <= 0:
                        raise ValueError("jp2: bad zero-bitplane count")
                    ix, iy = i % nbx, i // nbx
                    w0 = min(cb, bw - ix * cb)
                    h0 = min(cb, bh - iy * cb)
                    mq = _MQDecoder(seg)
                    mags, signs = _t1_decode(mq, w0, h0, fam, nbits,
                                             npasses)
                    vals = np.array(mags, dtype=np.int64).reshape(h0, w0)
                    sgn = np.frombuffer(bytes(signs), dtype=np.uint8)
                    vals[sgn.reshape(h0, w0) == 1] *= -1
                    out[c][y0b + iy * cb:y0b + iy * cb + h0,
                           x0b + ix * cb:x0b + ix * cb + w0] = vals

    shift = 0 if signed else 1 << (depth - 1)
    dtype = (np.int8 if depth <= 8 else np.int16) if signed else \
        (np.uint8 if depth <= 8 else np.uint16)
    hk, wk = H, W
    for _ in range(reduce):
        hk, wk = (hk + 1) // 2, (wk + 1) // 2
    lo = np.iinfo(dtype).min
    hi = np.iinfo(dtype).max
    if qmus is None:
        # exact for reduce == 0; at reduce > 0 the LL low-pass can
        # overshoot the nominal range on hard edges -> clip like the
        # reference's overview read
        planes = [
            np.clip(_inv53_2d(o[:hk, :wk], keep) + shift, lo, hi)
            .astype(dtype)
            for o in out
        ]
    else:
        planes = []
        for o in out:
            deq = np.zeros((hk, wk), dtype=np.float64)
            bi = 0
            for bands in layout[: keep + 1]:
                for (bt, x0b, y0b, bw, bh) in bands:
                    if bw > 0 and bh > 0:
                        delta = _qstep(eps[bi], qmus[bi],
                                       depth + _GAIN[bt])
                        q = o[y0b:y0b + bh, x0b:x0b + bw]
                        # midpoint reconstruction (T.800 E.1.1.2, r=1/2)
                        deq[y0b:y0b + bh, x0b:x0b + bw] = np.where(
                            q > 0, (q + 0.5) * delta,
                            np.where(q < 0, (q - 0.5) * delta, 0.0))
                    bi += 1
                # QCD indexes every subband of the FULL stream
            pix = _inv97_2d(deq, keep) + shift
            planes.append(
                np.clip(np.floor(pix + 0.5), lo, hi).astype(dtype))
    if ncomp == 1:
        return planes[0]
    return np.stack(planes, axis=-1)


# --------------------------------------------------------------------------
# JP2 box container (T.800 Annex I)
# --------------------------------------------------------------------------


def _box(btype: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", 8 + len(payload)) + btype + payload


# GeoJP2 uuid (gdal/gcore gdaljp2metadata.cpp msi_uuid2): marks a
# degenerate GeoTIFF whose tags georeference the JP2 image grid.
_GEOJP2_UUID = bytes.fromhex("b14bf8bd083d4b43a5ae8cd7d5a6ce03")


def encode_jp2(arr: np.ndarray, levels: int = 2, cb_exp: int = 6,
               geo: tuple | None = None, lossy: bool = False,
               step: float = 0.5) -> bytes:
    """JP2 file: signature/ftyp/jp2h(ihdr+colr)/jp2c boxes around the
    codestream (lossless 5/3 by default; `lossy=True` = 9/7 at
    quantizer `step`).  `geo` = (gdal 6-term geotransform, epsg)
    adds a GeoJP2 uuid box (a 1x1 GeoTIFF carrying the tags, the
    reference's msi_uuid2 convention)."""
    arr = np.asarray(arr)
    cs = encode_j2k(arr, levels=levels, cb_exp=cb_exp, lossy=lossy,
                    step=step)
    h, w = arr.shape[:2]
    nc = 1 if arr.ndim == 2 else arr.shape[2]
    depth = arr.dtype.itemsize * 8
    signed = arr.dtype.kind == "i"
    sig = struct.pack(">I", 12) + b"jP  " + b"\r\n\x87\n"
    ftyp = _box(b"ftyp", b"jp2 " + struct.pack(">I", 0) + b"jp2 ")
    ihdr = _box(b"ihdr", struct.pack(
        ">IIHBBBB", h, w, nc, (depth - 1) | (0x80 if signed else 0),
        7, 0, 0))
    colr = _box(b"colr", struct.pack(">BBB", 1, 0, 0)
                + struct.pack(">I", 16 if nc >= 3 else 17))
    out = sig + ftyp + _box(b"jp2h", ihdr + colr)
    if geo is not None:
        from gdal_spark.raster.tiff import encode_tiff

        degen = encode_tiff(np.zeros((1, 1), dtype=np.uint8), geo=geo)
        out += _box(b"uuid", _GEOJP2_UUID + degen)
    return out + _box(b"jp2c", cs)


def _iter_boxes(buf: bytes):
    """Yield (box_type, payload_start, box_end) over a JP2 box
    stream.  Handles XLBox extended lengths and the to-end-of-file
    ln==0 form; a corrupt length that fails to advance stops the
    walk (callers treat a missing box as not-found)."""
    pos = 0
    n = len(buf)
    while pos + 8 <= n:
        ln, = struct.unpack_from(">I", buf, pos)
        btype = buf[pos + 4:pos + 8]
        start = pos + 8
        if ln == 1:  # extended length
            if pos + 16 > n:
                return
            ln, = struct.unpack_from(">Q", buf, pos + 8)
            start = pos + 16
        elif ln == 0:
            ln = n - pos
        if ln < start - pos:  # corrupt: would not advance
            return
        yield btype, start, pos + ln
        pos += ln


def read_jp2_georef(buf: bytes):
    """(geotransform, epsg) from a GeoJP2 uuid box, or None."""
    from gdal_spark.raster.tiff import read_georef

    buf = bytes(buf)
    if buf[4:8] != b"jP  ":
        return None
    for btype, start, end in _iter_boxes(buf):
        if btype == b"uuid" and buf[start:start + 16] == _GEOJP2_UUID:
            return read_georef(buf[start + 16:end])
    return None


def decode_jp2(buf: bytes, reduce: int = 0) -> np.ndarray:
    """Decode a JP2 file or a bare codestream (``reduce`` = discarded
    resolutions, the overview read — see decode_j2k)."""
    buf = bytes(buf)
    if buf[:2] == struct.pack(">H", _SOC):
        return decode_j2k(buf, reduce=reduce)
    if buf[4:8] != b"jP  ":
        raise ValueError("jp2: not a JP2 file")
    for btype, start, end in _iter_boxes(buf):
        if btype == b"jp2c":
            return decode_j2k(buf[start:end], reduce=reduce)
    raise ValueError("jp2: no jp2c codestream box")
