"""WEBP lossless (VP8L) encoder/decoder, pure numpy/stdlib — the
tile sink's third payload format (apps/gdalalg_raster_tile.cpp:358
offers png/jpeg/webp; the reference encodes WEBP through libwebp,
frmts/webp/webpdataset.cpp).

Implemented VP8L subset (spec: the public "WebP Lossless Bitstream
Specification"):

- RIFF container: RIFF/WEBP + one VP8L chunk;
- LSB-first bitstream: signature 0x2F, 14-bit (w-1, h-1), alpha
  hint, version 0;
- NO transforms, NO color cache, NO entropy-image (meta huffman):
  a single huffman group of the five prefix codes (green+length,
  red, blue, alpha, distance);
- prefix codes: the spec's SIMPLE form (1-2 symbols) and the NORMAL
  form (code-length code over the 19-symbol kCodeLengthCodeOrder;
  this encoder writes every code length literally — no 16/17/18
  RLE symbols — which is valid, just a few hundred bytes larger);
- LZ77 backward references: greedy hash-chain matching over the ARGB
  pixel stream, length/distance emitted with the spec's prefix-coded
  (code, extra-bits) scheme.  Distances are always emitted as LINEAR
  plane codes (dist + 120) — spec-valid for any decoder; the 120
  2-D neighbor plane codes are an optional encoder optimization this
  encoder never emits and this decoder rejects loudly (with no
  external webp in the container, a from-memory 120-entry table
  could not be independently verified — documented subset);
- color cache: the spec's (0x1e35a7bd * ARGB) >> (32 - bits) hash
  cache, green symbols 280.., updated on EVERY emitted pixel
  (literals and backref copies alike).

Canonical code assignment follows the spec (DEFLATE rule: by length,
then symbol order). Length-limited (15) Huffman via Kraft repair.

CAVEAT (documented honestly): this container has no external webp
implementation, so conformance is verified by spec-derived
self-roundtrip + structural assertions only — same validation class
as the repo's other from-scratch codecs (png/jpeg/tiff).
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["encode_webp_lossless", "decode_webp"]

_ORDER = (17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)
_GREEN_ALPHABET = 256 + 24  # base (cache symbols append past this)
_DIST_ALPHABET = 40
_CACHE_MULT = 0x1E35A7BD  # the spec's color-cache hash multiplier


def _prefix_encode(v: int) -> tuple[int, int, int]:
    """LZ77 length/distance prefix coding (the spec's PrefixEncode):
    value >= 1 -> (code, extra_bit_count, extra_bit_value)."""
    if v <= 4:
        return v - 1, 0, 0
    d = v - 1
    hb = d.bit_length() - 1
    eb = hb - 1
    return 2 * hb + ((d >> eb) & 1), eb, d & ((1 << eb) - 1)


def _rev_bits(v: int, n: int) -> int:
    """Extra bits are LSB-first on the wire; the vectorized emitter
    writes MSB-first pairs, so pre-reverse."""
    r = 0
    for _ in range(n):
        r = (r << 1) | (v & 1)
        v >>= 1
    return r


def _lz77_tokens(px: np.ndarray, cache_bits: int, use_lz77: bool):
    """Greedy hash-chain LZ77 + color-cache modeling over the uint32
    ARGB stream -> list of ('lit', argb) / ('cache', idx) /
    ('copy', length, dist).  The modeled cache state matches the
    decoder's exactly (updated for every pixel, init to 0)."""
    n = len(px)
    cache_size = 1 << cache_bits if cache_bits else 0
    cache = np.zeros(cache_size, dtype=np.uint32)
    shift = 32 - cache_bits if cache_bits else 0
    head: dict = {}
    tokens: list = []
    pxi = px.astype(np.int64)  # python-int friendly view
    i = 0
    while i < n:
        if use_lz77 and i + 3 <= n:
            key = (pxi[i], pxi[i + 1], pxi[i + 2])
            j = head.get(key, -1)
            if j >= 0:
                maxl = min(n - i, 4096)
                neq = np.nonzero(px[i : i + maxl] != px[j : j + maxl])[0]
                L = maxl if len(neq) == 0 else int(neq[0])
                if L >= 3:
                    tokens.append(("copy", L, i - j))
                    end = i + L
                    for p in range(i, min(end, n - 2)):
                        head[(pxi[p], pxi[p + 1], pxi[p + 2])] = p
                    if cache_size:
                        run = px[i:end]
                        idxs = (
                            (run.astype(np.uint64) * _CACHE_MULT)
                            & 0xFFFFFFFF
                        ) >> shift
                        cache[idxs] = run  # duplicate idx: last wins
                    i = end
                    continue
            head[key] = i
        v = int(pxi[i])
        if cache_size:
            idx = ((v * _CACHE_MULT) & 0xFFFFFFFF) >> shift
            if int(cache[idx]) == v:
                tokens.append(("cache", idx))
            else:
                tokens.append(("lit", v))
                cache[idx] = v
        else:
            tokens.append(("lit", v))
        i += 1
    return tokens


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, nbits: int) -> None:
        self.acc |= (value & ((1 << nbits) - 1)) << self.nbits
        self.nbits += nbits
        while self.nbits >= 8:
            self.buf.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nbits -= 8

    def finish(self) -> bytes:
        if self.nbits:
            self.buf.append(self.acc & 0xFF)
            self.acc = 0
            self.nbits = 0
        return bytes(self.buf)

    def to_bits(self) -> np.ndarray:
        """Current content as a 0/1 uint8 bit array (LSB-first)."""
        bits = np.unpackbits(
            np.frombuffer(bytes(self.buf), dtype=np.uint8), bitorder="little"
        )
        tail = np.array(
            [(self.acc >> i) & 1 for i in range(self.nbits)], dtype=np.uint8
        )
        return np.concatenate([bits, tail])


class _BitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def read(self, nbits: int) -> int:
        while self.nbits < nbits:
            b = self.data[self.pos] if self.pos < len(self.data) else 0
            self.pos += 1
            self.acc |= b << self.nbits
            self.nbits += 8
        v = self.acc & ((1 << nbits) - 1)
        self.acc >>= nbits
        self.nbits -= nbits
        return v

    def peek(self, nbits: int) -> int:
        while self.nbits < nbits:
            b = self.data[self.pos] if self.pos < len(self.data) else 0
            self.pos += 1
            self.acc |= b << self.nbits
            self.nbits += 8
        return self.acc & ((1 << nbits) - 1)

    def skip(self, nbits: int) -> None:
        self.acc >>= nbits
        self.nbits -= nbits


# ---------------------------------------------------------------------------
# length-limited canonical Huffman
# ---------------------------------------------------------------------------

def _code_lengths(freqs: np.ndarray, max_len: int) -> np.ndarray:
    """Huffman code lengths, limited to max_len via Kraft repair."""
    nz = np.nonzero(freqs)[0]
    lengths = np.zeros(len(freqs), dtype=np.int32)
    if len(nz) == 0:
        return lengths
    if len(nz) == 1:
        lengths[nz[0]] = 1
        return lengths
    import heapq

    heap = [(int(freqs[s]), int(s), (int(s),)) for s in nz]
    heapq.heapify(heap)
    depth: dict[int, int] = {int(s): 0 for s in nz}
    while len(heap) > 1:
        fa, _ta, sa = heapq.heappop(heap)
        fb, _tb, sb = heapq.heappop(heap)
        for s in sa + sb:
            depth[s] += 1
        merged = sa + sb
        heapq.heappush(heap, (fa + fb, min(merged), merged))
    for s, d in depth.items():
        lengths[s] = d
    if lengths.max() > max_len:
        # Kraft repair: clamp, then demote shortest codes until the
        # Kraft sum fits, then promote where slack remains
        lengths[lengths > max_len] = max_len
        kraft = np.sum(2.0 ** (-lengths[lengths > 0]))
        order = np.argsort(lengths)
        while kraft > 1.0:
            for s in order:
                if 0 < lengths[s] < max_len:
                    kraft -= 2.0 ** (-lengths[s])
                    lengths[s] += 1
                    kraft += 2.0 ** (-lengths[s])
                    if kraft <= 1.0:
                        break
    return lengths


def _canonical_codes(lengths: np.ndarray) -> np.ndarray:
    """Spec/DEFLATE canonical assignment: by length, then symbol.
    Returns codes with bits in MSB-first order (the VP8L convention:
    prefix-code bits are written most-significant-first)."""
    codes = np.zeros(len(lengths), dtype=np.int64)
    max_len = int(lengths.max()) if len(lengths) else 0
    code = 0
    bl_count = np.bincount(lengths, minlength=max_len + 1)
    bl_count[0] = 0  # zero-length symbols get no codes (DEFLATE rule)
    next_code = np.zeros(max_len + 2, dtype=np.int64)
    for ln in range(1, max_len + 1):
        code = (code + int(bl_count[ln - 1])) << 1
        next_code[ln] = code
    for s in range(len(lengths)):
        ln = int(lengths[s])
        if ln:
            codes[s] = next_code[ln]
            next_code[ln] += 1
    return codes


def _write_code(bw: _BitWriter, code: int, length: int) -> None:
    # VP8L writes prefix-code bits MSB first
    for i in range(length - 1, -1, -1):
        bw.write((code >> i) & 1, 1)


def _write_prefix_code(bw: _BitWriter, lengths: np.ndarray) -> None:
    nz = np.nonzero(lengths)[0]
    if len(nz) <= 2 and (len(nz) == 0 or nz.max() < 256):
        # SIMPLE code
        bw.write(1, 1)
        if len(nz) == 0:
            # encode a trivial single-symbol-0 code
            bw.write(0, 1)   # num_symbols - 1 = 0
            bw.write(0, 1)   # first symbol in 1 bit
            bw.write(0, 1)   # symbol 0
            return
        bw.write(len(nz) - 1, 1)
        first = int(nz[0])
        if first <= 1:
            bw.write(0, 1)   # 1-bit first symbol
            bw.write(first, 1)
        else:
            bw.write(1, 1)   # 8-bit first symbol
            bw.write(first, 8)
        if len(nz) == 2:
            bw.write(int(nz[1]), 8)
        return
    # NORMAL code: code-length code over symbols 0..15 (no RLE)
    bw.write(0, 1)
    cl_freq = np.bincount(lengths, minlength=16).astype(np.int64)
    cl_lengths = _code_lengths(cl_freq[:16], 7)
    # num_code_lengths: enough slots of _ORDER to cover every used
    # code-length symbol
    used = {i for i in range(16) if cl_lengths[i] > 0}
    num = 4
    for i in range(19):
        if _ORDER[i] in used:
            num = max(num, i + 1)
    bw.write(num - 4, 4)
    for i in range(num):
        sym = _ORDER[i]
        bw.write(int(cl_lengths[sym]) if sym < 16 else 0, 3)
    bw.write(0, 1)  # no max_symbol shortcut: lengths for the full alphabet
    cl_codes = _canonical_codes(cl_lengths)
    for s in range(len(lengths)):
        ln = int(lengths[s])
        _write_code(bw, int(cl_codes[ln]), int(cl_lengths[ln]))


def encode_webp_lossless(
    arr: np.ndarray, use_lz77: bool = True, cache_bits: int = 8
) -> bytes:
    """(h, w, 3|4) uint8 -> .webp bytes (VP8L lossless) with LZ77
    backward references and a color cache (both off: pure literal
    stream, the round-3 behavior)."""
    h, w = arr.shape[:2]
    if arr.ndim == 2:
        arr = np.stack([arr] * 3, axis=2)
    has_alpha = arr.shape[2] == 4
    a = (
        arr[:, :, 3].ravel()
        if has_alpha
        else np.full(h * w, 255, dtype=np.uint8)
    )
    r = arr[:, :, 0].ravel()
    g = arr[:, :, 1].ravel()
    b = arr[:, :, 2].ravel()
    px = (
        a.astype(np.uint32) << 24
        | r.astype(np.uint32) << 16
        | g.astype(np.uint32) << 8
        | b.astype(np.uint32)
    )
    tokens = _lz77_tokens(px, cache_bits, use_lz77)
    if cache_bits and not any(t[0] == "cache" for t in tokens):
        # unused cache would only enlarge the green alphabet header
        cache_bits = 0
    cache_size = 1 << cache_bits if cache_bits else 0
    green_alpha = _GREEN_ALPHABET + cache_size

    bw = _BitWriter()
    bw.write(0x2F, 8)
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(1 if has_alpha else 0, 1)
    bw.write(0, 3)       # version
    bw.write(0, 1)       # no transforms
    if cache_bits:
        bw.write(1, 1)   # color cache present
        bw.write(cache_bits, 4)
    else:
        bw.write(0, 1)
    bw.write(0, 1)       # no entropy image (single huffman group)

    g_freq = np.zeros(green_alpha, dtype=np.int64)
    r_freq = np.zeros(256, dtype=np.int64)
    b_freq = np.zeros(256, dtype=np.int64)
    a_freq = np.zeros(256, dtype=np.int64)
    d_freq = np.zeros(_DIST_ALPHABET, dtype=np.int64)
    for t in tokens:
        if t[0] == "lit":
            v = t[1]
            g_freq[(v >> 8) & 0xFF] += 1
            r_freq[(v >> 16) & 0xFF] += 1
            b_freq[v & 0xFF] += 1
            a_freq[(v >> 24) & 0xFF] += 1
        elif t[0] == "cache":
            g_freq[_GREEN_ALPHABET + t[1]] += 1
        else:
            lcode, _eb, _ev = _prefix_encode(t[1])
            g_freq[256 + lcode] += 1
            dcode, _deb, _dev = _prefix_encode(t[2] + 120)
            d_freq[dcode] += 1
    for freq in (r_freq, b_freq, a_freq):
        if freq.sum() == 0:
            freq[0] = 1  # empty tree still needs one symbol
    if d_freq.sum() == 0:
        d_freq[0] = 1

    trees = []
    for freq in (g_freq, r_freq, b_freq, a_freq, d_freq):
        lengths = _code_lengths(freq, 15)
        _write_prefix_code(bw, lengths)
        if np.count_nonzero(lengths) == 1:
            # a single-symbol prefix code costs ZERO bits per symbol
            lengths = np.zeros_like(lengths)
        trees.append((lengths, _canonical_codes(lengths)))
    (gl, gc), (rl, rc), (bl, bc), (al, ac), (dl, dc) = trees

    # token -> (code, nbits) pair stream, then one vectorized
    # bit-array expansion (codes MSB-first inside the LSB-first byte
    # stream; extra bits pre-reversed so they land LSB-first)
    codes: list[int] = []
    lens: list[int] = []

    def emit(code: int, n: int) -> None:
        if n:
            codes.append(code)
            lens.append(n)

    for t in tokens:
        if t[0] == "lit":
            v = t[1]
            gs = (v >> 8) & 0xFF
            emit(int(gc[gs]), int(gl[gs]))
            rs = (v >> 16) & 0xFF
            emit(int(rc[rs]), int(rl[rs]))
            bs = v & 0xFF
            emit(int(bc[bs]), int(bl[bs]))
            as_ = (v >> 24) & 0xFF
            emit(int(ac[as_]), int(al[as_]))
        elif t[0] == "cache":
            s = _GREEN_ALPHABET + t[1]
            emit(int(gc[s]), int(gl[s]))
        else:
            _kind, L, dist = t
            lcode, leb, lev = _prefix_encode(L)
            s = 256 + lcode
            emit(int(gc[s]), int(gl[s]))
            emit(_rev_bits(lev, leb), leb)
            dcode, deb, dev = _prefix_encode(dist + 120)
            emit(int(dc[dcode]), int(dl[dcode]))
            emit(_rev_bits(dev, deb), deb)

    sym_codes = np.asarray(codes, dtype=np.int64)
    sym_lens = np.asarray(lens, dtype=np.int64)
    total = int(sym_lens.sum())
    offsets = np.zeros(len(sym_lens), dtype=np.int64)
    if len(sym_lens) > 1:
        np.cumsum(sym_lens[:-1], out=offsets[1:])
    sym_idx = np.repeat(np.arange(len(sym_lens)), sym_lens)
    j = np.arange(total, dtype=np.int64) - offsets[sym_idx]
    bits = (
        (sym_codes[sym_idx] >> (sym_lens[sym_idx] - 1 - j)) & 1
    ).astype(np.uint8)
    all_bits = np.concatenate([bw.to_bits(), bits])
    payload = np.packbits(all_bits, bitorder="little").tobytes()
    chunk = b"VP8L" + struct.pack("<I", len(payload)) + payload
    if len(payload) % 2:
        chunk += b"\x00"
    riff = b"WEBP" + chunk
    return b"RIFF" + struct.pack("<I", len(riff)) + riff


# ---------------------------------------------------------------------------
# decoder (subset-matching)
# ---------------------------------------------------------------------------

class _Tree:
    """Peek-LUT prefix decoder: codes are MSB-first in the LSB-first
    stream, so LUT entries index by the BIT-REVERSED code padded to
    max_len peeked bits."""

    __slots__ = ("max_len", "lut_sym", "lut_len", "single")

    def __init__(self, lengths: np.ndarray, single: int | None = None):
        self.single = single
        self.max_len = int(lengths.max()) if len(lengths) else 0
        if single is not None or self.max_len == 0:
            if self.single is None:
                self.single = 0
            self.lut_sym = self.lut_len = None
            return
        codes = _canonical_codes(lengths)
        size = 1 << self.max_len
        self.lut_sym = np.full(size, -1, dtype=np.int32)
        self.lut_len = np.zeros(size, dtype=np.int32)
        for s in range(len(lengths)):
            ln = int(lengths[s])
            if not ln:
                continue
            c = int(codes[s])
            rc = 0
            for i in range(ln):
                rc |= ((c >> i) & 1) << (ln - 1 - i)
            step = 1 << ln
            for v in range(rc, size, step):
                self.lut_sym[v] = s
                self.lut_len[v] = ln
        if (self.lut_sym < 0).any() and len(np.nonzero(lengths)[0]) > 0:
            # incomplete codes leave holes; reads landing there raise
            pass

    def read(self, br: _BitReader) -> int:
        if self.single is not None:
            return self.single
        v = br.peek(self.max_len)
        s = int(self.lut_sym[v])
        if s < 0:
            raise ValueError("invalid prefix code")
        br.skip(int(self.lut_len[v]))
        return s


def _read_prefix_code(br: _BitReader, alphabet: int) -> _Tree:
    lengths = np.zeros(alphabet, dtype=np.int32)
    if br.read(1):  # simple
        n = br.read(1) + 1
        if br.read(1):
            lengths[br.read(8)] = 1
        else:
            lengths[br.read(1)] = 1
        if n == 2:
            lengths[br.read(8)] = 1
        if n == 1:
            # single-symbol: zero-bit code
            s = int(np.nonzero(lengths)[0][0])
            return _Tree(np.zeros_like(lengths), single=s)
        return _Tree(lengths)
    num = br.read(4) + 4
    cl_lengths = np.zeros(19, dtype=np.int32)
    for i in range(num):
        cl_lengths[_ORDER[i]] = br.read(3)
    cl_tree = _Tree(cl_lengths[:16]) if cl_lengths[16:].max() == 0 else None
    if cl_tree is None:
        raise ValueError("RLE code-length symbols not in encoder subset")
    if br.read(1):
        raise ValueError("max_symbol shortcut not in encoder subset")
    for s in range(alphabet):
        lengths[s] = cl_tree.read(br)
    return _Tree(lengths)


def decode_webp(data: bytes) -> np.ndarray:
    """.webp (VP8L lossless, this module's subset) -> (h, w, 4) uint8."""
    if data[:4] != b"RIFF" or data[8:12] != b"WEBP":
        raise ValueError("not a WEBP file")
    if data[12:16] != b"VP8L":
        raise ValueError("only VP8L (lossless) payloads supported")
    (size,) = struct.unpack_from("<I", data, 16)
    br = _BitReader(data[20:20 + size])
    if br.read(8) != 0x2F:
        raise ValueError("bad VP8L signature")
    w = br.read(14) + 1
    h = br.read(14) + 1
    br.read(1)  # alpha hint
    if br.read(3) != 0:
        raise ValueError("unknown VP8L version")
    if br.read(1):
        raise ValueError("transforms not in encoder subset")
    cache_bits = 0
    if br.read(1):
        cache_bits = br.read(4)
        if not 1 <= cache_bits <= 11:
            raise ValueError(f"invalid color-cache bits {cache_bits}")
    if br.read(1):
        raise ValueError("entropy image not in encoder subset")
    cache_size = 1 << cache_bits if cache_bits else 0
    g_tree = _read_prefix_code(br, _GREEN_ALPHABET + cache_size)
    r_tree = _read_prefix_code(br, 256)
    b_tree = _read_prefix_code(br, 256)
    a_tree = _read_prefix_code(br, 256)
    d_tree = _read_prefix_code(br, _DIST_ALPHABET)
    cache = np.zeros(cache_size, dtype=np.uint32)
    shift = 32 - cache_bits if cache_bits else 0

    def _extra_value(code: int, br_: _BitReader) -> int:
        # inverse of _prefix_encode
        if code < 4:
            return code + 1
        eb = (code >> 1) - 1
        base = (2 + (code & 1)) << eb
        return base + 1 + br_.read(eb)

    n = h * w
    out = np.zeros((n, 4), dtype=np.uint8)  # r, g, b, a
    argb = np.zeros(n, dtype=np.uint32)
    i = 0
    while i < n:
        gs = g_tree.read(br)
        if gs < 256:
            rr = r_tree.read(br)
            bb = b_tree.read(br)
            aa = a_tree.read(br)
            v = (aa << 24) | (rr << 16) | (gs << 8) | bb
        elif gs < 256 + 24:
            length = _extra_value(gs - 256, br)
            plane = _extra_value(d_tree.read(br), br)
            if plane <= 120:
                raise ValueError(
                    "2-D distance plane codes not in encoder subset"
                )
            dist = plane - 120
            if dist > i or i + length > n:
                raise ValueError("backward reference out of range")
            for k in range(length):
                v = int(argb[i - dist + k])
                argb[i + k] = v
                if cache_size:
                    cache[((v * _CACHE_MULT) & 0xFFFFFFFF) >> shift] = v
            i += length
            continue
        else:
            idx = gs - _GREEN_ALPHABET
            if idx >= cache_size:
                raise ValueError("color-cache index out of range")
            v = int(cache[idx])
        argb[i] = v
        if cache_size:
            cache[((v * _CACHE_MULT) & 0xFFFFFFFF) >> shift] = v
        i += 1
    out[:, 0] = (argb >> 16) & 0xFF
    out[:, 1] = (argb >> 8) & 0xFF
    out[:, 2] = argb & 0xFF
    out[:, 3] = (argb >> 24) & 0xFF
    return out.reshape(h, w, 4)
