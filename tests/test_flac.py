"""FLAC codec (raster/flac.py).

The encoder's own output covers CONSTANT/VERBATIM/FIXED subframes with
partition-order-0 Rice.  The decoder claims a superset — LPC subframes,
multi-partition Rice, the Rice2 (5-bit) method, escape-to-raw
partitions, wasted bits, and the three side-channel assignments — so
those paths are proven here against hand-synthesized frames built with
the module's own bit primitives (values checked against an
independently-computed numpy reconstruction, not the decoder itself).
"""

import struct

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from gdal_spark.raster.flac import (
    _BitWriter,
    _crc8,
    _crc16,
    _utf8_coded,
    decode_flac,
    encode_flac,
    is_flac,
)


def _roundtrip(sig, rate=16000):
    dec, sr = decode_flac(encode_flac(sig, rate))
    assert sr == rate
    want = np.asarray(sig, dtype=np.int16)
    if want.ndim == 1:
        want = want[:, None]
    assert np.array_equal(dec, want)


def test_tonal_mono_compresses_and_roundtrips():
    t = np.arange(20000)
    sig = (3000 * np.sin(t / 50) + 500 * np.sin(t / 7)).astype(np.int16)
    data = encode_flac(sig, 16000)
    assert is_flac(data)
    assert len(data) < len(sig) * 2 / 3  # really compressed
    _roundtrip(sig)


def test_stereo_and_multichannel():
    t = np.arange(9000)
    a = (2000 * np.sin(t / 40)).astype(np.int16)
    _roundtrip(np.stack([a, (a // 2 + 7).astype(np.int16)], axis=1))
    _roundtrip(np.stack([a, a[::-1], np.full(9000, 3, np.int16)], axis=1), 44100)


def test_block_boundary_sizes():
    for n in (1, 4095, 4096, 4097, 8192, 8193):
        rng = np.random.default_rng(n)
        _roundtrip(rng.integers(-500, 500, size=n).astype(np.int16))


def test_noise_falls_back_and_roundtrips():
    rng = np.random.default_rng(0)
    noise = rng.integers(-32768, 32768, size=6000).astype(np.int16)
    _roundtrip(noise)


def test_md5_corruption_detected():
    sig = (100 * np.sin(np.arange(5000) / 30)).astype(np.int16)
    data = bytearray(encode_flac(sig))
    data[26] ^= 0xFF  # flip a byte inside the STREAMINFO MD5
    with pytest.raises(ValueError, match="MD5|CRC"):
        decode_flac(bytes(data))


def test_frame_corruption_detected():
    sig = (100 * np.sin(np.arange(5000) / 30)).astype(np.int16)
    data = bytearray(encode_flac(sig))
    data[-3] ^= 0x01  # inside the last frame body
    with pytest.raises(ValueError, match="CRC|MD5"):
        decode_flac(bytes(data))


@settings(max_examples=30, deadline=None)
@given(st.lists(st.integers(-32768, 32767), min_size=0, max_size=300))
def test_property_arbitrary_signals(vals):
    sig = np.array(vals, dtype=np.int16)
    dec, _ = decode_flac(encode_flac(sig))
    assert np.array_equal(dec[:, 0] if len(vals) else dec.reshape(0),
                          sig if len(vals) else sig)


# ---------------------------------------------------------------------------
# decoder superset: hand-synthesized frames
# ---------------------------------------------------------------------------


def _stream(frame_body_fn, n, ch, rate=16000, md5=b"\x00" * 16):
    """Build fLaC header + one frame whose subframe section is written
    by frame_body_fn(writer); channel-assignment bits via ch (int =
    independent count-1, or one of 0b1000/0b1001/0b1010)."""
    w = _BitWriter()
    w.write(0b11111111111110, 14)
    w.write(0, 2)
    w.write(0b0111, 4)   # 16-bit blocksize at end
    w.write(0b0000, 4)   # rate from STREAMINFO
    w.write(ch, 4)
    w.write(0b100, 3)    # 16 bps
    w.write(0, 1)
    w.align()
    nch = ch + 1 if ch < 8 else 2
    hdr = bytes(w.buf) + _utf8_coded(0) + struct.pack(">H", n - 1)
    hdr += bytes([_crc8(hdr)])
    w = _BitWriter()
    frame_body_fn(w)
    w.align()
    frame = hdr + w.bytes()
    frame += struct.pack(">H", _crc16(frame))
    si = (
        struct.pack(">HH", n, n) + b"\x00" * 6
        + ((rate << 44) | ((nch - 1) << 41) | (15 << 36) | n).to_bytes(8, "big")
        + md5
    )
    return b"fLaC" + bytes([0x80]) + len(si).to_bytes(3, "big") + si + frame


def _write_verbatim(w, sig, bps=16):
    w.write(0, 1)
    w.write(1, 6)
    w.write(0, 1)
    for v in sig:
        w.write(int(v) & ((1 << bps) - 1), bps)


def test_decode_lpc_subframe():
    # s[i] = (2*s[i-1]*4 - s[i-2]*3 >> 2) + res[i]  with order-2 LPC
    n, coefs, shift, prec = 32, [5, -2], 2, 4
    warm = [100, 103]
    res = list(range(-8, n - 10))
    sig = list(warm)
    for i in range(2, n):
        acc = coefs[0] * sig[i - 1] + coefs[1] * sig[i - 2]
        sig.append((acc >> shift) + res[i - 2])

    def body(w):
        w.write(0, 1)
        w.write(0b100000 | (2 - 1), 6)  # LPC order 2
        w.write(0, 1)
        for v in warm:
            w.write(v & 0xFFFF, 16)
        w.write(prec - 1, 4)
        w.write(shift & 0x1F, 5)
        for c in coefs:
            w.write(c & ((1 << prec) - 1), prec)
        w.write(0, 2)  # rice method 0
        w.write(0, 4)  # partition order 0
        w.write(2, 4)  # param
        for v in res:
            zz = 2 * v if v >= 0 else -2 * v - 1
            w.write_unary(zz >> 2)
            w.write(zz & 3, 2)

    dec, _ = decode_flac(_stream(body, n, 0))
    assert dec[:, 0].tolist() == sig


def test_decode_multipartition_rice2_and_escape():
    n = 64
    rng = np.random.default_rng(1)
    sig = rng.integers(-1000, 1000, size=n).tolist()

    def body(w):
        w.write(0, 1)
        w.write(0b001000, 6)  # FIXED order 0: residual == signal
        w.write(0, 1)
        w.write(1, 2)  # rice2 (5-bit params)
        w.write(2, 4)  # partition order 2 -> 4 partitions of 16
        for p in range(4):
            part = sig[p * 16 : (p + 1) * 16]
            if p == 1:
                w.write(31, 5)  # escape
                w.write(12, 5)  # 12-bit raw residuals
                for v in part:
                    w.write(v & 0xFFF, 12)
            else:
                w.write(3, 5)
                for v in part:
                    zz = 2 * v if v >= 0 else -2 * v - 1
                    w.write_unary(zz >> 3)
                    w.write(zz & 7, 3)

    dec, _ = decode_flac(_stream(body, n, 0))
    assert dec[:, 0].tolist() == sig


def test_decode_wasted_bits():
    n = 16
    base = [4 * v for v in range(-5, n - 5)]  # all divisible by 4

    def body(w):
        w.write(0, 1)
        w.write(1, 6)   # VERBATIM
        w.write(1, 1)   # wasted-bits flag
        w.write(1, 2)   # unary 1 -> wasted = 2
        for v in base:
            w.write((v >> 2) & 0x3FFF, 14)  # 16 - 2 wasted

    dec, _ = decode_flac(_stream(body, n, 0))
    assert dec[:, 0].tolist() == base


@pytest.mark.parametrize("mode", [0b1000, 0b1001, 0b1010])
def test_decode_side_channel_assignments(mode):
    n = 24
    rng = np.random.default_rng(mode)
    left = rng.integers(-2000, 2000, size=n).astype(np.int64)
    right = rng.integers(-2000, 2000, size=n).astype(np.int64)
    side = left - right

    def body(w):
        if mode == 0b1000:   # left/side
            _write_verbatim(w, left)
            _write_verbatim(w, side, 17)
        elif mode == 0b1001:  # side/right
            _write_verbatim(w, side, 17)
            _write_verbatim(w, right)
        else:                 # mid/side
            mid = (left + right) >> 1
            _write_verbatim(w, mid)
            _write_verbatim(w, side, 17)

    dec, _ = decode_flac(_stream(body, n, mode))
    assert dec[:, 0].tolist() == left.tolist()
    assert dec[:, 1].tolist() == right.tolist()


def test_audio_features_dispatches_flac(spark):
    from gdal_spark import multimodal

    t = np.arange(4000)
    sig = (1500 * np.sin(t / 25)).astype(np.int16)
    clips = spark.createDataFrame(
        [("c0", bytearray(encode_flac(sig, 16000)))],
        "clip_id string, bytes binary",
    )
    row = multimodal.audio_features(clips).collect()[0]
    pcm = sig.astype(np.float64) / 32768.0
    sgn = np.signbit(pcm)
    assert row.n_samples == 4000
    assert row.rms_e6 == int(np.floor(1e6 * np.sqrt(np.mean(pcm**2))))
    assert row.zero_crossings == int((sgn[1:] != sgn[:-1]).sum())
