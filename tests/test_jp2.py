"""JPEG 2000 lossless codec (raster/jp2.py): exhaustive roundtrips,
hypothesis properties, structural codestream assertions, and the
subset's loud-error contract.

Reference semantics: frmts/openjpeg/openjpegdataset.cpp (the
reference delegates to OpenJPEG); the bitstream here is re-derived
from the public ITU-T T.800 spec."""

import struct

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from hypothesis.extra.numpy import arrays

from gdal_spark.raster.jp2 import (
    _MQDecoder,
    _MQEncoder,
    decode_j2k,
    decode_jp2,
    encode_j2k,
    encode_jp2,
)

RNG = np.random.default_rng(20260819)


# --------------------------------------------------------------- MQ coder


def test_mq_random_decisions_roundtrip():
    """The MQ coder is the foundation: random decision/context
    streams must survive encode->flush->decode bit-exactly."""
    for trial in range(20):
        rng = np.random.default_rng(trial)
        n = int(rng.integers(1, 4000))
        bits = rng.integers(0, 2, size=n).tolist()
        ctxs = rng.integers(0, 19, size=n).tolist()
        enc = _MQEncoder()
        for b, c in zip(bits, ctxs):
            enc.encode(int(b), int(c))
        seg = enc.flush()
        dec = _MQDecoder(seg)
        for b, c in zip(bits, ctxs):
            assert dec.decode(int(c)) == b


def test_mq_skewed_streams():
    """Highly skewed streams (the common case for EBCOT contexts)."""
    for p in (0.01, 0.99):
        rng = np.random.default_rng(int(p * 100))
        bits = (rng.random(5000) < p).astype(int).tolist()
        enc = _MQEncoder()
        for b in bits:
            enc.encode(b, 0)
        dec = _MQDecoder(enc.flush())
        assert [dec.decode(0) for _ in bits] == bits


# ------------------------------------------------------------ roundtrips


@pytest.mark.parametrize("shape", [(1, 1), (1, 9), (7, 1), (4, 4),
                                   (5, 3), (16, 16), (33, 31),
                                   (64, 64), (65, 67), (96, 40)])
@pytest.mark.parametrize("levels", [0, 1, 2, 3])
def test_u8_roundtrip(shape, levels):
    a = RNG.integers(0, 256, size=shape, dtype=np.uint8)
    out = decode_j2k(encode_j2k(a, levels=levels))
    assert out.dtype == np.uint8
    assert np.array_equal(out, a)


@pytest.mark.parametrize("dtype,lo,hi", [
    (np.uint16, 0, 65536),
    (np.int16, -32768, 32768),
    (np.int8, -128, 128),
])
def test_wide_dtypes(dtype, lo, hi):
    a = RNG.integers(lo, hi, size=(40, 52)).astype(dtype)
    out = decode_j2k(encode_j2k(a, levels=2))
    assert out.dtype == dtype
    assert np.array_equal(out, a)


@pytest.mark.parametrize("pattern", ["zeros", "max", "grad", "checker"])
def test_patterns(pattern):
    a = {
        "zeros": np.zeros((50, 60), np.uint8),
        "max": np.full((50, 60), 255, np.uint8),
        "grad": (np.add.outer(np.arange(50), np.arange(60)) % 256
                 ).astype(np.uint8),
        "checker": ((np.add.outer(np.arange(50), np.arange(60))) % 2
                    * 255).astype(np.uint8),
    }[pattern]
    assert np.array_equal(decode_j2k(encode_j2k(a, levels=2)), a)


def test_rgb_jp2_container():
    a = RNG.integers(0, 256, size=(45, 38, 3), dtype=np.uint8)
    buf = encode_jp2(a, levels=2)
    assert buf[:12] == b"\x00\x00\x00\x0cjP  \r\n\x87\n"
    out = decode_jp2(buf)
    assert np.array_equal(out, a)


def test_small_codeblocks():
    a = RNG.integers(0, 256, size=(70, 61), dtype=np.uint8)
    for cb_exp in (2, 4, 6):
        assert np.array_equal(
            decode_j2k(encode_j2k(a, levels=1, cb_exp=cb_exp)), a)


def test_multi_codeblock_grid():
    """> 64 px per side forces a real code-block grid + tag trees."""
    a = (np.add.outer(np.arange(150), 3 * np.arange(170)) % 251
         ).astype(np.uint8)
    assert np.array_equal(decode_j2k(encode_j2k(a, levels=2)), a)


def test_synthetic_fixture_pixels():
    """The repo's pixel rule (value = (x+y+i+phase) % 256) through
    all three bands, matching the other codec goldens."""
    from gdal_spark.fixtures.georef import np_image_pixels

    a = np_image_pixels(103, 64, 96)
    out = decode_jp2(encode_jp2(a, levels=2))
    assert np.array_equal(out, a)


# --------------------------------------------------------- hypothesis


@settings(max_examples=30, deadline=None)
@given(
    st.tuples(st.integers(1, 20), st.integers(1, 20)).flatmap(
        lambda s: arrays(np.uint8, s, elements=st.integers(0, 255))),
    st.integers(0, 3),
)
def test_property_u8(a, levels):
    assert np.array_equal(decode_j2k(encode_j2k(a, levels=levels)), a)


@settings(max_examples=20, deadline=None)
@given(
    st.tuples(st.integers(1, 16), st.integers(1, 16)).flatmap(
        lambda s: arrays(np.int16, s,
                         elements=st.integers(-32768, 32767))),
)
def test_property_i16(a):
    assert np.array_equal(decode_j2k(encode_j2k(a, levels=2)), a)


# ------------------------------------------------------------ structure


def test_codestream_markers():
    a = RNG.integers(0, 256, size=(30, 20), dtype=np.uint8)
    buf = encode_j2k(a, levels=2)
    assert buf[:2] == b"\xff\x4f"          # SOC
    assert buf[2:4] == b"\xff\x51"         # SIZ
    assert buf[-2:] == b"\xff\xd9"         # EOC
    # SIZ geometry
    _, W, H = struct.unpack_from(">HII", buf, 6)
    assert (W, H) == (20, 30)
    # COD: LRCP, 1 layer, no MCT, 2 levels, 5/3
    i = buf.index(b"\xff\x52")
    scod, prog, layers, mct, levels = struct.unpack_from(
        ">BBHBB", buf, i + 4)
    assert (scod, prog, layers, mct, levels) == (0, 0, 1, 0, 2)


def test_sot_psot_consistent():
    a = RNG.integers(0, 256, size=(24, 24), dtype=np.uint8)
    buf = encode_j2k(a, levels=1)
    i = buf.index(b"\xff\x90")
    _isot, psot = struct.unpack_from(">HI", buf, i + 4)
    # SOT .. EOC spans exactly Psot bytes
    assert buf[i + psot:i + psot + 2] == b"\xff\xd9"


def test_unsupported_features_raise():
    a = RNG.integers(0, 256, size=(16, 16), dtype=np.uint8)
    buf = bytearray(encode_j2k(a, levels=1))
    # flip the transform byte (5/3 -> 9/7) inside COD
    i = buf.index(b"\xff\x52")
    assert buf[i + 13] == 1
    buf[i + 13] = 0
    with pytest.raises(ValueError, match="5/3"):
        decode_j2k(bytes(buf))
    with pytest.raises(ValueError, match="SOC"):
        decode_j2k(b"\x00\x00" + bytes(buf))
    with pytest.raises(ValueError):
        encode_j2k(a.astype(np.float32))
    with pytest.raises(ValueError):
        encode_j2k(a, levels=9)


def test_truncated_stream_raises():
    a = RNG.integers(0, 256, size=(16, 16), dtype=np.uint8)
    buf = encode_j2k(a, levels=1)
    with pytest.raises(Exception):
        decode_j2k(buf[:20])


# ------------------------------------------------------------- dispatch


def test_codecs_dispatch():
    from gdal_spark.raster.codecs import (
        LOSSLESS,
        decode_image,
        encode_image,
        sniff_format,
    )

    a = RNG.integers(0, 256, size=(21, 33, 3), dtype=np.uint8)
    buf = encode_image(a, "jp2")
    assert sniff_format(buf[:12]) == "jp2"
    assert np.array_equal(decode_image(buf), a)
    assert "jp2" in LOSSLESS
    # raw codestream sniff
    raw = encode_j2k(a[:, :, 0])
    assert sniff_format(raw[:12]) == "jp2"


def test_driver_registered():
    from gdal_spark.operators.info import DRIVERS

    rows = [d for d in DRIVERS if d[0] == "JP2OpenJPEG"]
    assert rows and rows[0][5] == "raster/jp2.py"


def test_sig_lut_matches_reference():
    """The incremental-counter LUT equals the direct Table-D.1
    evaluation over every 8-neighbor significance pattern."""
    from gdal_spark.raster.jp2 import _SIG_LUTS, _ctx_sig

    order = [0, 1, 2, 3, 5, 6, 7, 8]
    for fam in (0, 1, 2):
        for bits in range(256):
            sig = bytearray(9)
            for k in range(8):
                sig[order[k]] = (bits >> k) & 1
            nh = sig[3] + sig[5]
            nv = sig[1] + sig[7]
            nd = sig[0] + sig[2] + sig[6] + sig[8]
            assert (_SIG_LUTS[fam][nh * 15 + nv * 5 + nd]
                    == _ctx_sig(sig, 3, 3, 1, 1, fam))


def test_geojp2_georef_roundtrip():
    """GeoJP2 uuid box (the reference's msi_uuid2 GeoTIFF-in-JP2
    convention): georef + pixels both survive the boxed carrier."""
    from gdal_spark.raster.jp2 import read_jp2_georef

    a = RNG.integers(0, 256, size=(18, 13), dtype=np.uint8)
    gt = (1234.5, 2.5, 0.0, 987.5, 0.0, -2.5)
    buf = encode_jp2(a, levels=1, geo=(gt, 32633))
    assert np.array_equal(decode_jp2(buf), a)
    got_gt, got_epsg = read_jp2_georef(buf)
    assert got_gt == gt and got_epsg == 32633
    assert read_jp2_georef(encode_jp2(a, levels=1)) is None


# ------------------------------------------------------------- 9/7 lossy


def _psnr(a, b, peak):
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return 99.0 if mse == 0 else 10 * np.log10(peak * peak / mse)


def test_lossy_psnr_bar():
    """The input-hint contract: lossy formats must land PSNR >= 40 dB.
    The 9/7 path at the default step clears it with a wide margin on
    smooth, noisy, and 16-bit imagery."""
    from gdal_spark.fixtures.georef import np_image_pixels

    smooth = np_image_pixels(103, 96, 96)[:, :, 0]
    noise = RNG.integers(0, 256, (64, 64), dtype=np.uint8)
    for a, peak in ((smooth, 255), (noise, 255)):
        out = decode_j2k(encode_j2k(a, levels=2, lossy=True))
        assert out.dtype == a.dtype and out.shape == a.shape
        assert _psnr(out, a, peak) >= 40.0
    u16 = smooth.astype(np.uint16) * 257
    out = decode_j2k(encode_j2k(u16, levels=2, lossy=True))
    assert _psnr(out, u16, 65535) >= 40.0


def test_lossy_step_ladder_monotone_size():
    """Coarser steps shrink the stream; every rung clears 40 dB."""
    from gdal_spark.fixtures.georef import np_image_pixels

    a = np_image_pixels(11, 80, 72)[:, :, 0]
    sizes = []
    for step in (0.25, 0.5, 1.0, 2.0):
        buf = encode_j2k(a, levels=2, lossy=True, step=step)
        assert _psnr(decode_j2k(buf), a, 255) >= 40.0
        sizes.append(len(buf))
    assert sizes == sorted(sizes, reverse=True)


def test_lossy_markers():
    a = RNG.integers(0, 256, size=(30, 20), dtype=np.uint8)
    buf = encode_j2k(a, levels=2, lossy=True)
    i = buf.index(b"\xff\x52")
    transform = buf[i + 13]
    assert transform == 0  # 9/7
    j = buf.index(b"\xff\x5c")
    sqcd = buf[j + 4]
    assert sqcd & 0x1F == 2  # scalar expounded
    # 2-byte (eps, mu) per subband
    lqcd = struct.unpack_from(">H", buf, j + 2)[0]
    assert lqcd == 2 + 1 + 2 * 7  # 2 levels -> 7 subbands


def test_lossy_rgb_and_container():
    a = RNG.integers(0, 256, size=(33, 41, 3), dtype=np.uint8)
    buf = encode_jp2(a, levels=1, lossy=True)
    out = decode_jp2(buf)
    assert out.shape == a.shape
    assert _psnr(out, a, 255) >= 40.0


def test_lossy_bad_step():
    a = RNG.integers(0, 256, size=(8, 8), dtype=np.uint8)
    with pytest.raises(ValueError, match="step"):
        encode_j2k(a, lossy=True, step=0.0)


def test_corruption_fuzz_terminates_cleanly():
    """Distributed scans see corrupt bytes: every single-byte
    corruption must raise (or return wrong pixels) quickly — never
    hang an executor.  The bit readers raise at EOF by construction;
    this pins it across 200 random corruptions."""
    a = RNG.integers(0, 256, size=(40, 33), dtype=np.uint8)
    buf = bytearray(encode_j2k(a, levels=2))
    rng = np.random.default_rng(7)
    for _ in range(200):
        pos = int(rng.integers(2, len(buf)))
        old = buf[pos]
        buf[pos] = int(rng.integers(0, 256))
        try:
            out = decode_j2k(bytes(buf))
            assert out.shape == (40, 33)  # decoded (possibly wrong)
        except Exception:
            pass  # clean refusal is fine; hanging is not
        buf[pos] = old


def test_reduced_resolution_decode_matches_true_ll():
    # reduce = GDAL's JP2 overview read (openjpegdataset.cpp,
    # opj_set_decoded_resolution_factor): level-k LL plane only
    from gdal_spark.raster.jp2 import _fwd53_2d, _inv53_2d

    for h, w in [(32, 32), (33, 47), (20, 20), (257, 100)]:
        a = RNG.integers(0, 256, (h, w)).astype(np.uint8)
        blob = encode_j2k(a, levels=2)
        assert np.array_equal(decode_j2k(blob, reduce=0), a)
        cf = _fwd53_2d(a.astype(np.int64) - 128, 2)
        for r in (1, 2):
            hk, wk = h, w
            for _ in range(r):
                hk, wk = (hk + 1) // 2, (wk + 1) // 2
            want = np.clip(
                _inv53_2d(cf[:hk, :wk].copy(), 2 - r) + 128, 0, 255
            ).astype(np.uint8)
            got = decode_j2k(blob, reduce=r)
            assert got.shape == (hk, wk)
            assert np.array_equal(got, want)


def test_reduced_resolution_lossy_and_guards():
    a = RNG.integers(0, 256, (40, 56, 3)).astype(np.uint8)
    blob = encode_j2k(a, levels=2, lossy=True)
    g1 = decode_j2k(blob, reduce=1)
    assert g1.shape == (20, 28, 3)
    # the overview must still track the image content (smooth ramp)
    ramp = np.tile(np.arange(64, dtype=np.uint8) * 4, (64, 1))
    lv = decode_j2k(encode_j2k(ramp, levels=2, lossy=True), reduce=1)
    full = decode_j2k(encode_j2k(ramp, levels=2, lossy=True))
    assert abs(float(lv.mean()) - float(full.mean())) < 3.0
    with pytest.raises(ValueError, match="reduce"):
        decode_j2k(encode_j2k(ramp, levels=2), reduce=3)
    assert decode_jp2(encode_jp2(ramp, levels=2), reduce=1).shape == (32, 32)
