"""Industrial GTiff surface: compression kernels, predictors,
BigTIFF/byte-order layout (gdal_spark/raster/tiff.py ext path;
semantics from the TIFF 6.0 spec, TechNote 3, the BigTIFF spec —
reference surface frmts/gtiff/gtiffdataset_{read,write}.cpp)."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from gdal_spark.raster.tiff import (
    _lzw_decode,
    _lzw_encode,
    _packbits_decode,
    _packbits_encode,
    decode_tiff,
    encode_tiff,
    encode_tiff_ext,
)

RNG = np.random.default_rng(7)


def _rand(dt, shape):
    if dt[0] == "f":
        return (RNG.integers(-10000, 10000, shape) / 16.0).astype(dt)
    info = np.iinfo(np.dtype(dt))
    return RNG.integers(info.min, info.max, shape, endpoint=True).astype(dt)


@pytest.mark.parametrize("dt", ["u1", "i1", "u2", "i2", "u4", "i4",
                                "f4", "f8"])
@pytest.mark.parametrize("comp", ["none", "lzw", "deflate", "packbits"])
def test_roundtrip_dtype_compression(dt, comp):
    for c in (1, 3):
        shape = (21, 17, c) if c == 3 else (21, 17)
        a = _rand(dt, shape)
        out = decode_tiff(encode_tiff_ext(a, compression=comp))
        assert out.dtype.kind == a.dtype.kind and np.array_equal(out, a)


@pytest.mark.parametrize("big,be", [(False, True), (True, False),
                                    (True, True)])
def test_roundtrip_layouts(big, be):
    a = _rand("i2", (33, 29, 3))
    out = decode_tiff(encode_tiff_ext(a, compression="lzw", predictor=2,
                                      bigtiff=big, big_endian=be,
                                      rows_per_strip=5))
    assert np.array_equal(out, a)


def test_predictor_validation():
    with pytest.raises(ValueError, match="integer-only"):
        encode_tiff_ext(np.zeros((4, 4), np.float32), predictor=2)
    with pytest.raises(ValueError, match="float-only"):
        encode_tiff_ext(np.zeros((4, 4), np.uint8), predictor=3)
    with pytest.raises(ValueError, match="dtype"):
        encode_tiff_ext(np.zeros((4, 4), np.float16))
    with pytest.raises(ValueError, match="not a TIFF"):
        decode_tiff(b"PK\x03\x04----------")


def test_float_predictor_bit_exact():
    # predictor 3 is a byte shuffle + modular diff: bit-exact on
    # every value incl. nan/inf payloads
    a = np.array([[0.1, -0.0, np.inf, np.nan, 3.0e38, 1e-42]],
                 dtype=np.float32).repeat(8, axis=0)
    out = decode_tiff(encode_tiff_ext(a, compression="deflate",
                                      predictor=3))
    assert out.tobytes() == a.tobytes()


def test_legacy_writer_reads_through_general_decoder():
    a = _rand("u1", (20, 30, 3))
    assert np.array_equal(decode_tiff(encode_tiff(a)), a)
    idx = _rand("u1", (20, 30)) % 16
    pal = _rand("u1", (16, 3))
    assert np.array_equal(decode_tiff(encode_tiff(idx, palette=pal)),
                          pal[idx])


def test_lzw_table_flush_and_width_boundaries():
    # >4094 distinct phrases forces a mid-stream Clear; runs force
    # KwKwK codes; width grows through 10/11/12 bits
    data = (np.tile(np.arange(256, dtype=np.uint8), 240).tobytes()
            + b"\x00" * 5000
            + RNG.integers(0, 255, 60000, endpoint=True)
            .astype(np.uint8).tobytes())
    enc = _lzw_encode(data)
    assert _lzw_decode(enc) == data
    assert _lzw_decode(enc, expected=len(data)) == data
    assert len(enc) < len(data)  # the tiled prefix must compress


@pytest.mark.parametrize("tile", [(16, 16), (32, 16), (64, 48)])
@pytest.mark.parametrize("dt", ["u1", "i2", "f4"])
def test_tiled_roundtrip(tile, dt):
    pred = 3 if dt[0] == "f" else 2
    for c in (1, 3):
        # 37x53 never divides the tile grid: edge padding exercised
        shape = (37, 53, c) if c == 3 else (37, 53)
        a = _rand(dt, shape)
        out = decode_tiff(encode_tiff_ext(a, compression="lzw",
                                          predictor=pred, tile=tile))
        assert out.shape == a.shape and np.array_equal(out, a)


def test_tile_dims_must_be_multiples_of_16():
    with pytest.raises(ValueError, match="multiples of 16"):
        encode_tiff_ext(np.zeros((8, 8), np.uint8), tile=(20, 16))


@settings(max_examples=60, deadline=None)
@given(st.binary(min_size=0, max_size=4000))
def test_lzw_property(data):
    assert _lzw_decode(_lzw_encode(data)) == data


@settings(max_examples=60, deadline=None)
@given(st.binary(min_size=0, max_size=4000))
def test_packbits_property(data):
    assert _packbits_decode(_packbits_encode(data)) == data


@settings(max_examples=25, deadline=None)
@given(
    st.sampled_from(["u1", "i2", "u2", "i4", "f4", "f8"]),
    st.sampled_from(["none", "lzw", "deflate", "packbits"]),
    st.integers(1, 40),
    st.integers(1, 40),
    st.sampled_from([1, 3]),
    st.integers(1, 13),
)
def test_roundtrip_property(dt, comp, h, w, c, rps):
    pred = 3 if dt[0] == "f" else 2
    shape = (h, w, c) if c == 3 else (h, w)
    a = _rand(dt, shape)
    out = decode_tiff(encode_tiff_ext(a, compression=comp,
                                      predictor=pred,
                                      rows_per_strip=rps))
    assert out.tobytes() == a.astype(out.dtype).tobytes()
    assert out.shape == a.shape


def _tri(v):
    # triangle wave: smooth everywhere (max slope 1/px) so JPEG's
    # quality-90 quantization stays comfortably above the PSNR bar
    return np.abs((v % 510) - 255).astype(np.uint8)


def _smooth_rgb(h, w, phase=0):
    x, y = np.meshgrid(np.arange(w), np.arange(h))
    return np.stack([_tri(x + y + phase), _tri(x + y + phase + 85),
                     _tri(x + y + phase + 170)], axis=2)


@pytest.mark.parametrize("kw", [dict(rows_per_strip=16),
                                dict(tile=(48, 32)),
                                dict(tile=(64, 48), bigtiff=True,
                                     big_endian=True)])
def test_webp_chunks_pixel_exact(kw):
    # WEBP chunks (tag 50001) are VP8L lossless: exact roundtrip,
    # including non-dividing tile grids (edge replication cropped off)
    a = RNG.integers(0, 256, (53, 37, 3), endpoint=False).astype(np.uint8)
    out = decode_tiff(encode_tiff_ext(a, compression="webp", **kw))
    assert out.shape == a.shape and np.array_equal(out, a)


def _psnr(a, b):
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return 10 * np.log10(255.0 ** 2 / max(mse, 1e-12))


@pytest.mark.parametrize("kw", [dict(rows_per_strip=32),
                                dict(tile=(48, 32)),
                                dict(tile=(64, 48), big_endian=True)])
def test_jpeg_chunks_rgb_psnr(kw):
    a = _smooth_rgb(112, 120, phase=7)
    out = decode_tiff(encode_tiff_ext(a, compression="jpeg", **kw))
    assert out.shape == a.shape and _psnr(out, a) >= 45.0


def test_jpeg_chunks_gray_psnr():
    x, y = np.meshgrid(np.arange(120), np.arange(112))
    a = _tri(x + y + 3)
    for kw in (dict(rows_per_strip=16), dict(tile=(64, 48))):
        out = decode_tiff(encode_tiff_ext(a, compression="jpeg", **kw))
        assert out.shape == a.shape and _psnr(out, a) >= 45.0


def test_codec_chunk_validation():
    g8 = np.zeros((16, 16), np.uint8)
    with pytest.raises(ValueError, match="3 or 4 samples"):
        encode_tiff_ext(g8, compression="webp")
    with pytest.raises(ValueError, match="uint8-only"):
        encode_tiff_ext(g8.astype(np.uint16), compression="jpeg")
    with pytest.raises(ValueError, match="no predictor"):
        encode_tiff_ext(g8, compression="jpeg", predictor=2)


def test_gray_jpeg_stream_is_single_component():
    # the TIFF layer's SPP=1 contract depends on the 1-component
    # stream shape (jpgdataset.cpp nBands==1 path)
    from gdal_spark.raster.jpeg import decode_jpeg, encode_jpeg
    a = _tri(np.arange(40)[None, :] + np.arange(24)[:, None])
    blob = encode_jpeg(a, gray=True)
    out = decode_jpeg(blob)
    assert out.ndim == 2 and out.shape == a.shape
    assert _psnr(out, a) >= 45.0
    # SOF0 component count byte: 8 bytes into the SOF payload
    sof = blob.index(b"\xff\xc0")
    assert blob[sof + 9] == 1


@pytest.mark.parametrize("kw", [dict(compression="deflate", predictor=2,
                                     rows_per_strip=16),
                                dict(compression="webp", tile=(48, 32)),
                                dict(compression="lzw", big_endian=True,
                                     bigtiff=True)])
def test_rgba_roundtrip(kw):
    # 4-sample chunky RGBA (ExtraSamples=2, the reference's ALPHA=YES
    # default) — exact through classic kernels and VP8L chunks
    a = RNG.integers(0, 256, (53, 37, 4), endpoint=False).astype(np.uint8)
    out = decode_tiff(encode_tiff_ext(a, **kw))
    assert out.shape == a.shape and np.array_equal(out, a)


def test_rgba_u16_and_jpeg_rejection():
    a16 = RNG.integers(0, 65536, (40, 30, 4), endpoint=False).astype(
        np.uint16)
    out = decode_tiff(encode_tiff_ext(a16, compression="lzw", predictor=2))
    assert np.array_equal(out, a16)
    with pytest.raises(ValueError, match="no alpha"):
        encode_tiff_ext(np.zeros((16, 16, 4), np.uint8),
                        compression="jpeg")


def test_jpeg_chunks_420_subsampling():
    # Compression=7 with 4:2:0 chunk payloads: YCbCrSubSampling tag
    # (530) must say (2,2), each chunk decodes independently, and the
    # mosaic stays above the lossy PSNR bar while shrinking the file.
    a = _smooth_rgb(112, 120, phase=3)
    b444 = encode_tiff_ext(a, compression="jpeg", tile=(48, 32))
    b420 = encode_tiff_ext(a, compression="jpeg", tile=(48, 32),
                           subsampling="420")
    out = decode_tiff(b420)
    assert out.shape == a.shape and _psnr(out, a) >= 40.0
    assert len(b420) < len(b444)
    with pytest.raises(ValueError, match="444 or 420"):
        encode_tiff_ext(a, compression="jpeg", subsampling="411")
