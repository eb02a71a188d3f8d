"""Hypothesis property suites for the round-4 session-3 codecs:
random arrays roundtrip bit-exactly through every new format."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st
from hypothesis.extra.numpy import arrays

from gdal_spark.raster.dted import decode_dted, encode_dted
from gdal_spark.raster.fits import decode_fits, encode_fits
from gdal_spark.raster.grib import decode_grib2, encode_grib2
from gdal_spark.raster.hf2 import decode_hf2, encode_hf2
from gdal_spark.raster.idrisi import decode_rst, encode_rst
from gdal_spark.raster.pds import decode_pds, encode_pds
from gdal_spark.raster.simplegrids import (
    decode_gsbg,
    decode_zmap,
    encode_gsbg,
    encode_zmap,
)
from gdal_spark.raster.terragen import decode_terragen, encode_terragen
from gdal_spark.raster.tga import decode_tga, encode_tga
from gdal_spark.raster.usgsdem import decode_usgsdem, encode_usgsdem

_dims = st.tuples(st.integers(1, 24), st.integers(1, 24))


def _i16(shape):
    return arrays(np.int16, shape, elements=st.integers(-32000, 32000))


@settings(max_examples=25, deadline=None)
@given(_dims.flatmap(_i16))
def test_grib2_int_roundtrip(a):
    out, _ = decode_grib2(encode_grib2(a.astype(np.int64)))
    assert (out[:, :, 0] == a).all()


@settings(max_examples=25, deadline=None)
@given(_dims.flatmap(lambda s: arrays(np.int16, s,
                                      elements=st.integers(-16000, 32000))))
def test_dted_roundtrip(a):
    # range bounded at -16000: below that the reference's improper-
    # two's-complement read fallback corrupts its own writer's output
    # (dted_api.c:652 — reference-faithful, tested separately)
    out, _ = decode_dted(encode_dted(a.astype(np.int32)))
    assert (out == a).all()


def test_dted_deep_negative_reinterpreted_like_reference():
    # -16001 sign-magnitude reads back as the two's-complement
    # reinterpretation of the same 16 bits, exactly as the reference
    out, _ = decode_dted(encode_dted(np.array([[-16001]])))
    assert out[0, 0] == 0xBE81 - 0x10000   # == -16767


@settings(max_examples=25, deadline=None)
@given(_dims.flatmap(lambda s: arrays(np.int16, s,
                                      elements=st.integers(-32000, 32000))))
def test_usgsdem_roundtrip(a):
    out, _ = decode_usgsdem(encode_usgsdem(a.astype(np.int32)))
    assert (out == a).all()


@settings(max_examples=25, deadline=None)
@given(_dims.flatmap(_i16), st.sampled_from([4, 8, 16]),
       st.booleans())
def test_hf2_roundtrip(a, tile, gz):
    out, _ = decode_hf2(encode_hf2(a.astype(np.int64), tile_size=tile,
                                   gz=gz))
    assert (out == a).all()


@settings(max_examples=25, deadline=None)
@given(_dims.flatmap(_i16))
def test_terragen_roundtrip(a):
    out, _ = decode_terragen(encode_terragen(a))
    assert (out == a).all()


@settings(max_examples=25, deadline=None)
@given(_dims.flatmap(_i16))
def test_fits_roundtrip(a):
    out, _ = decode_fits(encode_fits(a))
    assert (out == a).all()


@settings(max_examples=25, deadline=None)
@given(_dims.flatmap(_i16))
def test_pds_roundtrip(a):
    out, _ = decode_pds(encode_pds(a))
    assert (out[:, :, 0] == a).all()


@settings(max_examples=25, deadline=None)
@given(_dims.flatmap(_i16))
def test_idrisi_roundtrip(a):
    out, _ = decode_rst(*encode_rst(a))
    assert (out == a).all()


@settings(max_examples=25, deadline=None)
@given(_dims.flatmap(lambda s: arrays(np.uint8, s,
                                      elements=st.integers(0, 255))),
       st.booleans(), st.booleans())
def test_tga_gray_roundtrip(a, rle, top_left):
    out = decode_tga(encode_tga(a, rle=rle, top_left=top_left))
    assert (out == a).all()


@settings(max_examples=25, deadline=None)
@given(_dims.flatmap(_i16))
def test_gsbg_roundtrip(a):
    # float32 storage: int16 values are exact
    out, _ = decode_gsbg(encode_gsbg(a.astype(np.float64)))
    assert (out == a).all()


@settings(max_examples=15, deadline=None)
@given(st.tuples(st.integers(1, 12), st.integers(1, 12)).flatmap(
    lambda s: arrays(np.int16, s, elements=st.integers(-9999, 9999))))
def test_zmap_roundtrip(a):
    out, _ = decode_zmap(encode_zmap(a.astype(np.float64)))
    assert (out == a).all()
