"""G.711 codecs (raster/g711.py) vs CPython's audioop — the
in-container external truth — over the FULL 16-bit domain."""

import warnings

import numpy as np
import pytest

from gdal_spark.raster.g711 import (
    alaw_decode,
    alaw_encode,
    sql_alaw_quantize,
    sql_ulaw_quantize,
    ulaw_decode,
    ulaw_encode,
)

with warnings.catch_warnings():
    warnings.simplefilter("ignore")
    try:
        import audioop
    except ImportError:      # removed in Python 3.13
        audioop = None

V = np.arange(-32768, 32768, dtype=np.int16)
B = np.arange(256, dtype=np.uint8)


@pytest.mark.skipif(audioop is None, reason="audioop removed")
def test_encode_matches_audioop_full_domain():
    assert (ulaw_encode(V) == np.frombuffer(
        audioop.lin2ulaw(V.tobytes(), 2), dtype=np.uint8)).all()
    assert (alaw_encode(V) == np.frombuffer(
        audioop.lin2alaw(V.tobytes(), 2), dtype=np.uint8)).all()


@pytest.mark.skipif(audioop is None, reason="audioop removed")
def test_decode_matches_audioop_all_bytes():
    assert (ulaw_decode(B) == np.frombuffer(
        audioop.ulaw2lin(B.tobytes(), 2), dtype=np.int16)).all()
    assert (alaw_decode(B) == np.frombuffer(
        audioop.alaw2lin(B.tobytes(), 2), dtype=np.int16)).all()


def test_quantization_error_bounded_by_segment_step():
    for enc, dec, max_rel in ((ulaw_encode, ulaw_decode, 0.07),
                              (alaw_encode, alaw_decode, 0.07)):
        q = dec(enc(V)).astype(np.int64)
        err = np.abs(q - V.astype(np.int64))
        # companded error is relative: bounded by ~step/2 per segment
        bound = np.maximum(np.abs(V.astype(np.int64)) * max_rel, 70)
        assert (err <= bound).all()


def test_sql_quantizers_match_numpy_full_domain():
    import duckdb

    con = duckdb.connect()
    src = "(SELECT unnest(range(-32768, 32768)) AS v)"
    got = con.execute(
        f"SELECT {sql_ulaw_quantize('v')} FROM {src}"
    ).df().iloc[:, 0].to_numpy()
    assert (got == ulaw_decode(ulaw_encode(V)).astype(np.int64)).all()
    got = con.execute(
        f"SELECT {sql_alaw_quantize('v')} FROM {src}"
    ).df().iloc[:, 0].to_numpy()
    assert (got == alaw_decode(alaw_encode(V)).astype(np.int64)).all()


def test_wav_g711_tags_roundtrip():
    from gdal_spark.raster.wav import decode_wav, encode_wav_g711

    sig = ((np.abs((np.arange(700) * 3) % 8000 - 4000) - 2000) * 13
           ).astype(np.int16)
    for law, dec, enc in (("ulaw", ulaw_decode, ulaw_encode),
                          ("alaw", alaw_decode, alaw_encode)):
        data = encode_wav_g711(sig, 8000, law)
        tag = int.from_bytes(data[20:22], "little")
        assert tag == (7 if law == "ulaw" else 6)
        out, rate = decode_wav(data)
        assert rate == 8000
        assert (out[:, 0] == dec(enc(sig))).all()
