"""LERC v1 CntZImage codec (frmts/mrf/LERCV1/Lerc1Image.cpp)."""

import struct

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from gdal_spark.raster.lerc1 import (
    decode_lerc1,
    decode_lerc1_sized,
    encode_lerc1,
)

rng = np.random.RandomState(6)


def test_integer_exact_roundtrip_at_quarter_error():
    # quanta = 2*maxZError = 0.5 lands every integer on a lattice
    # point -> bit-exact reconstruction
    for h, w in [(20, 20), (33, 47), (8, 8), (1, 9), (9, 1)]:
        a = rng.randint(0, 256, (h, w)).astype(np.float64)
        out, m = decode_lerc1(encode_lerc1(a))
        assert m.all() and np.array_equal(out, a.astype(np.float32))
    a = rng.randint(-30000, 30000, (40, 30)).astype(np.float64)
    assert np.array_equal(decode_lerc1(encode_lerc1(a))[0],
                          a.astype(np.float32))


def test_header_layout():
    a = np.arange(12, dtype=np.float64).reshape(3, 4)
    blob = encode_lerc1(a, max_z_error=0.125)
    assert blob[:10] == b"CntZImage "
    ver, typ, h, w = struct.unpack_from("<iiii", blob, 10)
    assert (ver, typ, h, w) == (11, 8, 3, 4)
    (mze,) = struct.unpack_from("<d", blob, 26)
    assert mze == 0.125


def test_raw_float_mode_and_error_bound():
    f = (rng.rand(17, 23) * 1000).astype(np.float32)
    out, _m = decode_lerc1(encode_lerc1(f, max_z_error=0.0))
    assert np.array_equal(out, f)  # maxZError 0 -> stored floats
    out, _m = decode_lerc1(encode_lerc1(f.astype(np.float64),
                                        max_z_error=0.5))
    assert float(np.abs(out - f).max()) <= 0.5 + 1e-3


def test_rle_mask_and_constant_tiles():
    a = rng.randint(0, 100, (25, 31)).astype(np.float64)
    mask = rng.rand(25, 31) > 0.4
    out, m = decode_lerc1(encode_lerc1(a, mask=mask))
    assert np.array_equal(m, mask)
    assert np.array_equal(out[mask], a[mask].astype(np.float32))
    z, _ = decode_lerc1(encode_lerc1(np.zeros((24, 24))))
    assert (z == 0).all()
    c, _ = decode_lerc1(encode_lerc1(np.full((24, 24), 77.0)))
    assert (c == 77).all()


def test_sized_decode_splits_concatenated_planes():
    a = rng.randint(0, 256, (16, 16)).astype(np.float64)
    b = rng.randint(0, 256, (16, 16)).astype(np.float64)
    blob = encode_lerc1(a) + encode_lerc1(b)
    p1, _m1, used = decode_lerc1_sized(blob)
    p2, _m2, _u2 = decode_lerc1_sized(blob[used:])
    assert np.array_equal(p1, a.astype(np.float32))
    assert np.array_equal(p2, b.astype(np.float32))


def test_guards():
    with pytest.raises(ValueError, match="signature"):
        decode_lerc1(b"NotZImage " + b"\0" * 40)
    with pytest.raises(ValueError, match="non-finite"):
        encode_lerc1(np.array([[np.nan]]))
    with pytest.raises(ValueError, match="mask shape"):
        encode_lerc1(np.zeros((4, 4)), mask=np.ones((3, 3), bool))


@settings(max_examples=40, deadline=None)
@given(
    h=st.integers(1, 40),
    w=st.integers(1, 40),
    lo=st.integers(-5000, 0),
    span=st.integers(1, 9000),
    seed=st.integers(0, 2**31 - 1),
    masked=st.booleans(),
)
def test_property_integer_exact(h, w, lo, span, seed, masked):
    r = np.random.RandomState(seed)
    a = r.randint(lo, lo + span, (h, w)).astype(np.float64)
    mask = (r.rand(h, w) > 0.3) if masked else None
    out, m = decode_lerc1(encode_lerc1(a, mask=mask))
    mm = np.ones((h, w), bool) if mask is None else mask
    assert np.array_equal(m, mm)
    if mm.any():
        assert np.array_equal(out[mm], a[mm].astype(np.float32))
