"""GXF ASCII grid codec (raster/gxf.py)."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from gdal_spark.raster.gxf import decode_gxf, encode_gxf


def _grid():
    return (np.arange(35).reshape(5, 7) % 256).astype(np.float64)


@pytest.mark.parametrize("sense", [1, -2, 3, -4])
def test_row_senses_roundtrip(sense):
    a = _grid()
    out, meta = decode_gxf(encode_gxf(a, sense=sense))
    assert (out == a).all()
    assert meta["sense"] == sense


def test_default_sense_is_bottom_up():
    a = _grid()
    txt = encode_gxf(a, sense=1)
    first = txt.split("#GRID\n")[1].splitlines()[0]
    assert first.split()[0] == str(int(a[-1, 0]))  # last row first


def test_dummy_and_georef_keys():
    a = _grid()
    txt = encode_gxf(a, x_origin=100.5, y_origin=-7.25, pixel=2.5,
                     dummy=-1.0)
    assert "#DUMMY" in txt and "#XORIGIN" in txt
    out, meta = decode_gxf(txt)
    assert meta["dummy"] == -1.0
    assert meta["x_origin"] == 100.5 and meta["pixel"] == (2.5, 2.5)
    # missing #DUMMY -> reference default -1e12 (gxfopen.c:828)
    _, meta = decode_gxf(encode_gxf(a))
    assert meta["dummy"] == -1e12


def test_column_senses_refused():
    with pytest.raises(ValueError, match="column-organized"):
        encode_gxf(_grid(), sense=2)
    txt = encode_gxf(_grid()).replace("#SENSE\n1", "#SENSE\n-1")
    with pytest.raises(ValueError, match="column-organized"):
        decode_gxf(txt)


@settings(max_examples=25, deadline=None)
@given(w=st.integers(1, 15), h=st.integers(1, 12),
       sense=st.sampled_from([1, -2, 3, -4]),
       seed=st.integers(0, 2**31 - 1))
def test_roundtrip_property(w, h, sense, seed):
    rng = np.random.RandomState(seed)
    a = rng.randint(-500, 500, size=(h, w)).astype(np.float64) / 4.0
    out, _ = decode_gxf(encode_gxf(a, sense=sense))
    assert (out == a).all()
