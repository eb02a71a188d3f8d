"""ERS + ILWIS header/raw pairs (raster/hdrpairs.py)."""

import numpy as np
import pytest

from gdal_spark.raster.hdrpairs import (
    decode_ers,
    decode_ilwis,
    encode_ers,
    encode_ilwis,
)


def test_ers_multiband_bil_roundtrip():
    rng = np.random.default_rng(1)
    a = rng.integers(0, 256, (12, 17, 3)).astype(np.uint8)
    raw, hdr = encode_ers(a)
    assert "DatasetHeader Begin" in hdr
    assert "NrOfBands = 3" in hdr
    out, _ = decode_ers(raw, hdr)
    assert (out == a).all()
    # BIL on the wire: first w bytes are band 0 of row 0
    assert raw[:17] == a[0, :, 0].tobytes()


def test_ers_types_and_georef():
    b = np.array([[-3000, 5]], dtype=np.int16)
    gt = (1000.0, 5.0, 0.0, 2000.0, 0.0, -5.0)
    raw, hdr = encode_ers(b, geo=(gt, 0))
    assert "CellType = Signed16BitInteger" in hdr
    out, meta = decode_ers(raw, hdr)
    assert (out[:, :, 0] == b).all()
    assert meta["geotransform"] == gt
    f = np.array([[1.5]], dtype=np.float32)
    _, hdr2 = encode_ers(f)
    assert "IEEE4ByteReal" in hdr2


def test_ilwis_types_roundtrip():
    rng = np.random.default_rng(3)
    for arr in (
        rng.integers(0, 256, (5, 9)).astype(np.uint8),
        rng.integers(-5000, 5000, (4, 3)).astype(np.int32),
        rng.normal(size=(3, 3)),
    ):
        out, kv = decode_ilwis(*encode_ilwis(arr))
        assert (out == arr).all()
    raw, odf = encode_ilwis(np.zeros((2, 3), np.uint8), name="x")
    assert "[MapStore]" in odf and "Data=x.mp#" in odf
    assert "Size=2 3" in odf


def test_bad_inputs():
    with pytest.raises(ValueError, match="CellType"):
        decode_ers(b"", "NrOfLines = 1\nNrOfCellsPerLine = 1\n"
                        "CellType = Quad")
    with pytest.raises(ValueError, match="Map.Size"):
        decode_ilwis(b"", "[Ilwis]\nType=BaseMap\n")
