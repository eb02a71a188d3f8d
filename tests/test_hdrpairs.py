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


def test_ehdr_layouts_and_byteorder():
    import numpy as np

    from gdal_spark.raster.hdrpairs import decode_ehdr, encode_ehdr

    a = np.arange(60, dtype=np.uint8).reshape(5, 4, 3)
    raw, hdr = encode_ehdr(a)
    assert "LAYOUT         BIL" in hdr and "NBITS          8" in hdr
    out, _ = decode_ehdr(raw, hdr)
    assert (out == a).all()
    # BIP and BSQ read paths
    bip = a.tobytes()
    out, _ = decode_ehdr(bip, "NROWS 5\nNCOLS 4\nNBANDS 3\nLAYOUT BIP\n")
    assert (out == a).all()
    bsq = np.moveaxis(a, 2, 0).tobytes()
    out, _ = decode_ehdr(bsq, "NROWS 5\nNCOLS 4\nNBANDS 3\nLAYOUT BSQ\n")
    assert (out == a).all()
    # Motorola byte order, signed 16-bit
    b = (np.arange(20).reshape(4, 5).astype(np.int16) - 7)
    out, _ = decode_ehdr(
        b.astype(">i2").tobytes(),
        "BYTEORDER M\nNROWS 4\nNCOLS 5\nNBITS 16\nPIXELTYPE SIGNEDINT\n",
    )
    assert (out[:, :, 0] == b).all()


def test_ehdr_georef_center_convention():
    import numpy as np

    from gdal_spark.raster.hdrpairs import decode_ehdr, encode_ehdr

    a = np.zeros((4, 5), dtype=np.uint8)
    gt = (100.0, 2.0, 0.0, 50.0, 0.0, -2.0)
    raw, hdr = encode_ehdr(a, geo=(gt,))
    assert "ULXMAP         101.0" in hdr    # center of UL pixel
    assert "ULYMAP         49.0" in hdr
    _, meta = decode_ehdr(raw, hdr)
    assert meta["geotransform"] == gt


def test_saga_bottom_to_top_and_georef():
    import numpy as np
    import pytest as _pt

    from gdal_spark.raster.hdrpairs import decode_saga, encode_saga

    g = np.arange(20, dtype=np.int16).reshape(4, 5)
    raw, hdr = encode_saga(g, xmin_center=10.5, ymin_center=2.5,
                           cellsize=1.0)
    assert "TOPTOBOTTOM\t= FALSE" in hdr
    # the first stored row is the BOTTOM image row
    first = np.frombuffer(raw, dtype="<i2", count=5)
    assert (first == g[-1]).all()
    out, meta = decode_saga(raw, hdr)
    assert (out == g).all()
    assert meta["geotransform"] == (10.0, 1.0, 0.0, 6.0, 0.0, -1.0)
    with _pt.raises(ValueError, match="TOPTOBOTTOM"):
        decode_saga(raw, hdr.replace("TOPTOBOTTOM\t= FALSE",
                                     "TOPTOBOTTOM\t= TRUE"))


def test_paux_mixed_channels_and_endian():
    import numpy as np
    import pytest as _pt

    from gdal_spark.raster.hdrpairs import decode_paux, encode_paux

    b0 = np.arange(20, dtype=np.uint8).reshape(4, 5)
    b1 = (np.arange(20).reshape(4, 5).astype(np.int16) - 7)
    b2 = np.linspace(0, 1, 20, dtype=np.float32).reshape(4, 5)
    raw, aux = encode_paux([b0, b1, b2])
    assert "RawDefinition: 5 4 3" in aux
    assert "ChanDefinition-2: 16S 20 2 10 Swapped" in aux
    out = decode_paux(raw, aux)
    for a, b in zip(out, [b0, b1, b2]):
        assert (a == b).all() and a.dtype == b.dtype
    # Unswapped channel = big-endian bytes
    be_aux = ("AuxilaryTarget: x\nRawDefinition: 5 4 1\n"
              "ChanDefinition-1: 16S 0 2 10 Unswapped\n")
    out = decode_paux(b1.astype(">i2").tobytes(), be_aux)
    assert (out[0] == b1).all()
    with _pt.raises(ValueError, match="non-contiguous"):
        decode_paux(raw, aux.replace("16S 20 2 10", "16S 20 4 10"))
