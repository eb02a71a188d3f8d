"""ISIS3 cube codec (raster/isis3.py)."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from gdal_spark.raster.isis3 import decode_isis3, encode_isis3


def test_bsq_multiband_roundtrip():
    a = np.arange(7 * 11 * 3, dtype=np.uint8).reshape(7, 11, 3)
    out, meta = decode_isis3(encode_isis3(a))
    assert (out == a).all()
    assert meta["format"] == "BandSequential"


def test_tile_padding_roundtrip():
    # 7x11 with 4x3 tiles: edge tiles padded, band-major order
    a = np.arange(7 * 11 * 2, dtype=np.int16).reshape(7, 11, 2) - 40
    data = encode_isis3(a, fmt="Tile", tile=(4, 3))
    out, meta = decode_isis3(data)
    assert (out == a).all()
    assert meta["format"] == "Tile"
    # core size = full padded tiles: bpr=3, bpc=3 -> 3*3*2 tiles
    label_end = data.find(b"\nEnd\n") + 5
    start = int(
        [ln for ln in data[:label_end].decode().splitlines()
         if "StartByte" in ln][0].split("=")[1]
    )
    assert len(data) - (start - 1) == 3 * 3 * 2 * 4 * 3 * 2


def test_label_self_reference_and_keywords():
    a = np.zeros((5, 6), dtype=np.float32)
    data = encode_isis3(a, base=17.5, multiplier=0.25)
    head = data.decode("latin-1", errors="replace")
    assert "Object = IsisCube" in head and "Type       = Real" in head
    start = int(
        [ln for ln in head.splitlines() if "StartByte" in ln][0]
        .split("=")[1]
    )
    assert data[: start - 1].decode().endswith("End\n")
    out, meta = decode_isis3(data)
    assert meta["base"] == 17.5 and meta["multiplier"] == 0.25
    assert (out[:, :, 0] == a).all()


def test_msb_read_path():
    # a hand-built Msb BandSequential label (foreign-writer shape)
    a = (np.arange(12).reshape(3, 4) - 5).astype(">i2")
    label = (
        "Object = IsisCube\n  Object = Core\n"
        "    StartByte   = {s}\n    Format      = BandSequential\n"
        "    Group = Dimensions\n      Samples = 4\n      Lines   = 3\n"
        "      Bands   = 1\n    End_Group\n"
        "    Group = Pixels\n      Type       = SignedWord\n"
        "      ByteOrder  = Msb\n    End_Group\n"
        "  End_Object\nEnd_Object\nEnd\n"
    )
    s = len(label.format(s=0)) + 1
    while len(label.format(s=s)) + 1 != s:
        s = len(label.format(s=s)) + 1
    data = label.format(s=s).encode() + a.tobytes()
    out, _ = decode_isis3(data)
    assert (out[:, :, 0] == a.astype(np.int16)).all()


def test_unknown_type_raises():
    with pytest.raises(ValueError, match="unsupported dtype"):
        encode_isis3(np.zeros((2, 2), dtype=np.float64))


@settings(max_examples=25, deadline=None)
@given(
    w=st.integers(1, 17), h=st.integers(1, 13),
    tw=st.integers(1, 8), th=st.integers(1, 8),
    dt=st.sampled_from(["u1", "u2", "i2", "f4"]),
    seed=st.integers(0, 2**31 - 1),
)
def test_tile_roundtrip_property(w, h, tw, th, dt, seed):
    rng = np.random.RandomState(seed)
    if dt == "f4":
        a = rng.rand(h, w).astype("f4")
    else:
        info = np.iinfo(dt)
        a = rng.randint(info.min, int(info.max) + 1,
                        size=(h, w)).astype(dt)
    out, _ = decode_isis3(encode_isis3(a, fmt="Tile", tile=(tw, th)))
    assert (out[:, :, 0] == a).all()
