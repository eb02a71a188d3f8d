"""PCIDSK .pix codec (raster/pcidsk.py)."""

import numpy as np
import pytest

from gdal_spark.raster.pcidsk import decode_pcidsk, encode_pcidsk, is_pcidsk


def _chans(h=13, w=21, seed=2):
    rng = np.random.default_rng(seed)
    return [
        rng.integers(0, 256, (h, w)).astype(np.uint8),
        rng.integers(-30000, 30000, (h, w)).astype(np.int16),
        rng.integers(0, 60000, (h, w)).astype(np.uint16),
        (rng.integers(0, 1 << 20, (h, w))).astype(np.float32),
    ]


@pytest.mark.parametrize("ilv", ["BAND", "PIXEL"])
def test_mixed_type_roundtrip(ilv):
    chans = _chans()
    data = encode_pcidsk(chans, interleaving=ilv)
    assert is_pcidsk(data)
    assert len(data) % 512 == 0
    out, meta = decode_pcidsk(data)
    assert meta["interleaving"] == ilv
    assert meta["types"] == ["8U", "16S", "16U", "32R"]
    for a, b in zip(chans, out):
        np.testing.assert_array_equal(a, b)


def test_header_fields():
    data = encode_pcidsk(_chans(7, 9))
    fh = data[:512]
    assert fh[:8] == b"PCIDSK  "
    assert int(fh[384:392]) == 9 and int(fh[392:400]) == 7
    assert int(fh[376:384]) == 4
    assert fh[360:368].strip() == b"BAND"
    # declared file size in blocks equals the actual byte length
    assert int(fh[16:32]) * 512 == len(data)


def test_pixel_scanlines_are_512_padded():
    chans = _chans(3, 100)  # pgs = 1+2+2+4 = 9; 900 -> 1024
    data = encode_pcidsk(chans, interleaving="PIXEL")
    image_start = int(data[304:320])
    assert (len(data) - (image_start - 1) * 512) == 1024 * 3


def test_band_and_pixel_agree():
    chans = _chans(seed=7)
    a, _ = decode_pcidsk(encode_pcidsk(chans, "BAND"))
    b, _ = decode_pcidsk(encode_pcidsk(chans, "PIXEL"))
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)


def test_unsupported_dtype_rejected():
    with pytest.raises(ValueError, match="dtype"):
        encode_pcidsk([np.zeros((4, 4), dtype=np.int64)])


def test_file_interleaving_rejected_loudly():
    data = bytearray(encode_pcidsk(_chans(4, 4)))
    data[360:368] = b"FILE    "
    with pytest.raises(ValueError, match="interleaving"):
        decode_pcidsk(bytes(data))


def test_big_endian_marker_respected():
    chans = [np.arange(12, dtype=np.int16).reshape(3, 4) * -31]
    data = bytearray(encode_pcidsk(chans))
    ih_start = int(data[336:352])
    ih_off = (ih_start - 1) * 512
    # flip payload to big-endian and the marker to 'N'
    image_start = int(data[304:320])
    base = (image_start - 1) * 512
    arr = np.frombuffer(bytes(data[base : base + 24]), dtype="<i2")
    data[base : base + 24] = arr.astype(">i2").tobytes()
    data[ih_off + 201] = ord("N")
    out, _ = decode_pcidsk(bytes(data))
    np.testing.assert_array_equal(out[0], chans[0])
