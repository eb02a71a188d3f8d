"""MP4 / ISO BMFF container codec (raster/mp4.py).

Covers the box grammar edges the ISO 14496-12 layout allows that the
writer itself doesn't emit: free boxes, 64-bit largesize, an AUDIO
trak preceding the video trak (the MP4 analog of the AVI strf-binding
advisory), and the stsc run-length chunk map.
"""

import struct

import numpy as np
import pytest

from gdal_spark.raster.mp4 import decode_mp4, encode_mp4, is_mp4


def _frames(n=7, h=12, w=16, seed=3):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(n, h, w, 3), dtype=np.uint8)


def test_raw_roundtrip_exact():
    fr = _frames()
    data = encode_mp4(fr, fps=25, codec="raw ")
    assert is_mp4(data)
    dec, fps = decode_mp4(data)
    assert fps == 25
    assert np.array_equal(dec, fr)


@pytest.mark.parametrize("n", [1, 2, 3, 4, 6, 10])
def test_raw_chunking_variants(n):
    # writer packs 3 samples per chunk -> n exercises full/partial
    # trailing chunks and single-run vs two-run stsc tables
    fr = _frames(n=n, h=8, w=8, seed=n)
    dec, _ = decode_mp4(encode_mp4(fr, codec="raw "))
    assert np.array_equal(dec, fr)


def test_jpeg_psnr_rule():
    y, x, c = np.meshgrid(np.arange(24), np.arange(32), np.arange(3),
                          indexing="ij")
    fr = np.stack([(2 * x + 3 * y + 30 * c + 4 * f).astype(np.uint8)
                   for f in range(5)])
    dec, fps = decode_mp4(encode_mp4(fr, fps=30, codec="jpeg", quality=90))
    assert fps == 30 and dec.shape == fr.shape
    mse = ((dec.astype(np.float64) - fr) ** 2).mean()
    psnr = 10.0 * np.log10(255.0**2 / max(mse, 1e-12))
    assert psnr >= 40.0


def _find_box(data: bytes, btype: bytes) -> tuple[int, int]:
    off = 0
    while off + 8 <= len(data):
        size, t = struct.unpack_from(">I4s", data, off)
        if t == btype:
            return off, size
        off += size
    raise AssertionError(f"{btype!r} not found")


def test_free_box_and_largesize_tolerated():
    fr = _frames(n=4, h=8, w=8)
    data = encode_mp4(fr, codec="raw ")
    # splice a 'free' box between ftyp and mdat, shifting mdat — the
    # stco offsets must be rebased by the insertion amount
    ftyp_off, ftyp_size = _find_box(data, b"ftyp")
    insert_at = ftyp_off + ftyp_size
    free = struct.pack(">I4s", 24, b"free") + b"\x00" * 16
    shifted = bytearray(data[:insert_at] + free + data[insert_at:])
    # rebase stco entries (absolute file offsets)
    moff = shifted.find(b"stco")
    (n_off,) = struct.unpack_from(">I", shifted, moff + 8)
    for i in range(n_off):
        pos = moff + 12 + 4 * i
        (v,) = struct.unpack_from(">I", shifted, pos)
        struct.pack_into(">I", shifted, pos, v + len(free))
    # and rewrite the mdat header as a 64-bit largesize box
    mdat_off, mdat_size = _find_box(bytes(shifted), b"mdat")
    large = struct.pack(">I4sQ", 1, b"mdat", mdat_size + 8)
    shifted2 = bytearray(shifted[:mdat_off] + large
                         + shifted[mdat_off + 8 : mdat_off + mdat_size]
                         + shifted[mdat_off + mdat_size :])
    # largesize adds 8 bytes of header before the payload
    moff = shifted2.find(b"stco")
    (n_off,) = struct.unpack_from(">I", shifted2, moff + 8)
    for i in range(n_off):
        pos = moff + 12 + 4 * i
        (v,) = struct.unpack_from(">I", shifted2, pos)
        if v > mdat_off:
            struct.pack_into(">I", shifted2, pos, v + 8)
    dec, _ = decode_mp4(bytes(shifted2))
    assert np.array_equal(dec, fr)


def test_audio_trak_first_still_binds_video():
    """A 'soun' trak BEFORE the video trak (full stbl of its own) must
    not bind the video dimensions — the reader keys on hdlr 'vide'."""
    fr = _frames(n=3, h=8, w=8)
    data = encode_mp4(fr, codec="raw ")
    # build a second mp4 whose only difference is the handler + entry
    # fourcc, then graft its trak in front of the video trak
    fake = bytearray(encode_mp4(_frames(n=3, h=4, w=4, seed=9), codec="raw "))
    i = fake.find(b"vide")
    fake[i : i + 4] = b"soun"
    i = fake.find(b"raw ", fake.find(b"stsd"))
    fake[i : i + 4] = b"mp4a"
    t0 = fake.find(b"trak") - 4
    (tsize,) = struct.unpack_from(">I", fake, t0)
    soun_trak = bytes(fake[t0 : t0 + tsize])

    out = bytearray(data)
    moov_off, moov_size = _find_box(data, b"moov")
    trak_off = data.find(b"trak", moov_off) - 4
    out[trak_off:trak_off] = soun_trak
    struct.pack_into(">I", out, moov_off, moov_size + len(soun_trak))
    # stco offsets unchanged: mdat precedes moov
    dec, _ = decode_mp4(bytes(out))
    assert dec.shape == fr.shape
    assert np.array_equal(dec, fr)


def test_unsupported_codec_raises():
    fr = _frames(n=2, h=8, w=8)
    data = bytearray(encode_mp4(fr, codec="raw "))
    i = data.find(b"raw ", data.find(b"stsd"))
    data[i : i + 4] = b"avc1"
    with pytest.raises(ValueError, match="codec stack"):
        decode_mp4(bytes(data))


def test_not_mp4_raises():
    assert not is_mp4(b"RIFF\x00\x00\x00\x00AVI ")
    with pytest.raises(ValueError, match="ISO BMFF"):
        decode_mp4(b"\x00" * 32)


def test_video_frame_stats_dispatches_mp4(spark):
    from gdal_spark import multimodal
    from gdal_spark.raster.checksum import gdal_checksum

    fr = _frames(n=4, h=8, w=8, seed=11)
    pdf = [("v0", bytearray(encode_mp4(fr, codec="raw ")))]
    videos = spark.createDataFrame(pdf, "video_id string, bytes binary")
    rows = multimodal.video_frame_stats(videos, every_n=2).collect()
    assert [(r.frame_idx, r.w, r.h) for r in rows] == [(0, 8, 8), (2, 8, 8)]
    for r in rows:
        assert r.checksum == int(gdal_checksum(fr[r.frame_idx][:, :, 0]))
        assert r.px_sum == int(fr[r.frame_idx].sum(dtype=np.int64))
