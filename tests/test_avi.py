"""Uncompressed RIFF/AVI codec + real video frame sampling."""

import struct

import numpy as np

from gdal_spark import multimodal
from gdal_spark.raster.avi import decode_avi, encode_avi, is_avi


def _frames(n=5, h=7, w=9):
    f, y, x, c = np.meshgrid(
        np.arange(n), np.arange(h), np.arange(w), np.arange(3), indexing="ij"
    )
    return ((x + 2 * y + 3 * f + 17 * c) % 256).astype(np.uint8)


def test_roundtrip_exact():
    src = _frames()
    buf = encode_avi(src, fps=30)
    assert is_avi(buf)
    out, fps = decode_avi(buf)
    assert fps == 30
    np.testing.assert_array_equal(out, src)


def test_dib_layout_bottom_up_bgr_padded():
    """First stored row of the first frame is the BOTTOM image row in
    B,G,R order with 4-byte row padding (classic DIB)."""
    src = _frames(n=1, h=2, w=3)  # stride 3*3=9 -> padded to 12
    buf = encode_avi(src)
    movi = buf.index(b"00db")
    sz = struct.unpack_from("<I", buf, movi + 4)[0]
    assert sz == 12 * 2
    first_px = buf[movi + 8 : movi + 11]
    # bottom row (y=1), x=0: stored B,G,R = value(c=2), c=1, c=0
    assert list(first_px) == [
        int(src[0, 1, 0, 2]), int(src[0, 1, 0, 1]), int(src[0, 1, 0, 0])
    ]


def test_junk_chunk_tolerated():
    src = _frames(n=2)
    buf = bytearray(encode_avi(src))
    junk = b"JUNK" + struct.pack("<I", 5) + b"abcde" + b"\x00"  # odd -> pad
    buf[12:12] = junk
    struct.pack_into("<I", buf, 4, len(buf) - 8)
    out, _ = decode_avi(bytes(buf))
    np.testing.assert_array_equal(out, src)


def test_sampler_dispatches_on_avi(spark):
    src = _frames(n=9, h=4, w=4)
    videos = spark.createDataFrame(
        [("v0", bytearray(encode_avi(src))),
         ("v1", bytearray(bytes(range(256)) * 2))],  # stub path: 8 frames
        ["video_id", "bytes"],
    )
    rows = multimodal.sample_video_frames(videos, every_n=4).collect()
    got = {(r["video_id"], r["frame_idx"]): bytes(r["frame_bytes"]) for r in rows}
    assert set(got) == {("v0", 0), ("v0", 4), ("v0", 8),
                        ("v1", 0), ("v1", 4)}
    assert got[("v0", 4)] == src[4].tobytes()  # real decoded RGB24
    assert len(got[("v1", 0)]) == 64           # stub fixed-size frame


def test_video_frame_stats_golden(spark):
    from gdal_spark.raster.checksum import gdal_checksum

    src = _frames(n=4, h=6, w=8)
    videos = spark.createDataFrame(
        [("vid_7", bytearray(encode_avi(src)))], ["video_id", "bytes"]
    )
    rows = {
        r["frame_idx"]: r
        for r in multimodal.video_frame_stats(videos, every_n=3).collect()
    }
    assert set(rows) == {0, 3}
    for fi, r in rows.items():
        assert (r["w"], r["h"]) == (8, 6)
        assert r["checksum"] == gdal_checksum(src[fi, :, :, 0])
        assert r["px_sum"] == int(src[fi].sum(dtype=np.int64))


def _psnr(a, b):
    err = (a.astype(np.float64) - b.astype(np.float64)) ** 2
    return 10.0 * np.log10(255.0**2 / err.mean())


def test_mjpeg_roundtrip_psnr():
    """MJPG codec: each '00dc' chunk is a complete baseline JPEG;
    decode meets the BASELINE.json lossy parity rule (PSNR >= 40)."""
    src = _frames(n=4, h=33, w=29)  # non-multiple-of-8 dims
    buf = encode_avi(src, fps=12, codec="MJPG", quality=90)
    assert is_avi(buf)
    assert b"00dc" in buf and b"MJPG" in buf and b"00db" not in buf
    out, fps = decode_avi(buf)
    assert fps == 12 and out.shape == src.shape
    assert _psnr(src, out) >= 40.0


def test_mjpeg_chunks_are_standalone_jpegs():
    from gdal_spark.raster.jpeg import decode_jpeg

    src = _frames(n=2, h=16, w=16)
    buf = encode_avi(src, codec="MJPG")
    off = buf.index(b"00dc")
    sz = struct.unpack_from("<I", buf, off + 4)[0]
    payload = buf[off + 8 : off + 8 + sz]
    assert payload[:2] == b"\xff\xd8" and payload[-2:] == b"\xff\xd9"
    img = decode_jpeg(bytes(payload))
    assert img.shape == (16, 16, 3)
    assert _psnr(src[0], img) >= 40.0


def test_mjpeg_odd_payload_word_alignment():
    """RIFF chunks are word-aligned; odd-length JPEG payloads must not
    derail the chunk walk (scan many frames so some payload is odd)."""
    src = _frames(n=8, h=9, w=11)
    buf = encode_avi(src, codec="MJPG", quality=35)
    out, _ = decode_avi(buf)
    assert out.shape == src.shape


def test_unknown_compression_raises():
    src = _frames(n=1, h=8, w=8)
    buf = bytearray(encode_avi(src))
    strf = buf.index(b"strf")
    struct.pack_into("<4s", buf, strf + 8 + 16, b"H264")  # biCompression
    try:
        decode_avi(bytes(buf))
    except ValueError as e:
        assert "H264" in str(e)
    else:
        raise AssertionError("expected ValueError for H264 compression")


def test_sampler_mjpeg_path(spark):
    src = _frames(n=6, h=8, w=8)
    videos = spark.createDataFrame(
        [("m0", bytearray(encode_avi(src, codec="MJPG")))],
        ["video_id", "bytes"],
    )
    rows = multimodal.sample_video_frames(videos, every_n=3).collect()
    got = {r["frame_idx"]: np.frombuffer(
        bytes(r["frame_bytes"]), dtype=np.uint8).reshape(8, 8, 3)
        for r in rows}
    assert set(got) == {0, 3}
    for fi, img in got.items():
        assert _psnr(src[fi], img) >= 40.0


def test_audio_strh_does_not_clobber_video_rate():
    """A second (non-video) stream header after the video strh must
    not reset the decoded frame rate."""
    src = _frames(n=2)
    buf = bytearray(encode_avi(src, fps=30))
    auds = b"auds" + b"\x00" * 4 + struct.pack(
        "<IHHIIIIIIi", 0, 0, 0, 0, 1, 44100, 0, 0, 0, 0
    ) + struct.pack("<4H", 0, 0, 0, 0)
    chunk = b"strh" + struct.pack("<I", len(auds)) + auds
    movi = buf.index(b"LIST", 12)
    while buf[movi + 8 : movi + 12] != b"movi":
        movi = buf.index(b"LIST", movi + 1)
    buf[movi:movi] = chunk
    struct.pack_into("<I", buf, 4, len(buf) - 8)
    out, fps = decode_avi(bytes(buf))
    assert fps == 30
    np.testing.assert_array_equal(out, src)
