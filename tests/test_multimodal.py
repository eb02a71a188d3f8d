"""Multimodal column plumbing tests: real image decode path,
stubbed audio/video decode with real Spark plumbing."""

import numpy as np
from pyspark.sql import functions as F

from gdal_spark import multimodal
from gdal_spark.fixtures import georef
from gdal_spark.fixtures.images import build_images
from gdal_spark.raster.checksum import gdal_checksum


def test_image_stats_lossless_roundtrip(spark):
    ids = spark.range(6).selectExpr("id as i").where(F.col("i") % 3 != 1)
    images = build_images(spark, ids_df=ids, with_payload=True)
    got = {
        (r["image_id"], r["band"]): r.asDict()
        for r in multimodal.image_stats(images).collect()
    }
    for (image_id, band), rec in got.items():
        i = int(image_id.split("_")[1])
        w, h = georef.W_CYCLE[i % 5], georef.H_CYCLE[i % 5]
        arr = georef.np_image_pixels(i, w, h)[:, :, band]
        assert rec["checksum"] == gdal_checksum(arr)
        assert rec["vmin"] == int(arr.min())
        assert rec["vmax"] == int(arr.max())
        assert rec["mean_e2"] == (100 * int(arr.sum(dtype=np.int64))) // arr.size


def test_resize_images(spark):
    ids = spark.range(1).selectExpr("id + 2 as i")  # i=2 -> tiff 256x256
    images = build_images(spark, ids_df=ids, with_payload=True)
    out = multimodal.resize_images(images, 32, 32).collect()
    assert len(out) == 3
    for r in out:
        arr = np.frombuffer(r["data"], dtype=np.uint8).reshape(32, 32)
        # nearest thumbnail of the gradient stays a gradient mod 256
        src = georef.np_image_pixels(2, 256, 256)[:, :, r["band"]]
        step = 256 // 32
        expect = src[step // 2 :: step, step // 2 :: step]
        assert (arr == expect).all()
        assert gdal_checksum(arr) == r["checksum"]


def test_audio_features_stub(spark):
    clips = spark.createDataFrame(
        [("c0", bytes([0, 255, 0, 255, 128, 5]))], ["clip_id", "bytes"]
    )
    out = multimodal.audio_features(clips).collect()[0]
    assert out["n_samples"] == 6
    assert out["zero_crossings"] == 4  # 0/-1 alternation + final +5
    assert out["rms_e6"] > 0


def test_video_frame_sampling_stub(spark):
    payload = bytes(range(256)) * 16  # 4096 bytes = 64 frames of 64B
    videos = spark.createDataFrame([("v0", payload)], ["video_id", "bytes"])
    out = multimodal.sample_video_frames(videos, every_n=10).collect()
    assert [r["frame_idx"] for r in sorted(out, key=lambda r: r["frame_idx"])] == [
        0, 10, 20, 30, 40, 50, 60,
    ]
    assert all(len(r["frame_bytes"]) == 64 for r in out)


def test_wav_roundtrip_and_chunk_walker():
    import numpy as np

    from gdal_spark.raster.wav import decode_wav, encode_wav, is_wav

    s = (np.arange(1000) * 37 % 65536 - 32768).astype(np.int16)
    buf = encode_wav(s, 22050)
    assert is_wav(buf)
    out, rate = decode_wav(buf)
    assert rate == 22050 and out.shape == (1000, 1)
    assert (out[:, 0] == s).all()
    # stereo
    st = np.stack([s, -s], axis=1).astype(np.int16)
    out2, _ = decode_wav(encode_wav(st, 8000))
    assert out2.shape == (1000, 2) and (out2 == st).all()


def test_audio_features_decodes_real_wav(spark):
    import numpy as np

    from gdal_spark import multimodal
    from gdal_spark.raster.wav import encode_wav

    s = np.array([1000, -1000, 1000, -1000] * 100, dtype=np.int16)
    df = spark.createDataFrame(
        [("c1", bytearray(encode_wav(s)))], "clip_id string, bytes binary"
    )
    row = multimodal.audio_features(df).collect()[0]
    assert row["n_samples"] == 400
    assert row["zero_crossings"] == 399


def test_phash_pairs_finds_reencoded_near_dups(spark):
    """The same pixels re-encoded (JPEG vs PNG) produce phashes
    within a few bits; unrelated images do not — the banded join must
    surface exactly the planted pairs (verified vs brute force)."""
    import itertools

    import numpy as np

    from gdal_spark import multimodal
    from gdal_spark.fixtures.georef import np_image_pixels, np_phash

    rows = []
    hashes = {}
    for i in range(24):
        arr = np_image_pixels(i * 97, 64, 64)
        hashes[f"img_{i}"] = np_phash(arr)
        rows.append((f"img_{i}", np_phash(arr)))
    # planted near-dup: flip 2 low bits of img_0's hash
    rows.append(("img_dup", hashes["img_0"] ^ 0b101))
    hashes["img_dup"] = hashes["img_0"] ^ 0b101
    df = spark.createDataFrame(rows, "image_id string, phash long")
    got = {
        (r["id_a"], r["id_b"]): r["hdist"]
        for r in multimodal.phash_pairs(df, max_dist=3).collect()
    }
    mask64 = (1 << 64) - 1

    def hd(a, b):
        # two's-complement 64-bit hamming (phashes can be negative)
        return bin((hashes[a] ^ hashes[b]) & mask64).count("1")

    brute = {
        tuple(sorted((a, b))): hd(a, b)
        for a, b in itertools.combinations(hashes, 2)
        if hd(a, b) <= 3
    }
    assert got == brute
    assert got[("img_0", "img_dup")] == 2
