"""VP8L lossless webp codec (raster/webp.py) + tile-sink wiring.
Reference: apps/gdalalg_raster_tile.cpp:358 output formats;
frmts/webp/webpdataset.cpp delegates to libwebp — this is a
from-scratch spec-subset implementation (no transforms / LZ77 /
color cache), self-roundtrip-verified like the repo's other codecs."""

import struct

import numpy as np
import pytest

from gdal_spark.raster.webp import decode_webp, encode_webp_lossless


def synth(h, w):
    return (
        (np.arange(h)[:, None, None] + np.arange(w)[None, :, None]
         + np.array([0, 85, 170])[None, None, :]) % 256
    ).astype(np.uint8)


class TestRoundtrip:
    @pytest.mark.parametrize(
        "img",
        [
            synth(64, 64),
            synth(256, 256),
            np.full((16, 16, 3), 77, np.uint8),
            np.array([[[1, 2, 3]]], dtype=np.uint8),
            np.tile(np.array([[[0, 0, 0], [255, 255, 255]]], np.uint8),
                    (8, 8, 1)),
        ],
        ids=["synth64", "tile256", "flat", "1x1", "2color"],
    )
    def test_rgb(self, img):
        dec = decode_webp(encode_webp_lossless(img))
        assert np.array_equal(dec[:, :, :3], img)
        assert (dec[:, :, 3] == 255).all()

    def test_rgba(self):
        rng = np.random.default_rng(7)
        img = rng.integers(0, 256, (33, 17, 4)).astype(np.uint8)
        assert np.array_equal(decode_webp(encode_webp_lossless(img)), img)

    def test_random_noise(self):
        rng = np.random.default_rng(3)
        img = rng.integers(0, 256, (40, 40, 3)).astype(np.uint8)
        dec = decode_webp(encode_webp_lossless(img))
        assert np.array_equal(dec[:, :, :3], img)


class TestContainer:
    def test_riff_structure(self):
        data = encode_webp_lossless(synth(8, 8))
        assert data[:4] == b"RIFF"
        (riff_size,) = struct.unpack_from("<I", data, 4)
        assert riff_size == len(data) - 8
        assert data[8:12] == b"WEBP"
        assert data[12:16] == b"VP8L"
        assert data[20] == 0x2F  # VP8L signature byte

    def test_dimensions_in_header(self):
        data = encode_webp_lossless(synth(13, 29))
        bits = int.from_bytes(data[21:25], "little")
        assert (bits & 0x3FFF) == 29 - 1            # width - 1
        assert ((bits >> 14) & 0x3FFF) == 13 - 1    # height - 1

    def test_flat_compresses(self):
        img = np.full((64, 64, 3), 9, np.uint8)
        assert len(encode_webp_lossless(img)) < 100  # 12 KB raw

    def test_entropy_beats_raw_on_skewed(self):
        # heavily skewed histogram: entropy coding must win
        rng = np.random.default_rng(1)
        img = np.where(
            rng.random((64, 64, 3)) < 0.95, 10,
            rng.integers(0, 256, (64, 64, 3)),
        ).astype(np.uint8)
        assert len(encode_webp_lossless(img)) < img.size * 0.6


class TestSink:
    def test_codec_registry(self):
        from gdal_spark.raster.codecs import (
            LOSSLESS,
            decode_image,
            encode_image,
            sniff_format,
        )

        img = synth(32, 32)
        enc = encode_image(img, "webp")
        assert "webp" in LOSSLESS
        assert sniff_format(enc[:16]) == "webp"
        assert np.array_equal(decode_image(enc), img)

    def test_encode_tiles_webp(self, spark):
        from pyspark.sql import functions as F

        from gdal_spark.fixtures.images import build_images
        from gdal_spark.operators.render import encode_tiles, render_tiles

        ids = spark.range(1, 40).select((F.col("id") * 499).alias("i"))
        images = build_images(spark, ids_df=ids, with_payload=False)
        tiles = render_tiles(images, 12, with_data=True)
        out = encode_tiles(tiles, 12, fmt="webp").limit(3).collect()
        assert out
        for r in out:
            assert r.path.endswith(".webp")
            payload = bytes(r.payload)
            assert payload[:4] == b"RIFF" and payload[12:16] == b"VP8L"
            arr = decode_webp(payload)
            assert arr.shape == (256, 256, 4)


# ---------------------------------------------------------------------------
# LZ77 backward references + color cache (round-4)
# ---------------------------------------------------------------------------

def test_lz77_compresses_gradient_tiles():
    import numpy as np

    from gdal_spark.raster.webp import decode_webp, encode_webp_lossless

    x, y = np.meshgrid(np.arange(256), np.arange(256))
    arr = np.stack(
        [(x + y) % 256, (x + y + 85) % 256, (x + y + 170) % 256], axis=2
    ).astype(np.uint8)
    full = encode_webp_lossless(arr)
    literal = encode_webp_lossless(arr, use_lz77=False, cache_bits=0)
    assert len(full) * 2 < len(literal)  # verdict ask: >= 2x smaller
    dec = decode_webp(full)
    assert (dec[:, :, :3] == arr).all()
    assert (dec[:, :, 3] == 255).all()


def test_lz77_overlapping_copy_roundtrip():
    import numpy as np

    from gdal_spark.raster.webp import decode_webp, encode_webp_lossless

    # a 2-pixel period forces overlapping copies (dist < length)
    row = np.tile(np.array([10, 200], dtype=np.uint8), 32)
    arr = np.tile(row.reshape(1, 64, 1), (8, 1, 3))
    enc = encode_webp_lossless(arr)
    assert (decode_webp(enc)[:, :, :3] == arr).all()


def test_color_cache_only_roundtrip():
    import numpy as np

    from gdal_spark.raster.webp import decode_webp, encode_webp_lossless

    rng = np.random.default_rng(11)
    # few distinct colors scattered -> cache hits without LZ77 runs
    pal = rng.integers(0, 256, (7, 3), dtype=np.uint8)
    idx = rng.integers(0, 7, (32, 32))
    arr = pal[idx]
    enc = encode_webp_lossless(arr, use_lz77=False, cache_bits=4)
    assert (decode_webp(enc)[:, :, :3] == arr).all()


def test_random_noise_roundtrip_with_lz77():
    import numpy as np

    from gdal_spark.raster.webp import decode_webp, encode_webp_lossless

    rng = np.random.default_rng(5)
    arr = rng.integers(0, 256, (48, 48, 4), dtype=np.uint8).astype(np.uint8)
    assert (decode_webp(encode_webp_lossless(arr)) == arr).all()
