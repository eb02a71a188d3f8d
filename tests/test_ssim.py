"""Block SSIM (multimodal.block_ssim_e6 / image_ssim)."""

import numpy as np

from gdal_spark.multimodal import SSIM_BLOCK, block_ssim_e6, image_ssim
from gdal_spark.raster.codecs import encode_image


def test_identical_images_ssim_one():
    a = (np.arange(16 * 24) % 256).astype(np.uint8).reshape(16, 24)
    n, ms = block_ssim_e6(a, a)
    assert n == (16 // 8) * (24 // 8)
    assert ms == 1_000_000 - 1 or ms == 1_000_000  # floor(1.0*1e6)
    # identical constant blocks: num==den exactly -> 1.0 -> 1e6
    c = np.full((8, 8), 7, dtype=np.uint8)
    assert block_ssim_e6(c, c)[1] == 1_000_000


def test_ssim_decreases_with_noise():
    rng = np.random.RandomState(7)
    a = rng.randint(0, 256, (32, 32)).astype(np.uint8)
    small = np.clip(a.astype(int) + rng.randint(-2, 3, a.shape), 0, 255)
    big = np.clip(a.astype(int) + rng.randint(-80, 81, a.shape), 0, 255)
    _, s_small = block_ssim_e6(a, small.astype(np.uint8))
    _, s_big = block_ssim_e6(a, big.astype(np.uint8))
    assert 1_000_000 > s_small > s_big


def test_crop_to_whole_blocks():
    a = np.zeros((19, 13), dtype=np.uint8)
    n, _ = block_ssim_e6(a, a)
    assert n == (19 // SSIM_BLOCK) * (13 // SSIM_BLOCK)
    # sub-block image -> no blocks, defined zero result
    assert block_ssim_e6(a[:4, :4], a[:4, :4]) == (0, 0)


def test_matches_reference_formula_per_block():
    rng = np.random.RandomState(3)
    a = rng.randint(0, 256, (8, 8)).astype(np.uint8)
    b = rng.randint(0, 256, (8, 8)).astype(np.uint8)
    n, got = block_ssim_e6(a, b)
    assert n == 1
    x, y = a.astype(float), b.astype(float)
    mux, muy = x.mean(), y.mean()
    sxx, syy = x.var(), y.var()          # population stats
    sxy = (x * y).mean() - mux * muy
    c1, c2 = (0.01 * 255) ** 2, (0.03 * 255) ** 2
    want = ((2 * mux * muy + c1) * (2 * sxy + c2)) / (
        (mux ** 2 + muy ** 2 + c1) * (sxx + syy + c2)
    )
    assert abs(got / 1e6 - want) < 2e-6


def test_image_ssim_through_decode(spark):
    y, x = np.mgrid[0:16, 0:16]
    arr = np.stack(
        [(x + y) % 256, (x + y + 85) % 256, (x + y + 170) % 256], axis=2
    ).astype(np.uint8)
    df = spark.createDataFrame(
        [("img0", bytearray(encode_image(arr, "png")), "png")],
        "image_id string, bytes binary, fmt string",
    )
    row = image_ssim(df).collect()[0]
    nb, want = block_ssim_e6(arr[:, :, 0], arr[:, :, 1])
    assert row["n_blocks"] == nb == 4
    assert row["mssim_e6"] == want
