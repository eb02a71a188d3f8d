"""Deterministic augmentation chain (raster/augment.py)."""

import numpy as np

from gdal_spark.raster.augment import augment_image, augment_params


def test_params_deterministic_and_bounded():
    p1 = augment_params(7, 64, 48)
    p2 = augment_params(7, 64, 48)
    assert p1 == p2
    assert p1["crop_w"] == 48 and p1["crop_h"] == 36
    assert 0 <= p1["x0"] <= 16 and 0 <= p1["y0"] <= 12
    assert p1["flip_h"] in (0, 1) and p1["rot"] in (0, 1)


def test_chain_order_crop_flip_rot():
    arr = np.arange(24).reshape(4, 6)
    p = {"x0": 1, "y0": 1, "crop_w": 4, "crop_h": 2,
         "flip_h": 1, "flip_v": 0, "rot": 0}
    out = augment_image(arr, p)
    # crop rows 1..2, cols 1..4 -> [[7,8,9,10],[13,14,15,16]] then flip_h
    assert out.tolist() == [[10, 9, 8, 7], [16, 15, 14, 13]]
    p["rot"] = 1
    out2 = augment_image(arr, p)
    assert out2.shape == (4, 2)
    # np.rot90: out[i, j] = in[j, N-1-i]
    assert out2.tolist() == np.rot90([[10, 9, 8, 7],
                                      [16, 15, 14, 13]]).tolist()


def test_rotation_swaps_dims():
    arr = np.zeros((40, 60), dtype=np.uint8)
    for i in range(50):
        p = augment_params(i, 60, 40)
        out = augment_image(arr[:40, :60], p)
        if p["rot"]:
            assert out.shape == (p["crop_w"], p["crop_h"])
        else:
            assert out.shape == (p["crop_h"], p["crop_w"])
