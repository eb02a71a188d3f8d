"""Deterministic image augmentation for training-data pipelines.

The classic augmentation chain — crop, horizontal/vertical flip,
quarter rotation — with parameters derived from the image id by the
fixture LCG, so the whole transform is a closed-form coordinate
mapping and the augmented pixels have an exact SQL oracle.  (The
geometric kernels mirror the reference's raster windowing +
gdal_translate flip idioms; randomized augmentation is just this
with a real RNG seeding the same parameters.)

Order: crop -> flips -> rot90 (numpy counterclockwise), so the
output pixel (v, u) reads source pixel:

    rot=1: y_c = u,             x_c = Wc - 1 - v        (else v, u)
    y_src = y0 + (Hc-1-y_c if flip_v else y_c)
    x_src = x0 + (Wc-1-x_c if flip_h else x_c)
"""

from __future__ import annotations

import numpy as np

__all__ = ["augment_params", "augment_image"]

_LCG_A, _LCG_C, _LCG_M = 1103515245, 12345, 1 << 31


def augment_params(i: int, w: int, h: int) -> dict:
    """LCG-derived augmentation parameters for image id `i`."""
    f1 = (i * _LCG_A + _LCG_C) % _LCG_M
    f2 = (f1 * _LCG_A + _LCG_C) % _LCG_M
    f3 = (f2 * _LCG_A + _LCG_C) % _LCG_M
    crop_w = w - w // 4
    crop_h = h - h // 4
    return {
        "flip_h": f1 % 2,
        "flip_v": (f1 // 2) % 2,
        "rot": (f1 // 4) % 2,
        "x0": f2 % (w - crop_w + 1),
        "y0": f3 % (h - crop_h + 1),
        "crop_w": crop_w,
        "crop_h": crop_h,
    }


def augment_image(arr: np.ndarray, p: dict) -> np.ndarray:
    out = arr[p["y0"]:p["y0"] + p["crop_h"],
              p["x0"]:p["x0"] + p["crop_w"]]
    if p["flip_v"]:
        out = out[::-1, :]
    if p["flip_h"]:
        out = out[:, ::-1]
    if p["rot"]:
        out = np.rot90(out)
    return np.ascontiguousarray(out)
