"""nearblack collar removal (apps/nearblack_lib.cpp semantics).

The reference scans each row from the left edge and from the right
edge (ProcessLine, :424-431), masking pixels while they stay within
`near_dist` of black (or white), stopping at the first pixel that
exceeds the tolerance (with an allowance of `max_non_black` outliers);
a top-down and bottom-up pass does the same per column. The masked
set is the near-black COLLAR reachable by axis scans from the edges —
not a general flood fill.

Vectorized per image with numpy cumulative tricks: for each scan
direction, the masked prefix length is the index of the first
non-near-black pixel (argmax over the boolean), handled wholesale for
all rows/columns at once.
"""

from __future__ import annotations

import numpy as np

__all__ = ["nearblack_mask"]


def _prefix_mask(near: np.ndarray) -> np.ndarray:
    """near: (rows, n) booleans; True while still near-black walking
    left->right. Returns mask of the near-black PREFIX per row."""
    stop = np.argmax(~near, axis=1)  # first False; 0 if none False
    all_near = near.all(axis=1)
    stop = np.where(all_near, near.shape[1], stop)
    idx = np.arange(near.shape[1])[None, :]
    return idx < stop[:, None]


def nearblack_mask(
    arr: np.ndarray, near_dist: int = 15, near_white: bool = False
) -> np.ndarray:
    """Boolean mask of collar pixels to set to nodata. arr: (h, w) or
    (h, w, c); a pixel is 'near' when every band is within near_dist
    of 0 (or 255 with near_white)."""
    a = arr if arr.ndim == 3 else arr[:, :, None]
    target = 255 if near_white else 0
    near = (np.abs(a.astype(np.int64) - target) <= near_dist).all(axis=2)
    mask = _prefix_mask(near)                      # left pass
    mask |= _prefix_mask(near[:, ::-1])[:, ::-1]   # right pass
    mask |= _prefix_mask(near.T).T                 # top pass
    mask |= _prefix_mask(near.T[:, ::-1])[:, ::-1].T  # bottom pass
    return mask
