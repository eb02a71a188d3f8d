"""Warp resampling kernels (numpy), re-derived from the reference:

- coordinate convention: dst pixel CENTER (ix + 0.5) is inverse-
  transformed to continuous source pixel space where integer values
  lie on pixel EDGES (alg/gdalwarpkernel.cpp:4951, 5008-5021)
- nearest: src index = floor(dfSrc); valid iff 0 <= dfSrc <= size
  (with the 1e-10 guard)            [gdalwarpkernel.cpp:4985-5025]
- bilinear 4-sample: iSrc = (int)(dfSrc - 0.5),
  ratio = 1.5 - (dfSrc - iSrc); out-of-bounds neighbors get weight 0
  and the total renormalizes        [gdalwarpkernel.cpp:2989-3060]
- byte output rounding: (int)(v + 0.5), clamped
- 2x overview "average" for integer types:
  (T)(sum/weight + 0.5) i.e. round-half-up of the 2x2 mean
                                    [gcore/overview.cpp:1667]
"""

from __future__ import annotations

import numpy as np


def inverse_grid(
    tile_x: int, tile_y: int, z: int, ulx: float, uly: float, res_src: float,
    origin: float, res_z: float, tile_size: int = 256,
) -> tuple[np.ndarray, np.ndarray]:
    """Continuous source pixel coords (dfSrcX, dfSrcY) of every dst
    pixel center in tile (tile_x, tile_y) at zoom z, for a source
    image with top-left world corner (ulx, uly) at res_src m/px."""
    px = np.arange(tile_size, dtype=np.float64)
    wx = -origin + (tile_x * tile_size + px + 0.5) * res_z
    wy = origin - (tile_y * tile_size + px + 0.5) * res_z
    dfx = (wx[None, :] - ulx) / res_src
    dfy = (uly - wy[:, None]) / res_src
    return np.broadcast_to(dfx, (tile_size, tile_size)), np.broadcast_to(
        dfy, (tile_size, tile_size)
    )


def sample_nearest(
    src: np.ndarray, dfx: np.ndarray, dfy: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """(values, mask): nearest-neighbour sample of src (h, w[, c]) at
    continuous coords; mask False where the coord is off-image."""
    h, w = src.shape[:2]
    ix = np.floor(dfx).astype(np.int64)
    iy = np.floor(dfy).astype(np.int64)
    mask = (ix >= 0) & (ix < w) & (iy >= 0) & (iy < h)
    ixc = np.clip(ix, 0, w - 1)
    iyc = np.clip(iy, 0, h - 1)
    return src[iyc, ixc], mask


def sample_bilinear(
    src: np.ndarray, dfx: np.ndarray, dfy: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Bilinear 4-sample with edge renormalization; byte rounding is
    the caller's job (use round_to_byte)."""
    h, w = src.shape[:2]
    fx = dfx - 0.5
    fy = dfy - 0.5
    ix = np.floor(fx).astype(np.int64)
    iy = np.floor(fy).astype(np.int64)
    rx = 1.0 - (fx - ix)  # weight of the left column
    ry = 1.0 - (fy - iy)
    vals = np.zeros(dfx.shape + src.shape[2:], dtype=np.float64)
    wsum = np.zeros(dfx.shape, dtype=np.float64)
    for dy_, wy_ in ((0, ry), (1, 1.0 - ry)):
        for dx_, wx_ in ((0, rx), (1, 1.0 - rx)):
            sx = ix + dx_
            sy = iy + dy_
            ok = (sx >= 0) & (sx < w) & (sy >= 0) & (sy < h)
            wgt = np.where(ok, wx_ * wy_, 0.0)
            sxc = np.clip(sx, 0, w - 1)
            syc = np.clip(sy, 0, h - 1)
            pix = src[syc, sxc].astype(np.float64)
            vals += pix * (wgt[..., None] if pix.ndim > wgt.ndim else wgt)
            wsum += wgt
    mask = wsum > 0
    safe = np.where(wsum > 0, wsum, 1.0)
    vals = vals / (safe[..., None] if vals.ndim > safe.ndim else safe)
    return vals, mask


def cubic_kernel(x: np.ndarray) -> np.ndarray:
    """Catmull-Rom a=-0.5 (alg/gdalresamplingkernels.h:23-44)."""
    ax = np.abs(x)
    x2 = x * x
    w = np.where(
        ax <= 1.0,
        x2 * (1.5 * ax - 2.5) + 1.0,
        np.where(ax <= 2.0, x2 * (-0.5 * ax + 2.5) - 4.0 * ax + 2.0, 0.0),
    )
    return w


def sample_cubic(
    src: np.ndarray, dfx: np.ndarray, dfy: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """4x4 Catmull-Rom resample (GWKCubicResample semantics: anchor
    iSrc = floor(dfSrc - 0.5), taps iSrc-1..iSrc+2, per-tap kernel
    weights of the fractional offset; edge taps clamp and weights
    renormalize)."""
    h, w = src.shape[:2]
    fx = dfx - 0.5
    fy = dfy - 0.5
    ix = np.floor(fx).astype(np.int64)
    iy = np.floor(fy).astype(np.int64)
    tx = fx - ix  # in [0, 1)
    ty = fy - iy
    vals = np.zeros(dfx.shape + src.shape[2:], dtype=np.float64)
    wsum = np.zeros(dfx.shape, dtype=np.float64)
    for dy_ in (-1, 0, 1, 2):
        wy = cubic_kernel(ty - dy_)
        for dx_ in (-1, 0, 1, 2):
            wx = cubic_kernel(tx - dx_)
            sx = ix + dx_
            sy = iy + dy_
            ok = (sx >= 0) & (sx < w) & (sy >= 0) & (sy < h)
            wgt = np.where(ok, wx * wy, 0.0)
            pix = src[np.clip(sy, 0, h - 1), np.clip(sx, 0, w - 1)].astype(np.float64)
            vals += pix * (wgt[..., None] if pix.ndim > wgt.ndim else wgt)
            wsum += wgt
    mask = wsum > 0
    safe = np.where(mask, wsum, 1.0)
    vals = vals / (safe[..., None] if vals.ndim > safe.ndim else safe)
    return vals, mask


FOOTPRINT_STATS = ("min", "max", "sum", "rms", "med", "q1", "q3", "mode")


def sample_footprint_stats(
    src: np.ndarray,
    x0: np.ndarray,
    x1: np.ndarray,
    y0: np.ndarray,
    y1: np.ndarray,
    stats: tuple[str, ...] = FOOTPRINT_STATS,
) -> tuple[dict[str, np.ndarray], np.ndarray]:
    """GWKAverageOrMode stat family over the dst pixel's source
    footprint (centers in [x0,x1) x [y0,y1); same inclusion rule as
    sample_average): min, max, sum, rms (sqrt of mean square,
    +0.5 round at byte cast time), and the GDAL discrete quantiles
    med/q1/q3 — sorted values indexed at ceil(q*n - 1)
    (gdalwarpkernel.cpp:7605, GWKAOM_Quant). Returns ({stat: array},
    mask); integer stats stay exact for integer sources."""
    h, w = src.shape[:2]
    sx0 = np.ceil(x0 - 0.5).astype(np.int64)
    sy0 = np.ceil(y0 - 0.5).astype(np.int64)
    max_tx = int(np.max(np.floor(x1 - 0.5) - sx0 + 1)) if x1.size else 0
    max_ty = int(np.max(np.floor(y1 - 0.5) - sy0 + 1)) if y1.size else 0
    taps = []
    oks = []
    for dy_ in range(max(0, max_ty)):
        sy = sy0 + dy_
        in_y = (sy + 0.5 < y1) & (sy + 0.5 >= y0) & (sy >= 0) & (sy < h)
        for dx_ in range(max(0, max_tx)):
            sx = sx0 + dx_
            ok = in_y & (sx + 0.5 < x1) & (sx + 0.5 >= x0) & (sx >= 0) & (sx < w)
            pix = src[np.clip(sy, 0, h - 1), np.clip(sx, 0, w - 1)].astype(np.float64)
            taps.append(np.where(ok, pix, np.nan))
            oks.append(ok)
    stack = np.stack(taps, axis=0) if taps else np.zeros((0,) + x0.shape)
    okst = np.stack(oks, axis=0) if oks else np.zeros((0,) + x0.shape, bool)
    n = okst.sum(axis=0)
    mask = n > 0
    safe_n = np.where(mask, n, 1)
    out: dict[str, np.ndarray] = {}
    with np.errstate(invalid="ignore"):
        if "min" in stats:
            out["min"] = np.where(mask, np.nanmin(stack, axis=0, initial=np.inf, where=okst), 0.0)
        if "max" in stats:
            out["max"] = np.where(mask, np.nanmax(stack, axis=0, initial=-np.inf, where=okst), 0.0)
        if "sum" in stats:
            out["sum"] = np.nansum(stack, axis=0)
        if "rms" in stats:
            out["rms"] = np.sqrt(np.nansum(stack * stack, axis=0) / safe_n)
        if "mode" in stats:
            # GWKAverageOrMode GWKAOM_Fmode running-max rule on the
            # taps in scan order: the first value to REACH the max
            # count wins — for <= 4 taps this is "first repeated
            # sample, else first valid sample" (see mode_2x2)
            if len(taps) > 4:
                raise NotImplementedError(
                    "footprint 'mode' implemented for <= 4 taps (2x warp)"
                )
            flat = [np.where(okst[t], stack[t], np.nan) for t in range(len(taps))]
            while len(flat) < 4:
                flat.append(np.full_like(flat[0], np.nan))
            s0, s1, s2, s3 = flat
            first_valid = s0.copy()
            for cand in (s1, s2, s3):
                first_valid = np.where(np.isnan(first_valid), cand, first_valid)
            out["mode"] = np.where(
                (s1 == s0),
                s1,
                np.where(
                    (s2 == s0) | (s2 == s1),
                    s2,
                    np.where(
                        (s3 == s0) | (s3 == s1) | (s3 == s2), s3, first_valid
                    ),
                ),
            )
            out["mode"] = np.where(mask, np.nan_to_num(out["mode"]), 0.0)
        quants = {"med": 0.5, "q1": 0.25, "q3": 0.75}
        wanted = [s for s in stats if s in quants]
        if wanted:
            # sort taps (NaN sorts last); pick ceil(q*n - 1) per pixel
            srt = np.sort(np.where(okst, stack, np.inf), axis=0)
            for s in wanted:
                q = quants[s]
                idx = np.ceil(q * n - 1).astype(np.int64)
                idx = np.clip(idx, 0, max(len(taps) - 1, 0))
                out[s] = np.where(
                    mask, np.take_along_axis(srt, idx[None, ...], axis=0)[0], 0.0
                )
    return out, mask


def cubic_bspline_kernel(x: np.ndarray) -> np.ndarray:
    """Cubic B-spline (alg/gdalresamplingkernels.h CubicSplineKernel):
    (1/6) * ((x+2)+^3 - 4(x+1)+^3 + 6(x)+^3 - 4(x-1)+^3) on |x|<=2,
    evaluated on the absolute offset like the reference."""
    v = np.abs(x)

    def p3(t):
        return np.where(t > 0.0, t * t * t, 0.0)

    out = (
        p3(v + 2.0) - 4.0 * p3(v + 1.0) + 6.0 * p3(v) - 4.0 * p3(v - 1.0)
    ) / 6.0
    return np.where(v > 2.0, 0.0, out)


def lanczos_kernel(x: np.ndarray, r: int = 3) -> np.ndarray:
    """Lanczos windowed sinc, radius r=3 (gdalwarpkernel.cpp
    GWKLanczosSinc): sinc(x) * sinc(x/r) for |x| < r, 1 at 0."""
    ax = np.abs(x)
    with np.errstate(invalid="ignore", divide="ignore"):
        px = np.pi * x
        out = np.where(
            ax < 1e-15,
            1.0,
            np.sin(px) * np.sin(px / r) / (px * px / r),
        )
    return np.where(ax >= r, 0.0, out)


def _sample_kernel(
    src: np.ndarray,
    dfx: np.ndarray,
    dfy: np.ndarray,
    kernel,
    radius: int,
) -> tuple[np.ndarray, np.ndarray]:
    """Generic separable filter resample (GWKResample shape): anchor
    iSrc = floor(dfSrc - 0.5), taps iSrc-(r-1)..iSrc+r, weights
    kernel(delta - tap); edge taps drop and weights renormalize.
    Validity follows GWKCheckAndComputeSrcOffsets: the dst pixel
    center must map inside the source extent."""
    h, w = src.shape[:2]
    fx = dfx - 0.5
    fy = dfy - 0.5
    ix = np.floor(fx).astype(np.int64)
    iy = np.floor(fy).astype(np.int64)
    tx = fx - ix
    ty = fy - iy
    vals = np.zeros(dfx.shape + src.shape[2:], dtype=np.float64)
    wsum = np.zeros(dfx.shape, dtype=np.float64)
    for dy_ in range(-(radius - 1), radius + 1):
        wy = kernel(ty - dy_)
        for dx_ in range(-(radius - 1), radius + 1):
            wx = kernel(tx - dx_)
            sx = ix + dx_
            sy = iy + dy_
            ok = (sx >= 0) & (sx < w) & (sy >= 0) & (sy < h)
            wgt = np.where(ok, wx * wy, 0.0)
            pix = src[np.clip(sy, 0, h - 1), np.clip(sx, 0, w - 1)].astype(np.float64)
            vals += pix * (wgt[..., None] if pix.ndim > wgt.ndim else wgt)
            wsum += wgt
    inside = (
        (np.floor(dfx) >= 0) & (np.floor(dfx) < w)
        & (np.floor(dfy) >= 0) & (np.floor(dfy) < h)
    )
    mask = inside & (np.abs(wsum) > 1e-6)
    safe = np.where(mask, wsum, 1.0)
    vals = vals / (safe[..., None] if vals.ndim > safe.ndim else safe)
    return vals, mask


def sample_cubicspline(
    src: np.ndarray, dfx: np.ndarray, dfy: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """4x4 cubic B-spline (GRA_CubicSpline, radius 2)."""
    return _sample_kernel(src, dfx, dfy, cubic_bspline_kernel, 2)


def sample_lanczos(
    src: np.ndarray, dfx: np.ndarray, dfy: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """6x6 Lanczos windowed sinc (GRA_Lanczos, radius 3)."""
    return _sample_kernel(src, dfx, dfy, lanczos_kernel, 3)


def sample_average(
    src: np.ndarray, x0: np.ndarray, x1: np.ndarray, y0: np.ndarray, y1: np.ndarray,
    nodata: float | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """Warp 'average': unweighted mean of source pixels whose CENTERS
    fall in the dst pixel's source-space footprint [x0, x1) x [y0, y1)
    (GWKAverageOrMode center-inclusion contract); `nodata` source
    pixels are excluded from the mean, mirroring the masked-weighting
    path of overview.cpp / the warp kernel's density handling — a dst
    pixel with only nodata sources stays unmasked=False. Footprints
    here are small (downsample factors <= 8); loops run over the
    bounded tap window, vectorized across dst pixels."""
    h, w = src.shape[:2]
    # first source index whose center (s + 0.5) >= x0  ->  ceil(x0 - 0.5)
    sx0 = np.ceil(x0 - 0.5).astype(np.int64)
    sy0 = np.ceil(y0 - 0.5).astype(np.int64)
    max_taps_x = int(np.max(np.floor(x1 - 0.5) - sx0 + 1)) if x1.size else 0
    max_taps_y = int(np.max(np.floor(y1 - 0.5) - sy0 + 1)) if y1.size else 0
    vals = np.zeros(x0.shape + src.shape[2:], dtype=np.float64)
    cnt = np.zeros(x0.shape, dtype=np.float64)
    for dy_ in range(max(0, max_taps_y)):
        sy = sy0 + dy_
        in_y = (sy + 0.5 < y1) & (sy + 0.5 >= y0) & (sy >= 0) & (sy < h)
        for dx_ in range(max(0, max_taps_x)):
            sx = sx0 + dx_
            ok = in_y & (sx + 0.5 < x1) & (sx + 0.5 >= x0) & (sx >= 0) & (sx < w)
            pix = src[np.clip(sy, 0, h - 1), np.clip(sx, 0, w - 1)].astype(np.float64)
            if nodata is not None:
                valid = pix != nodata
                ok = ok & (valid if valid.ndim == ok.ndim else valid.all(axis=-1))
            wgt = ok.astype(np.float64)
            vals += pix * (wgt[..., None] if pix.ndim > wgt.ndim else wgt)
            cnt += wgt
    mask = cnt > 0
    safe = np.where(mask, cnt, 1.0)
    vals = vals / (safe[..., None] if vals.ndim > safe.ndim else safe)
    return vals, mask


def round_to_byte(vals: np.ndarray) -> np.ndarray:
    """GDAL float->Byte: (int)(v + 0.5) clamped to [0, 255]."""
    return np.clip(np.floor(vals + 0.5), 0, 255).astype(np.uint8)


def average_2x2(block: np.ndarray) -> np.ndarray:
    """Integer-type 2x downsample: round-half-up mean of each 2x2
    window (overview.cpp:1667 Byte/UInt16 path)."""
    h, w = block.shape[:2]
    b = block.astype(np.float64)
    s = b[0::2, 0::2] + b[0::2, 1::2] + b[1::2, 0::2] + b[1::2, 1::2]
    return np.floor(s / 4.0 + 0.5).astype(block.dtype)


def rms_2x2(block: np.ndarray) -> np.ndarray:
    """'rms' overview: integer sqrt(mean of squares) + 0.5 rounding
    (overview.cpp ComputeIntegerRMS / :1759)."""
    b = block.astype(np.float64)
    s = (
        b[0::2, 0::2] ** 2 + b[0::2, 1::2] ** 2
        + b[1::2, 0::2] ** 2 + b[1::2, 1::2] ** 2
    )
    return np.floor(np.sqrt(s / 4.0) + 0.5).astype(block.dtype)


def gauss_2x2(block: np.ndarray) -> np.ndarray:
    """'gauss' overview (overview.cpp GDALResampleChunk_Gauss, 2x
    case): 3x3 kernel [1 2 1; 2 4 2; 1 2 1] centered at source pixel
    (2x+1, 2y+1), edge taps dropped with the weight sum renormalized
    (dfTotal / nCount), then Byte round-half-up."""
    h, w = block.shape[:2]
    oh, ow = h // 2, w // 2
    pad = np.zeros((h + 1, w + 1), dtype=np.float64)
    pad[:h, :w] = block.astype(np.float64)
    ok = np.zeros((h + 1, w + 1), dtype=np.float64)
    ok[:h, :w] = 1.0
    k = ((1, 2, 1), (2, 4, 2), (1, 2, 1))
    tot = np.zeros((oh, ow), dtype=np.float64)
    cnt = np.zeros((oh, ow), dtype=np.float64)
    for i in range(3):
        for j in range(3):
            sub = pad[i : i + 2 * oh : 2, j : j + 2 * ow : 2]
            sok = ok[i : i + 2 * oh : 2, j : j + 2 * ow : 2]
            tot += k[i][j] * sub * sok
            cnt += k[i][j] * sok
    return np.floor(tot / cnt + 0.5).astype(block.dtype)


def mode_2x2(block: np.ndarray) -> np.ndarray:
    """'mode' overview: most frequent of the 4 samples; ties resolve
    to the value that FIRST REACHES the max count in NW,NE,SW,SE scan
    order (overview.cpp GDALResampleChunk_ModeT keeps the current
    value only on a strict `++anVals[nVal] > nMaxVal` increase).

    With 4 samples that running-max rule reduces exactly to: the
    first sample that repeats an earlier sample wins; if all four are
    distinct the NW sample wins (it reached count 1 first). E.g.
    [a,b,b,a] -> b (b reaches count 2 at sample 3, before a does).
    Fully vectorized — no per-pixel Python loop."""
    s0 = block[0::2, 0::2]
    s1 = block[0::2, 1::2]
    s2 = block[1::2, 0::2]
    s3 = block[1::2, 1::2]
    out = np.where(
        s1 == s0,
        s1,
        np.where(
            (s2 == s0) | (s2 == s1),
            s2,
            np.where((s3 == s0) | (s3 == s1) | (s3 == s2), s3, s0),
        ),
    ).astype(block.dtype)
    return out
