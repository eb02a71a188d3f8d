"""gdal_translate-style per-image ops: window crop, band select,
linear rescale, dtype cast — plus VRT-style per-pixel functions
(raster calc) composed over decoded payloads.

Semantics re-derived from apps/gdal_translate_lib.cpp:655-1001
(-srcwin pixel crop, -b band select/reorder, -scale linear rescale
src_min..src_max -> dst_min..dst_max, -ot dtype cast with GDAL's
+0.5-floor-clamp integer rounding) and frmts/vrt/pixelfunctions.cpp
(sum/diff/mul elementwise ops).

Shape: narrow mapInPandas over the images table — decode, slice,
rescale in numpy, emit stats/checksum. No shuffle; scales linearly.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from gdal_spark.raster.checksum import gdal_checksum
from gdal_spark.raster.codecs import decode_image


def scale_to_byte(arr: np.ndarray, src_min: float, src_max: float,
                  dst_min: float = 0.0, dst_max: float = 255.0) -> np.ndarray:
    """-scale: linear map + GDAL float->Byte rounding
    ((int)(v + 0.5), clamped) — gdal_translate_lib.cpp -scale +
    GDALCopyWords rounding."""
    if src_max == src_min:
        scaled = np.full(arr.shape, dst_min, dtype=np.float64)
    else:
        ratio = (dst_max - dst_min) / (src_max - src_min)
        scaled = (arr.astype(np.float64) - src_min) * ratio + dst_min
    return np.clip(np.floor(scaled + 0.5), 0, 255).astype(np.uint8)


TRANSLATE_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType()),
        T.StructField("band", T.IntegerType()),
        T.StructField("out_w", T.IntegerType()),
        T.StructField("out_h", T.IntegerType()),
        T.StructField("checksum", T.IntegerType()),
        T.StructField("vsum", T.LongType()),
    ]
)


def translate(
    images: DataFrame,
    srcwin: tuple[int, int, int, int] | None = None,
    bands: list[int] | None = None,
    scale: tuple[float, float, float, float] | None = None,
) -> DataFrame:
    """Crop (-srcwin xoff yoff w h, clipped to the image), band
    select/reorder (-b, 0-based), linear rescale (-scale smin smax
    dmin dmax). Emits per-band checksum + value sum of the result."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            recs = []
            for _, row in pdf.iterrows():
                arr = decode_image(bytes(row["bytes"]), row["fmt"])
                if arr.ndim == 2:
                    arr = arr[:, :, None]
                if srcwin is not None:
                    x0, y0, w, h = srcwin
                    arr = arr[y0 : y0 + h, x0 : x0 + w]
                sel = bands if bands is not None else list(range(arr.shape[2]))
                for out_b, b in enumerate(sel):
                    band = arr[:, :, b]
                    if scale is not None:
                        band = scale_to_byte(band, *scale)
                    recs.append(
                        {
                            "image_id": row["image_id"],
                            "band": out_b,
                            "out_w": band.shape[1],
                            "out_h": band.shape[0],
                            "checksum": gdal_checksum(band),
                            "vsum": int(band.sum(dtype=np.int64)),
                        }
                    )
            yield pd.DataFrame(recs, columns=[f.name for f in TRANSLATE_SCHEMA])

    return images.select("image_id", "bytes", "fmt").mapInPandas(
        run, TRANSLATE_SCHEMA
    )


CALC_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType()),
        T.StructField("op", T.StringType()),
        T.StructField("checksum", T.IntegerType()),
        T.StructField("vsum", T.LongType()),
    ]
)


def pixel_calc(images: DataFrame, ops: list[str] | None = None) -> DataFrame:
    """VRT pixel functions over the image's own bands
    (frmts/vrt/pixelfunctions.cpp registry): sum = b0+b1+b2, diff =
    b0-b1, mul = b0*b1, reclassify = (b0 < 128 ? 0 : 255), intensity
    = mean band (integer floor), norm_diff = (b0-b1)/(b0+b1)
    quantized e3, sqrt = floor(sqrt(b0*b1)), inv = reciprocal scaled
    to 255^2/(b0+1), pow = b0^2. Float-parity rule: every op is
    EXACT integer math (floor-division / isqrt-style), so checksums
    cross engines bit-for-bit."""
    ops = ops or [
        "sum", "diff", "mul", "reclassify",
        "intensity", "norm_diff", "sqrt", "inv", "pow",
    ]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            recs = []
            for _, row in pdf.iterrows():
                arr = decode_image(bytes(row["bytes"]), row["fmt"]).astype(np.int64)
                if arr.ndim == 2:
                    arr = arr[:, :, None]
                b0 = arr[:, :, 0]
                b1 = arr[:, :, 1] if arr.shape[2] > 1 else b0
                b2 = arr[:, :, 2] if arr.shape[2] > 2 else b0
                outs = {
                    "sum": b0 + b1 + b2,
                    "diff": b0 - b1,
                    "mul": b0 * b1,
                    "reclassify": np.where(b0 < 128, 0, 255),
                    "intensity": (b0 + b1 + b2) // 3,
                    # floor division is FLOOR in numpy and DuckDB //
                    "norm_diff": (1000 * (b0 - b1)) // np.maximum(b0 + b1, 1),
                    # IEEE sqrt is exact on perfect squares: floor safe
                    "sqrt": np.floor(np.sqrt((b0 * b1).astype(np.float64))).astype(np.int64),
                    "inv": (255 * 255) // (b0 + 1),
                    "pow": b0 * b0,
                }
                for op in ops:
                    band = outs[op]
                    recs.append(
                        {
                            "image_id": row["image_id"],
                            "op": op,
                            "checksum": gdal_checksum(band),
                            "vsum": int(band.sum(dtype=np.int64)),
                        }
                    )
            yield pd.DataFrame(recs, columns=[f.name for f in CALC_SCHEMA])

    return images.select("image_id", "bytes", "fmt").mapInPandas(run, CALC_SCHEMA)


PANSHARP_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType()),
        T.StructField("band", T.IntegerType()),
        T.StructField("checksum", T.IntegerType()),
        T.StructField("vsum", T.LongType()),
    ]
)


def pansharpen_brovey(images: DataFrame) -> DataFrame:
    """Weighted-Brovey pansharpening (alg/gdalpansharpen.cpp:537-557):
    pseudo_pan = sum(w_i * spectral_i), factor = pan / pseudo_pan,
    out_i = spectral_i * factor with Byte GDALCopyWord rounding.
    Weights (1/4, 1/2, 1/4) and the synthetic pan band
    ((x + y + i + 42) % 256) keep the arithmetic EXACT-integer:
    out = (2 * 4 * b_i * pan + s) // (2 * s) with s = b0 + 2 b1 + b2
    (the float-parity floor(p/q + 1/2) identity), clamped to 255.
    Input needs (image_id, bytes, fmt) plus the content seed i."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            recs = []
            for _, row in pdf.iterrows():
                arr = decode_image(bytes(row["bytes"]), row["fmt"]).astype(np.int64)
                i = int(row["i"])
                h, w = arr.shape[:2]
                gy, gx = np.mgrid[0:h, 0:w]
                pan = (gx + gy + i + 42) % 256
                b0, b1, b2 = arr[:, :, 0], arr[:, :, 1], arr[:, :, 2]
                s = b0 + 2 * b1 + b2  # 4 * pseudo_pan; > 0 by fixture
                for b, plane in enumerate((b0, b1, b2)):
                    p = 4 * plane * pan
                    out = np.minimum((2 * p + s) // (2 * s), 255)
                    recs.append(
                        {
                            "image_id": row["image_id"],
                            "band": b,
                            "checksum": gdal_checksum(out),
                            "vsum": int(out.sum(dtype=np.int64)),
                        }
                    )
            yield pd.DataFrame(recs, columns=[f.name for f in PANSHARP_SCHEMA])

    return images.select("image_id", "i", "bytes", "fmt").mapInPandas(
        run, PANSHARP_SCHEMA
    )


def stack_bands(
    images: DataFrame,
    group_col: str = "grp",
    member_col: str = "member",
    bytes_col: str = "bytes",
    fmt_col: str = "fmt",
) -> DataFrame:
    """`gdal raster stack` (apps/gdalalg_raster_stack.cpp): combine N
    single-band inputs into one N-band dataset — output band k is
    input k's band 1.  Input rows carry (group, member ordinal,
    encoded bytes); each group independently decodes its members,
    stacks band 0 in member order, and re-encodes a REAL multiband
    TIFF.  Groups whose members disagree on dimensions raise, like
    the reference.  Scale shape: one groupBy(group) shuffle; the
    codec work is a narrow Arrow kernel per group.
    """
    import pandas as pd
    from pyspark.sql import types as T

    out_schema = T.StructType(
        [
            T.StructField("grp", T.LongType()),
            T.StructField("n_bands", T.IntegerType()),
            T.StructField("bytes", T.BinaryType()),
        ]
    )

    def stack(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        from gdal_spark.raster.codecs import decode_image
        from gdal_spark.raster.tiff import encode_tiff

        pdf = pdf.sort_values(member_col)
        planes = []
        for buf, fmt in zip(pdf[bytes_col], pdf[fmt_col]):
            arr = decode_image(bytes(buf), fmt)
            band0 = arr if arr.ndim == 2 else arr[:, :, 0]
            if planes and band0.shape != planes[0].shape:
                raise ValueError(
                    "stack: inputs disagree on dimensions "
                    f"{band0.shape} vs {planes[0].shape}"
                )
            planes.append(band0)
        out = np.stack(planes, axis=-1)
        if out.shape[2] not in (1, 3):
            raise ValueError(
                "stack: engine TIFF codec writes 1- or 3-band outputs"
            )
        return pd.DataFrame(
            [
                {
                    "grp": int(key[0]),
                    "n_bands": out.shape[2],
                    "bytes": encode_tiff(out),
                }
            ]
        )

    return images.groupBy(group_col).applyInPandas(stack, out_schema)
