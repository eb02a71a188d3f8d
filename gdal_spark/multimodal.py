"""Multimodal column handling: opaque binary payloads + typed
metadata, decoded and feature-extracted inside Arrow-batched UDFs.

Images are REAL end-to-end here (the engine ships pure-numpy
PNG/TIFF/JPEG codecs — raster/codecs.py, the Spark analog of GDAL's
driver registry gcore/gdaldataset.cpp:3609-3862). Audio/video decode
needs codec libraries this container does not ship, so those decode
steps are deterministic STUBS behind the same plumbing (schema,
batching, partition shape are real and tested; swap `_decode_*_stub`
for a real decoder in production).

Batch shape: mapInPandas with bounded Arrow batches; one decoded
image lives at a time per worker loop iteration — peak memory is
O(batch_rows x metadata) + O(one decoded image), never O(batch
pixels). At 10^12 rows this is a narrow pass, no shuffle.
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
from gdal_spark.raster.resample import sample_nearest

IMAGE_STATS_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType()),
        T.StructField("band", T.IntegerType()),
        T.StructField("mean_e2", T.LongType()),
        T.StructField("vmin", T.IntegerType()),
        T.StructField("vmax", T.IntegerType()),
        T.StructField("checksum", T.IntegerType()),
    ]
)


def image_stats(images: DataFrame) -> DataFrame:
    """Decode payload bytes (fmt-dispatched) and emit per-band stats +
    GDAL checksum. mean_e2 = floor(mean * 100) so a SQL oracle can
    reproduce it exactly from the synthetic pixel formula.

    Mirrors GDALRasterBand::ComputeStatistics
    (gcore/gdalrasterband.cpp:6478) as a per-image vectorized op.
    """

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            recs = []
            for _, row in pdf.iterrows():
                arr = decode_image(bytes(row["bytes"]), row["fmt"])
                if arr.ndim == 2:
                    arr = arr[:, :, None]
                for b in range(arr.shape[2]):
                    band = arr[:, :, b]
                    s = int(band.sum(dtype=np.int64))
                    n = band.size
                    recs.append(
                        {
                            "image_id": row["image_id"],
                            "band": b,
                            "mean_e2": (100 * s) // n,
                            "vmin": int(band.min()),
                            "vmax": int(band.max()),
                            "checksum": gdal_checksum(band),
                        }
                    )
            yield pd.DataFrame(recs, columns=[f.name for f in IMAGE_STATS_SCHEMA])

    return images.select("image_id", "bytes", "fmt").mapInPandas(
        stats, IMAGE_STATS_SCHEMA
    )


HISTOGRAM_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType()),
        T.StructField("band", T.IntegerType()),
        T.StructField("bucket", T.IntegerType()),
        T.StructField("n", T.LongType()),
    ]
)


def image_histogram(images: DataFrame) -> DataFrame:
    """Per-band 256-bucket histogram over [-0.5, 255.5] (the Byte
    default of GDALRasterBand::GetHistogram, gcore/gdalrasterband.cpp
    :4133): bucket == pixel value; only non-empty buckets emitted."""

    def hist(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            recs = []
            for _, row in pdf.iterrows():
                arr = decode_image(bytes(row["bytes"]), row["fmt"])
                if arr.ndim == 2:
                    arr = arr[:, :, None]
                for b in range(arr.shape[2]):
                    counts = np.bincount(arr[:, :, b].ravel(), minlength=256)
                    for bucket in np.nonzero(counts)[0]:
                        recs.append(
                            {
                                "image_id": row["image_id"],
                                "band": b,
                                "bucket": int(bucket),
                                "n": int(counts[bucket]),
                            }
                        )
            yield pd.DataFrame(recs, columns=[f.name for f in HISTOGRAM_SCHEMA])

    return images.select("image_id", "bytes", "fmt").mapInPandas(
        hist, HISTOGRAM_SCHEMA
    )


COLOR_RELIEF_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType()),
        T.StructField("channel", T.IntegerType()),
        T.StructField("checksum", T.IntegerType()),
        T.StructField("vsum", T.LongType()),
    ]
)


def image_color_relief(images: DataFrame, band: int = 0) -> DataFrame:
    """gdaldem color-relief of one decoded band -> RGB; per-channel
    checksum + sum (apps/gdaldem_lib.cpp:1756-1773 interpolation)."""
    from gdal_spark.raster.dem import color_relief

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            recs = []
            for _, row in pdf.iterrows():
                arr = decode_image(bytes(row["bytes"]), row["fmt"])
                if arr.ndim == 3:
                    arr = arr[:, :, band]
                rgb = color_relief(arr.astype(np.float64))
                for c in range(3):
                    recs.append(
                        {
                            "image_id": row["image_id"],
                            "channel": c,
                            "checksum": gdal_checksum(rgb[:, :, c]),
                            "vsum": int(rgb[:, :, c].sum(dtype=np.int64)),
                        }
                    )
            yield pd.DataFrame(recs, columns=[f.name for f in COLOR_RELIEF_SCHEMA])

    return images.select("image_id", "bytes", "fmt").mapInPandas(
        run, COLOR_RELIEF_SCHEMA
    )


FILLNODATA_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType()),
        T.StructField("n_nodata", T.LongType()),
        T.StructField("n_filled", T.LongType()),
        T.StructField("fillsum_e2", T.LongType()),
    ]
)


def image_fillnodata(images: DataFrame, nodata: int = 0, band: int = 0,
                     max_search_dist: int = 4) -> DataFrame:
    """IDW nodata fill over decoded band `band`
    (alg/rasterfill.cpp contract — see raster/components.fill_nodata):
    per image, counts of nodata/filled pixels and the sum of
    floor(filled_value * 100)."""
    from gdal_spark.raster.components import fill_nodata

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            recs = []
            for _, row in pdf.iterrows():
                arr = decode_image(bytes(row["bytes"]), row["fmt"])
                if arr.ndim == 3:
                    arr = arr[:, :, band]
                arr = arr.astype(np.float64)
                out = fill_nodata(arr, float(nodata), max_search_dist)
                nd = arr == nodata
                filled = nd & (out != nodata)
                recs.append(
                    {
                        "image_id": row["image_id"],
                        "n_nodata": int(nd.sum()),
                        "n_filled": int(filled.sum()),
                        "fillsum_e2": int(np.floor(out[filled] * 100).sum()),
                    }
                )
            yield pd.DataFrame(recs, columns=[f.name for f in FILLNODATA_SCHEMA])

    return images.select("image_id", "bytes", "fmt").mapInPandas(
        run, FILLNODATA_SCHEMA
    )


RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType()),
        T.StructField("out_w", T.IntegerType()),
        T.StructField("out_h", T.IntegerType()),
        T.StructField("band", T.IntegerType()),
        T.StructField("checksum", T.IntegerType()),
        T.StructField("data", T.BinaryType()),
    ]
)


def resize_images(images: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """Nearest-neighbour thumbnail (gdal_translate -outsize
    semantics: dst pixel center maps to src at the size ratio,
    gcore/rasterio.cpp decimated-read path)."""

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            recs = []
            for _, row in pdf.iterrows():
                arr = decode_image(bytes(row["bytes"]), row["fmt"])
                if arr.ndim == 2:
                    arr = arr[:, :, None]
                h, w = arr.shape[:2]
                dfx = (np.arange(out_w) + 0.5)[None, :] * (w / out_w)
                dfy = (np.arange(out_h) + 0.5)[:, None] * (h / out_h)
                dfx = np.broadcast_to(dfx, (out_h, out_w))
                dfy = np.broadcast_to(dfy, (out_h, out_w))
                vals, _ = sample_nearest(arr, dfx, dfy)
                for b in range(vals.shape[2]):
                    recs.append(
                        {
                            "image_id": row["image_id"],
                            "out_w": out_w,
                            "out_h": out_h,
                            "band": b,
                            "checksum": gdal_checksum(vals[:, :, b]),
                            "data": vals[:, :, b].tobytes(),
                        }
                    )
            yield pd.DataFrame(recs, columns=[f.name for f in RESIZE_SCHEMA])

    return images.select("image_id", "bytes", "fmt").mapInPandas(
        resize, RESIZE_SCHEMA
    )


# ---------------------------------------------------------------------------
# audio / video: real plumbing, stubbed decode
# ---------------------------------------------------------------------------

AUDIO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("clip_id", T.StringType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("rms_e6", T.LongType()),
        T.StructField("zero_crossings", T.LongType()),
    ]
)


def _decode_audio(data: bytes) -> np.ndarray:
    """RIFF/WAVE payloads decode for REAL (raster/wav.py, 16-bit PCM,
    channel-averaged to mono floats in [-1, 1)); anything else falls
    back to the round-1 deterministic stub (raw int8 PCM) — there is
    no general codec stack in this container, and the stub keeps the
    plumbing exercised for compressed formats."""
    from gdal_spark.raster.flac import decode_flac, is_flac
    from gdal_spark.raster.ogg import decode_ogg, is_ogg
    from gdal_spark.raster.wav import decode_wav, is_wav

    if is_wav(bytes(data)):
        samples, _rate = decode_wav(bytes(data))
        return samples.astype(np.float64).mean(axis=1) / 32768.0
    if is_flac(bytes(data)):
        samples, _rate = decode_flac(bytes(data))
        return samples.astype(np.float64).mean(axis=1) / 32768.0
    if is_ogg(bytes(data)):
        samples, _rate = decode_ogg(bytes(data))
        return samples.astype(np.float64).mean(axis=1) / 32768.0
    return np.frombuffer(data, dtype=np.int8).astype(np.float64) / 128.0


_decode_audio_stub = _decode_audio  # back-compat alias


def audio_features(clips: DataFrame, id_col: str = "clip_id", payload_col: str = "bytes") -> DataFrame:
    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            recs = []
            for _, row in pdf.iterrows():
                pcm = _decode_audio(bytes(row[payload_col]))
                sgn = np.signbit(pcm)
                recs.append(
                    {
                        "clip_id": row[id_col],
                        "n_samples": len(pcm),
                        "rms_e6": int(np.floor(1e6 * np.sqrt(np.mean(pcm**2)))) if len(pcm) else 0,
                        "zero_crossings": int((sgn[1:] != sgn[:-1]).sum()),
                    }
                )
            yield pd.DataFrame(recs, columns=[f.name for f in AUDIO_FEATURES_SCHEMA])

    return clips.select(
        F.col(id_col).alias("clip_id"), F.col(payload_col)
    ).mapInPandas(feats, AUDIO_FEATURES_SCHEMA)


FRAME_SAMPLE_SCHEMA = T.StructType(
    [
        T.StructField("video_id", T.StringType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_bytes", T.BinaryType()),
    ]
)


def sample_video_frames(videos: DataFrame, every_n: int = 10,
                        id_col: str = "video_id", payload_col: str = "bytes") -> DataFrame:
    """Frame sampling with REAL decode for RIFF/AVI payloads
    (raster/avi.py: uncompressed 24-bit DIB and Motion-JPEG via the
    in-repo baseline JPEG codec — frame_bytes is the decoded top-down
    RGB24 plane) AND ISO BMFF / MP4 payloads (raster/mp4.py: QuickTime
    'raw ' RGB24 and 'jpeg' Motion-JPEG sample entries), with the
    fixed-64-byte stub as the documented fallback for codec-bearing
    formats this container cannot decode (H.26x/AV1 samples, Ogg, ...).  Shape either way: 1 input row -> many frame rows,
    still a narrow map (no shuffle)."""
    from gdal_spark.raster.avi import decode_avi, is_avi
    from gdal_spark.raster.mp4 import decode_mp4, is_mp4

    frame_size = 64

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            recs = []
            for _, row in pdf.iterrows():
                data = bytes(row[payload_col])
                if is_avi(data) or is_mp4(data):
                    frames, _fps = (decode_avi(data) if is_avi(data)
                                    else decode_mp4(data))
                    for fi in range(0, len(frames), every_n):
                        recs.append(
                            {
                                "video_id": row[id_col],
                                "frame_idx": fi,
                                "frame_bytes": frames[fi].tobytes(),
                            }
                        )
                    continue
                n_frames = len(data) // frame_size
                for fi in range(0, n_frames, every_n):
                    recs.append(
                        {
                            "video_id": row[id_col],
                            "frame_idx": fi,
                            "frame_bytes": data[fi * frame_size : (fi + 1) * frame_size],
                        }
                    )
            yield pd.DataFrame(recs, columns=[f.name for f in FRAME_SAMPLE_SCHEMA])

    return videos.select(
        F.col(id_col).alias("video_id"), F.col(payload_col)
    ).mapInPandas(sample, FRAME_SAMPLE_SCHEMA)


VIDEO_FRAME_STATS_SCHEMA = T.StructType(
    [
        T.StructField("video_id", T.StringType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("w", T.IntegerType()),
        T.StructField("h", T.IntegerType()),
        T.StructField("checksum", T.IntegerType()),
        T.StructField("px_sum", T.LongType()),
    ]
)


def video_frame_stats(videos: DataFrame, every_n: int = 1,
                      id_col: str = "video_id",
                      payload_col: str = "bytes") -> DataFrame:
    """Decode AVI or MP4 payloads and emit per-sampled-frame pixel stats:
    the GDAL 16-bit checksum of the luma-free band-0 (R) plane plus
    the all-band pixel sum — the video dual of image_stats, and the
    oracle surface proving the DIB decode is bit-exact."""
    from gdal_spark.raster.avi import decode_avi, is_avi
    from gdal_spark.raster.checksum import gdal_checksum
    from gdal_spark.raster.mp4 import decode_mp4

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            recs = []
            for _, row in pdf.iterrows():
                data = bytes(row[payload_col])
                frames, _fps = decode_avi(data) if is_avi(data) else decode_mp4(data)
                for fi in range(0, len(frames), every_n):
                    fr = frames[fi]
                    recs.append(
                        {
                            "video_id": row[id_col],
                            "frame_idx": fi,
                            "w": fr.shape[1],
                            "h": fr.shape[0],
                            "checksum": int(gdal_checksum(fr[:, :, 0])),
                            "px_sum": int(fr.sum(dtype=np.int64)),
                        }
                    )
            yield pd.DataFrame(
                recs, columns=[f.name for f in VIDEO_FRAME_STATS_SCHEMA]
            )

    return videos.select(
        F.col(id_col).alias("video_id"), F.col(payload_col)
    ).mapInPandas(stats, VIDEO_FRAME_STATS_SCHEMA)


# ---------------------------------------------------------------------------
# perceptual-hash near-duplicate pairs (image-payload dedup)
# ---------------------------------------------------------------------------

PHASH_BANDS = 4  # 4 x 16-bit bands: pigeonhole-exact for hamming <= 3


def phash_pairs(images: DataFrame, max_dist: int = 3,
                id_col: str = "image_id", phash_col: str = "phash") -> DataFrame:
    """Near-duplicate IMAGE pairs by 64-bit perceptual hash: the
    BASELINE images table carries `phash` (8x8-DCT aHash, re-verified
    after decode), and pairs at hamming distance <= 3 surface through
    the same 4x16-bit band equi-join discipline as the 64-bit text
    SimHash (any <= 3-bit difference leaves one band intact) — never
    an all-pairs comparison. -> (id_a, id_b, hdist)."""
    parts = []
    for b in range(PHASH_BANDS):
        parts.append(
            images.select(
                F.col(id_col).alias("pid"), F.col(phash_col).alias("ph"),
                F.lit(b).alias("band"),
                F.expr(f"(cast({phash_col} as bigint) >> {16 * b}) & 65535").alias("bucket"),
            )
        )
    buckets = parts[0]
    for p in parts[1:]:
        buckets = buckets.unionByName(p)
    a = buckets.alias("a")
    b2 = buckets.alias("b")
    return (
        a.join(
            b2,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.pid") < F.col("b.pid")),
        )
        .select(
            F.col("a.pid").alias("id_a"),
            F.col("b.pid").alias("id_b"),
            F.expr("bit_count(a.ph ^ b.ph)").cast("int").alias("hdist"),
        )
        .where(F.col("hdist") <= max_dist)
        .dropDuplicates(["id_a", "id_b"])
    )


# ---------------------------------------------------------------------------
# Block SSIM (image quality / near-dup verification metric)
# ---------------------------------------------------------------------------

SSIM_C1 = (0.01 * 255.0) ** 2   # Wang et al. 2004 constants, L=255
SSIM_C2 = (0.03 * 255.0) ** 2
SSIM_BLOCK = 8

IMAGE_SSIM_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType()),
        T.StructField("n_blocks", T.LongType()),
        T.StructField("mssim_e6", T.LongType()),
    ]
)


def block_ssim_e6(a: np.ndarray, b: np.ndarray,
                  block: int = SSIM_BLOCK) -> tuple[int, int]:
    """Mean SSIM (x1e6, floored) over NON-OVERLAPPING uniform block
    windows with population statistics — the SQL-mirrorable variant
    of Wang et al. 2004 (the original uses an 11x11 Gaussian window;
    the uniform 8x8 form is the classic block-SSIM used for fast
    quality screens).  Both images crop to whole blocks.

    Determinism contract: per-block stats are EXACT integer sums;
    the float evaluation tree below is reproduced token-for-token in
    the DuckDB oracle, so the doubles are bit-identical and the
    per-block floor(x*1e6) quantization can never straddle; the
    final mean is an INTEGER division over the quantized blocks
    (aggregation-order-free)."""
    h8 = (a.shape[0] // block) * block
    w8 = (a.shape[1] // block) * block
    if h8 == 0 or w8 == 0:
        return 0, 0
    n = block * block

    def blocks(x):
        x = x[:h8, :w8].astype(np.int64)
        return (
            x.reshape(h8 // block, block, w8 // block, block)
            .transpose(0, 2, 1, 3)
            .reshape(-1, n)
        )

    A, B = blocks(a), blocks(b)
    sa = A.sum(1)
    sb = B.sum(1)
    saa = (A * A).sum(1)
    sbb = (B * B).sum(1)
    sab = (A * B).sum(1)
    nd = float(n)
    mux = sa / nd
    muy = sb / nd
    sxx = saa / nd - mux * mux
    syy = sbb / nd - muy * muy
    sxy = sab / nd - mux * muy
    num = (2.0 * mux * muy + SSIM_C1) * (2.0 * sxy + SSIM_C2)
    den = (mux * mux + muy * muy + SSIM_C1) * (sxx + syy + SSIM_C2)
    q = np.floor(num / den * 1e6).astype(np.int64)
    return len(q), int(q.sum()) // len(q)


def image_ssim(images: DataFrame, band_a: int = 0,
               band_b: int = 1) -> DataFrame:
    """Per-image block SSIM between two decoded bands — the quality
    screen a multimodal dedup pipeline runs on candidate image pairs
    (here the two phase-shifted bands of one payload, so the oracle
    has a closed pixel form).  Narrow mapInPandas over the payload:
    no pixel ever shuffles."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            recs = []
            for iid, data, fmt in zip(
                pdf["image_id"], pdf["bytes"], pdf["fmt"]
            ):
                arr = decode_image(bytes(data), str(fmt))
                if arr.ndim == 2:
                    arr = arr[:, :, None]
                nb, ms = block_ssim_e6(
                    arr[:, :, band_a], arr[:, :, band_b]
                )
                recs.append({"image_id": str(iid), "n_blocks": nb,
                             "mssim_e6": ms})
            yield pd.DataFrame(
                recs, columns=[f.name for f in IMAGE_SSIM_SCHEMA]
            )

    return images.select("image_id", "bytes", "fmt").mapInPandas(
        run, IMAGE_SSIM_SCHEMA
    )
