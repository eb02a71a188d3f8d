"""gdalcompare dual: per-band golden-vs-new raster comparison report.

Semantics re-derived from the reference utility
(/root/reference/swig/python/gdal-utils/osgeo_utils/gdalcompare.py):

- compare_band (:128-199): a band-size mismatch, a pixel-type
  mismatch and a checksum difference each count one found_diff;
  pixel-level comparison (count of differing pixels + maximum
  absolute difference, :79-123) runs ONLY when the checksum differs
  and no earlier diff fired (:186-189 ``if found_diff == 0``).
- compare_db (:281-) walks bands pairwise; a band-count mismatch is
  its own diff.  This relational rendering emits one row per
  (image, band) over the union of band indexes, with band_missing
  marking a band absent on one side (the row then carries no pixel
  comparison, like the reference which cannot open the band).

Nodata / color-interpretation / metadata comparisons of the
reference don't exist in this engine's decode contract (plain
interleaved arrays) and are intentionally out of scope.

Scale shape: ONE image_id equi-join; decode + compare run inside a
single mapInPandas pass (Arrow batches, per-image numpy kernels); the
output is per-(image, band) metadata — no pixel ever shuffles.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["compare_rasters"]

_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType()),
        T.StructField("band", T.IntegerType()),
        T.StructField("band_missing", T.IntegerType()),
        T.StructField("size_diff", T.IntegerType()),
        T.StructField("dtype_diff", T.IntegerType()),
        T.StructField("checksum_golden", T.IntegerType()),
        T.StructField("checksum_new", T.IntegerType()),
        T.StructField("pixels_differing", T.LongType()),
        T.StructField("max_pixel_diff", T.LongType()),
        T.StructField("found_diff", T.IntegerType()),
    ]
)


def compare_rasters(golden: DataFrame, new: DataFrame,
                    key: str = "image_id") -> DataFrame:
    """(key, bytes, fmt) x2 -> per-(key, band) comparison rows."""
    g = golden.select(F.col(key).alias("image_id"),
                      F.col("bytes").alias("gb"),
                      F.col("fmt").alias("gf"))
    n = new.select(F.col(key).alias("image_id"),
                   F.col("bytes").alias("nb"),
                   F.col("fmt").alias("nf"))
    joined = g.join(n, "image_id")

    def run(batches):
        import numpy as np

        from gdal_spark.raster.checksum import gdal_checksum
        from gdal_spark.raster.codecs import decode_image

        for pdf in batches:
            recs = []
            for iid, gb, gf, nb, nf in zip(
                pdf["image_id"], pdf["gb"], pdf["gf"], pdf["nb"], pdf["nf"]
            ):
                ga = decode_image(bytes(gb), str(gf))
                na = decode_image(bytes(nb), str(nf))
                if ga.ndim == 2:
                    ga = ga[:, :, None]
                if na.ndim == 2:
                    na = na[:, :, None]
                for b in range(max(ga.shape[2], na.shape[2])):
                    rec = {"image_id": str(iid), "band": b,
                           "band_missing": 0, "size_diff": 0,
                           "dtype_diff": 0, "checksum_golden": -1,
                           "checksum_new": -1, "pixels_differing": 0,
                           "max_pixel_diff": 0, "found_diff": 0}
                    if b >= ga.shape[2] or b >= na.shape[2]:
                        rec["band_missing"] = 1
                        rec["found_diff"] = 1
                        recs.append(rec)
                        continue
                    gband, nband = ga[:, :, b], na[:, :, b]
                    fd = 0
                    if gband.shape != nband.shape:
                        rec["size_diff"] = 1
                        fd += 1
                    if gband.dtype != nband.dtype:
                        rec["dtype_diff"] = 1
                        fd += 1
                    cg = gdal_checksum(gband)
                    cn = gdal_checksum(nband)
                    rec["checksum_golden"] = cg
                    rec["checksum_new"] = cn
                    if cg != cn:
                        # gdalcompare.py:186-189 — pixel compare only
                        # on checksum diff with no earlier diff
                        if fd == 0:
                            d = np.abs(
                                gband.astype(np.int64)
                                - nband.astype(np.int64)
                            )
                            rec["pixels_differing"] = int((d != 0).sum())
                            rec["max_pixel_diff"] = int(d.max())
                        fd += 1
                    rec["found_diff"] = fd
                    recs.append(rec)
            yield pd.DataFrame(recs, columns=[f.name for f in _SCHEMA])

    return joined.mapInPandas(run, _SCHEMA)
