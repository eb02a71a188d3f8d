"""Zarr v2 chunked N-D array source/sink for the multidim model.

Wire format re-derived from the reference's Zarr driver
(/root/reference/frmts/zarr/zarr_v2_array.cpp):

- `.zarray` JSON: zarr_format=2, shape, chunks (:167), dtype
  (NumPy typestr, e.g. "<i4"), compressor (null or {"id","level"}),
  fill_value (:187-230, null allowed with a warning :1679-1681),
  order "C"/"F" (:241), optional dimension_separator (default ".",
  :254,:1640);
- chunk objects named by their grid indices joined with the
  separator ("0.0.1"); EVERY stored chunk is full-size — edge chunks
  are padded with fill_value (the v2 model);
- zlib compressor (zarr id "zlib"; the driver's compressor registry,
  zarr_compressors.cpp) — stdlib `zlib` here, no external deps.

Spark mapping: a Zarr array IS a partitioned dataset of chunk
objects.  The sink assigns each long-format row to its chunk key and
materializes chunks with ONE groupBy (each task writes only its own
chunk files); the source lists chunk files as a `binaryFile` scan —
one Spark task per chunk — and explodes to the long format, dropping
edge padding.  Only `.zarray` (a few hundred bytes) ever touches the
driver.  Like every Spark file sink, the distributed write assumes
executors share the output filesystem (HDFS/S3/NFS; local-mode
threads trivially do).
"""

from __future__ import annotations

import json
import os
import zlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from gdal_spark.operators.multidim import MDArray

_DTYPES = {
    "<i4": ("int", np.dtype("<i4")),
    "<i8": ("long", np.dtype("<i8")),
    "<f4": ("float", np.dtype("<f4")),
    "<f8": ("double", np.dtype("<f8")),
}


def write_zarr(
    md: MDArray,
    out_dir: str,
    chunks: tuple[int, ...],
    dtype: str = "<i4",
    fill_value: float = 0,
    compress_level: int = 1,
) -> None:
    if len(chunks) != md.ndim:
        raise ValueError("chunks rank must match array rank")
    os.makedirs(out_dir, exist_ok=True)
    meta = {
        "zarr_format": 2,
        "shape": list(md.shape),
        "chunks": list(chunks),
        "dtype": dtype,
        "compressor": {"id": "zlib", "level": compress_level},
        "fill_value": fill_value,
        "order": "C",
        "filters": None,
        "dimension_separator": ".",
    }
    tmp = os.path.join(out_dir, ".zarray.tmp")
    with open(tmp, "w") as fh:
        json.dump(meta, fh, indent=2)
    os.replace(tmp, os.path.join(out_dir, ".zarray"))
    # xarray-convention dimension names (the reference reads these)
    tmp = os.path.join(out_dir, ".zattrs.tmp")
    with open(tmp, "w") as fh:
        json.dump({"_ARRAY_DIMENSIONS": md.index_cols()}, fh)
    os.replace(tmp, os.path.join(out_dir, ".zattrs"))

    dims = md.index_cols()
    value_col = md.value_col  # plain locals only below — the closure
    np_dtype = _DTYPES[dtype][1]  # must not capture md (df/SparkContext)
    df = md.df
    ckey = [
        # integer floor-div keeps chunk keys exact at any index
        # magnitude (float division drifts past 2^53)
        F.expr(f"{d} div {int(c)}").alias(f"_c{i}")
        for i, (d, c) in enumerate(zip(dims, chunks))
    ]
    keyed = df.select(*ckey, *dims, value_col)
    key_names = [f"_c{i}" for i in range(md.ndim)]

    def write_chunk(key, pdf: pd.DataFrame) -> pd.DataFrame:
        arr = np.full(chunks, fill_value, dtype=np_dtype)
        offs = [int(k) * c for k, c in zip(key, chunks)]
        idx = tuple(
            pdf[d].to_numpy(np.int64) - o for d, o in zip(dims, offs)
        )
        arr[idx] = pdf[value_col].to_numpy()
        payload = zlib.compress(arr.tobytes(order="C"), compress_level)
        name = ".".join(str(int(k)) for k in key)
        tmp2 = os.path.join(out_dir, f".{name}.tmp{os.getpid()}")
        with open(tmp2, "wb") as fh:
            fh.write(payload)
        os.replace(tmp2, os.path.join(out_dir, name))
        return pd.DataFrame([{"n": len(pdf)}])

    (
        keyed.groupBy(*key_names)
        .applyInPandas(write_chunk, "n long")
        .agg(F.sum("n"))
        .first()  # scalar action driving the distributed write
    )


def read_zarr(spark: SparkSession, path: str) -> MDArray:
    """-> MDArray over a distributed chunk scan.  Dimension names are
    d0..dN-1 (Zarr v2 stores no names; .zattrs _ARRAY_DIMENSIONS is
    honored when present, the xarray convention the reference also
    reads)."""
    with open(os.path.join(path, ".zarray")) as fh:
        meta = json.load(fh)
    if meta.get("zarr_format") != 2:
        raise ValueError("only zarr_format 2 supported")
    if meta.get("order", "C") != "C":
        raise ValueError("only C order supported")
    comp = meta.get("compressor")
    if comp is not None and comp.get("id") != "zlib":
        raise ValueError(f"unsupported compressor {comp!r}")
    shape = [int(s) for s in meta["shape"]]
    chunks = [int(c) for c in meta["chunks"]]
    sep = meta.get("dimension_separator", ".")
    if sep != ".":
        raise ValueError(
            "only '.'-separated chunk names supported ('/' nests "
            "chunks in subdirectories — use a recursive listing)"
        )
    dtype = meta["dtype"]
    if dtype not in _DTYPES:
        raise ValueError(f"unsupported dtype {dtype!r}")
    spark_t, np_dtype = _DTYPES[dtype]
    names = [f"d{i}" for i in range(len(shape))]
    zattrs = os.path.join(path, ".zattrs")
    if os.path.exists(zattrs):
        attrs = json.load(open(zattrs))
        ad = attrs.get("_ARRAY_DIMENSIONS")
        if isinstance(ad, list) and len(ad) == len(shape):
            names = [str(a) for a in ad]

    schema = T.StructType(
        [T.StructField(n, T.LongType()) for n in names]
        + [
            T.StructField(
                "value",
                {"int": T.IntegerType(), "long": T.LongType(),
                 "float": T.FloatType(), "double": T.DoubleType()}[spark_t],
            )
        ]
    )

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for fpath, blob in zip(pdf["path"], pdf["content"]):
                base = os.path.basename(fpath)
                try:
                    cidx = [int(p) for p in base.split(sep)]
                except ValueError:
                    continue  # not a chunk object
                if len(cidx) != len(shape):
                    continue
                raw = zlib.decompress(bytes(blob)) if comp else bytes(blob)
                arr = np.frombuffer(raw, dtype=np_dtype).reshape(chunks)
                offs = [k * c for k, c in zip(cidx, chunks)]
                # drop edge padding beyond the array shape
                valid = [
                    min(c, s - o) for c, s, o in zip(chunks, shape, offs)
                ]
                sl = tuple(slice(0, v) for v in valid)
                sub = arr[sl]
                grids = np.meshgrid(
                    *[np.arange(o, o + v) for o, v in zip(offs, valid)],
                    indexing="ij",
                )
                rec = {
                    n: g.ravel() for n, g in zip(names, grids)
                }
                rec["value"] = sub.ravel()
                yield pd.DataFrame(rec)

    files = (
        spark.read.format("binaryFile")
        .load(path)
        .filter(~F.col("path").endswith(".zarray"))
        .filter(~F.col("path").endswith(".zattrs"))
        .select("path", "content")
    )
    df = files.mapInPandas(decode, schema)
    return MDArray(
        df=df,
        dims=tuple(zip(names, shape)),
        value_col="value",
        nodata=meta.get("fill_value"),
    )
