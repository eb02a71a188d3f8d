"""`gdal raster pipeline` — the unified step-chain CLI grammar
(apps/gdalalg_raster_pipeline.cpp, apps/gdalalg_abstract_pipeline.h):
`read ! step [args] ! ... ! write`, steps separated by `!`.

The reference chains GDALAlgorithm steps over an in-memory dataset;
here each step compiles to a numpy kernel over the decoded (h, w, c)
array and the WHOLE chain runs fused inside ONE mapInPandas pass —
decode once, apply every step, emit per-band stats.  That is the
Spark-first translation of the reference's step pipeline: a narrow
map with operator fusion, no shuffle, no intermediate materialisation
(the reference writes a dataset between CLI invocations unless
piped; we never do).

Step registry (names and argument spellings follow the reference's
gdalalg_raster_* step declarations):

- `read` — placeholder; input is the images DataFrame.
- `clip --srcwin x,y,w,h` (gdalalg_raster_clip.cpp pixel window,
  clipped to the image like gdal_translate -srcwin).
- `select --band b1,b2,...` (1-based, gdalalg_raster_select.cpp).
- `calc --expr "A*3+B"` (gdalalg_raster_calc.cpp; the whitelisted-
  AST interpreter from operators/calc.py, bands bound A/B/C).
- `scale --src-min --src-max [--dst-min --dst-max]`
  (gdalalg_raster_scale.cpp; GDAL +0.5-floor-clamp byte rounding).
- `unscale [--scale S --offset O]` (gdalalg_raster_unscale.cpp via
  gdal_translate -unscale: value*scale+offset, float output; the
  reference reads S/O from band metadata, the catalog passes them
  as arguments).
- `set-type --datatype Byte|UInt16|Int16|Int32|Float64`
  (gdalalg_raster_set_type.cpp; integer targets use GDALCopyWords
  rounding: floor(v + 0.5) clamped).
- `reclassify --mapping "..."` (gdalalg_raster_reclassify.cpp
  grammar via raster/reclassify.py, band 0).
- `slope|aspect|tpi|tri|roughness|hillshade [--azimuth A]
  [--altitude H] [--zfactor Z]` (gdalalg_raster_{slope,...}.cpp;
  single-band, edge-replicated padding = --compute-edges on).
- `color-map` (gdalalg_raster_color_map.cpp default relief ramp).
- `write` — terminal; emits (image_id, band, out_w, out_h,
  checksum, vsum) rows per output band (the engine's stats sink —
  file/tile sinks are operators/render.py + operators/layout.py).
"""

from __future__ import annotations

import shlex
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from gdal_spark.operators.calc import compile_calc
from gdal_spark.operators.translate import scale_to_byte
from gdal_spark.raster import dem
from gdal_spark.raster.checksum import gdal_checksum
from gdal_spark.raster.codecs import decode_image
from gdal_spark.raster.reclassify import parse_mapping

PIPE_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType()),
        T.StructField("band", T.IntegerType()),
        T.StructField("out_w", T.IntegerType()),
        T.StructField("out_h", T.IntegerType()),
        T.StructField("checksum", T.IntegerType()),
        T.StructField("vsum", T.LongType()),
    ]
)

_INT_TYPES = {
    "byte": (np.uint8, 0, 255),
    "uint16": (np.uint16, 0, 65535),
    "int16": (np.int16, -32768, 32767),
    "int32": (np.int32, -(2**31), 2**31 - 1),
}

_DEM_STEPS = ("slope", "aspect", "tpi", "tri", "roughness", "hillshade")


def parse_pipeline(text: str) -> list[tuple[str, dict]]:
    """'read ! clip --srcwin 1,2,3,4 ! write' -> [(name, args), ...].

    Arguments accept both `--key value` and `--key=value`; one
    positional value is allowed as shorthand for the step's primary
    argument (e.g. `set-type Byte`)."""
    steps = []
    for chunk in text.split("!"):
        toks = shlex.split(chunk.strip())
        if not toks:
            raise ValueError("raster pipeline: empty step")
        name, args, k = toks[0].lower(), {}, 1
        while k < len(toks):
            t = toks[k]
            if t.startswith("--"):
                if "=" in t:
                    key, _, val = t[2:].partition("=")
                    args[key.replace("-", "_")] = val
                    k += 1
                else:
                    if k + 1 >= len(toks):
                        raise ValueError(
                            f"raster pipeline: {t} missing a value"
                        )
                    args[t[2:].replace("-", "_")] = toks[k + 1]
                    k += 2
            else:
                args.setdefault("_positional", t)
                k += 1
        steps.append((name, args))
    if not steps or steps[0][0] != "read" or steps[-1][0] != "write":
        raise ValueError(
            "raster pipeline: must start with 'read' and end with 'write'"
        )
    return steps


def _compile_step(name: str, args: dict):
    """-> kernel(arr: (h, w, c) float64) -> (h, w, c') float64."""
    if name == "clip":
        x, y, w, h = (int(v) for v in args["srcwin"].split(","))

        def k_clip(arr):
            return arr[y : y + h, x : x + w]

        return k_clip
    if name == "select":
        bands = [int(b) - 1 for b in args["band"].split(",")]

        def k_select(arr):
            return arr[:, :, bands]

        return k_select
    if name == "calc":
        fn = compile_calc(args.get("expr") or args["_positional"])

        def k_calc(arr):
            bands = {
                "A": arr[:, :, 0],
                "B": arr[:, :, min(1, arr.shape[2] - 1)],
                "C": arr[:, :, min(2, arr.shape[2] - 1)],
            }
            return fn(bands).astype(np.float64)[:, :, None]

        return k_calc
    if name == "scale":
        smin = float(args["src_min"])
        smax = float(args["src_max"])
        dmin = float(args.get("dst_min", 0.0))
        dmax = float(args.get("dst_max", 255.0))

        def k_scale(arr):
            out = np.empty(arr.shape, dtype=np.float64)
            for c in range(arr.shape[2]):
                out[:, :, c] = scale_to_byte(arr[:, :, c], smin, smax,
                                             dmin, dmax)
            return out

        return k_scale
    if name == "unscale":
        # gdalalg_raster_unscale.cpp (delegates to gdal_translate
        # -unscale): value * scale + offset, float output.  Band
        # scale/offset come from dataset metadata in the reference
        # (GetScale/GetOffset); our parquet catalog carries them as
        # step arguments.
        sc = float(args.get("scale", 1.0))
        off = float(args.get("offset", 0.0))

        def k_unscale(arr):
            return arr * sc + off

        return k_unscale
    if name == "set-type":
        dtype = (args.get("datatype") or args["_positional"]).lower()
        if dtype in _INT_TYPES:
            np_t, lo, hi = _INT_TYPES[dtype]

            def k_cast(arr):
                return np.clip(np.floor(arr + 0.5), lo, hi).astype(
                    np_t
                ).astype(np.float64)

            return k_cast
        if dtype in ("float32", "float64"):
            return lambda arr: arr.astype(np.float64)
        raise ValueError(f"raster pipeline: set-type {dtype!r}")
    if name == "reclassify":
        rc = parse_mapping(args["mapping"],
                           nodata=float(args["nodata"])
                           if "nodata" in args else None)

        def k_reclass(arr):
            return rc.apply(arr[:, :, 0]).astype(np.float64)[:, :, None]

        return k_reclass
    if name in _DEM_STEPS:
        kw = {}
        if name == "hillshade":
            if "azimuth" in args:
                kw["azimuth_deg"] = float(args["azimuth"])
            if "altitude" in args:
                kw["altitude_deg"] = float(args["altitude"])
            if "zfactor" in args:
                kw["z_factor"] = float(args["zfactor"])
        kern = dem.KERNELS[name]

        def k_dem(arr):
            if arr.shape[2] != 1:
                raise ValueError(
                    f"raster pipeline: {name} needs a single band "
                    f"(got {arr.shape[2]}; insert 'select')"
                )
            padded = np.pad(arr[:, :, 0], 1, mode="edge")
            return kern(padded, **kw).astype(np.float64)[:, :, None]

        return k_dem
    if name == "color-map":
        def k_cmap(arr):
            return dem.color_relief(arr[:, :, 0]).astype(np.float64)

        return k_cmap
    raise ValueError(f"raster pipeline: unknown step {name!r}")


def run_raster_pipeline(images: DataFrame, pipeline: str) -> DataFrame:
    """Execute the step chain fused in one narrow mapInPandas pass;
    -> PIPE_SCHEMA rows per output band."""
    steps = parse_pipeline(pipeline)
    kernels = [_compile_step(n, a) for n, a in steps[1:-1]]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            recs = []
            for image_id, fmt, data in zip(
                pdf["image_id"], pdf["fmt"], pdf["bytes"]
            ):
                arr = decode_image(bytes(data), fmt).astype(np.float64)
                if arr.ndim == 2:
                    arr = arr[:, :, None]
                for k in kernels:
                    arr = k(arr)
                h, w, c = arr.shape
                ints = arr.astype(np.int64)
                for b in range(c):
                    recs.append(
                        {
                            "image_id": image_id,
                            "band": b,
                            "out_w": w,
                            "out_h": h,
                            "checksum": int(gdal_checksum(ints[:, :, b])),
                            "vsum": int(ints[:, :, b].sum(dtype=np.int64)),
                        }
                    )
            yield pd.DataFrame(recs, columns=[f.name for f in PIPE_SCHEMA])

    return images.select("image_id", "fmt", "bytes").mapInPandas(
        run, PIPE_SCHEMA
    )
