"""`gdal raster reclassify` mapping grammar + vectorized apply.

Semantics re-derived from the reference's Reclassifier
(/root/reference/frmts/vrt/vrtreclassifier.{h,cpp}; driven by
apps/gdalalg_raster_reclassify.cpp):

- text = ';'-separated "SOURCE=DEST" mappings (.h:32-35);
- SOURCE: a constant, an interval "[a,b]" / "(a,b)" with mixed
  open/closed ends and -inf/inf bounds (.cpp:33-128), the word
  NO_DATA (substitutes the nodata value, .cpp:226), NAN, or DEFAULT;
- DEST: a constant, NO_DATA, or PASS_THROUGH (.cpp:273-297);
- open bounds are realized by nextafter toward the interior
  (.cpp:148-155) — so Contains() stays a closed-interval test;
- intervals are sorted by min and any overlap is an error
  (Finalize, .cpp:166-194);
- lookup is binary search over the sorted intervals (.cpp:340+,
  vectorized here as searchsorted); a value matching nothing takes
  DEFAULT, and with no default defined it is an ERROR (matching the
  reference's "no specified mapping" failure), never a silent
  passthrough.

Execution: `reclassify_image` is the standard per-payload Arrow
kernel (narrow map, no shuffle); `Reclassifier.apply` is pure
vectorized numpy usable on any value plane (DEM grids, mdim values).
"""

from __future__ import annotations

import math
import re
from dataclasses import dataclass
from typing import Iterator, Optional

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from gdal_spark.raster.checksum import gdal_checksum
from gdal_spark.raster.codecs import decode_image

_NUM = r"[+-]?(?:inf|[0-9]*\.?[0-9]+(?:[eE][+-]?[0-9]+)?)"


@dataclass
class Reclassifier:
    mins: np.ndarray          # sorted closed lower bounds
    maxs: np.ndarray          # closed upper bounds
    dsts: np.ndarray          # destination values (NaN where pass-through)
    passthrough: np.ndarray   # bool per interval
    default: Optional[float]  # None = no default
    default_passthrough: bool
    nan_dst: Optional[float]
    nan_passthrough: bool

    def apply(self, v: np.ndarray) -> np.ndarray:
        v = np.asarray(v, dtype=np.float64)
        out = np.empty_like(v)
        if len(self.mins):
            idx = np.searchsorted(self.mins, v, side="right") - 1
            idx_c = np.clip(idx, 0, len(self.mins) - 1)
            matched = (idx >= 0) & (v <= self.maxs[idx_c]) & ~np.isnan(v)
            dst = self.dsts[idx_c]
            pt = self.passthrough[idx_c]
            out = np.where(matched, np.where(pt, v, dst), out)
        else:
            matched = np.zeros(v.shape, dtype=bool)
        nanmask = np.isnan(v)
        if nanmask.any():
            if self.nan_dst is None and not self.nan_passthrough:
                raise ValueError("NaN encountered with no NAN mapping")
            out = np.where(
                nanmask, v if self.nan_passthrough else self.nan_dst, out
            )
        rest = ~matched & ~nanmask
        if rest.any():
            if self.default_passthrough:
                out = np.where(rest, v, out)
            elif self.default is not None:
                out = np.where(rest, self.default, out)
            else:
                bad = v[rest].flat[0]
                raise ValueError(
                    f"value {bad!r} has no specified mapping and no DEFAULT"
                )
        return out


def _parse_interval(src: str, nodata: Optional[float]):
    s = src.strip()
    if s.upper() == "NO_DATA":
        if nodata is None:
            raise ValueError("NO_DATA source used but nodata is not set")
        return (float(nodata), float(nodata))
    if s.upper() in ("NAN",):
        return "nan"
    if s.upper() == "DEFAULT":
        return "default"
    m = re.fullmatch(
        rf"([\[\(])\s*({_NUM})\s*,\s*({_NUM})\s*([\]\)])", s, re.IGNORECASE
    )
    if m:
        lo, hi = float(m.group(2)), float(m.group(3))
        if math.isnan(lo) or math.isnan(hi):
            raise ValueError("NaN is not a valid interval bound")
        if lo > hi:
            raise ValueError("lower bound must be <= upper bound")
        if m.group(1) == "(":
            lo = np.nextafter(lo, math.inf)
        if m.group(4) == ")":
            hi = np.nextafter(hi, -math.inf)
        return (lo, hi)
    m = re.fullmatch(_NUM, s, re.IGNORECASE)
    if m:
        c = float(s)
        return (c, c)
    raise ValueError(f"cannot parse interval {src!r}")


def parse_mapping(text: str, nodata: Optional[float] = None) -> Reclassifier:
    intervals: list[tuple[float, float]] = []
    dsts: list[float] = []
    pts: list[bool] = []
    default = None
    default_pt = False
    nan_dst = None
    nan_pt = False
    for part in text.split(";"):
        if not part.strip():
            continue
        if "=" not in part:
            raise ValueError(f"mapping {part!r} lacks '='")
        src, _, dst = part.partition("=")
        dst = dst.strip()
        if dst.upper() == "NO_DATA":
            if nodata is None:
                raise ValueError("NO_DATA dest used but nodata is not set")
            dval, dpt = float(nodata), False
        elif dst.upper() == "PASS_THROUGH":
            dval, dpt = math.nan, True
        else:
            if not re.fullmatch(_NUM, dst, re.IGNORECASE):
                raise ValueError(f"cannot parse destination {dst!r}")
            dval, dpt = float(dst), False
        sv = _parse_interval(src, nodata)
        if sv == "default":
            default, default_pt = (None, True) if dpt else (dval, False)
        elif sv == "nan":
            nan_dst, nan_pt = (None, True) if dpt else (dval, False)
        else:
            intervals.append(sv)
            dsts.append(dval)
            pts.append(dpt)
    order = sorted(range(len(intervals)), key=lambda k: intervals[k][0])
    mins = np.array([intervals[k][0] for k in order])
    maxs = np.array([intervals[k][1] for k in order])
    for i in range(1, len(order)):
        if mins[i] <= maxs[i - 1]:  # sorted, so overlap test is local
            raise ValueError(
                f"interval [{mins[i]},{maxs[i]}] overlaps "
                f"[{mins[i-1]},{maxs[i-1]}]"
            )
    return Reclassifier(
        mins=mins,
        maxs=maxs,
        dsts=np.array([dsts[k] for k in order]),
        passthrough=np.array([pts[k] for k in order], dtype=bool),
        default=default,
        default_passthrough=default_pt,
        nan_dst=nan_dst,
        nan_passthrough=nan_pt,
    )


RECLASS_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType()),
        T.StructField("mapping", T.StringType()),
        T.StructField("checksum", T.IntegerType()),
        T.StructField("vsum", T.LongType()),
    ]
)


def reclassify_image(
    images: DataFrame,
    mappings: dict[str, str],
    nodata: Optional[float] = None,
) -> DataFrame:
    """Apply each named mapping to band 0 of every decoded payload;
    emit the per-result GDAL checksum + value sum."""
    rcs = {name: parse_mapping(t, nodata) for name, t in mappings.items()}

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            recs = []
            for _, row in pdf.iterrows():
                arr = decode_image(bytes(row["bytes"]), row["fmt"])
                if arr.ndim == 3:
                    arr = arr[:, :, 0]
                for name, rc in rcs.items():
                    out = rc.apply(arr.astype(np.float64)).astype(np.int64)
                    recs.append(
                        {
                            "image_id": row["image_id"],
                            "mapping": name,
                            "checksum": int(gdal_checksum(out)),
                            "vsum": int(out.sum(dtype=np.int64)),
                        }
                    )
            yield pd.DataFrame(recs, columns=[f.name for f in RECLASS_SCHEMA])

    return images.select("image_id", "fmt", "bytes").mapInPandas(
        kernel, RECLASS_SCHEMA
    )
