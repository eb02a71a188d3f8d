"""Multidimensional (N-D) array views — the GDALMDArray surface as
long-format DataFrame algebra.

Semantics re-derived from /root/reference/gcore/gdalmultidim.cpp:
- GetView basic slicing/indexing (:5677 — NumPy basic-slicing syntax:
  integer, start:stop:step incl. negative steps, ellipsis, newaxis;
  zero-size results are an error in the GDAL model),
- Transpose(anMapNewAxisToOldAxis) (:6204 — every old axis exactly
  once, -1 inserts a new axis of size 1),
- GetUnscaled (:6634 — value*scale+offset to Float64, nodata ->
  dst nodata (we use NULL)),
- GetMask (:7483 — 1 where valid, 0 where nodata),
- GetResampled (:8522 — we implement the exact integer-decimation
  subset over the trailing two dims; general warp resampling lives in
  gdal_spark/raster/resample.py for the raster model),
- GetStatistics (gcore/gdalmultidim.cpp ComputeStatistics analog).

Representation: an N-D array is a LONG-FORMAT DataFrame with one
BIGINT index column per dimension plus a value column, wrapped with
the dimension metadata (names + sizes).  This is the Spark-idiomatic
dual of GDAL's chunked storage: a 100 TB hypercube lives as parquet
partitioned/sorted by the leading (chunk) indices, and every view
below is a NARROW map (filter + projection — no shuffle), so chained
views compose exactly like GDAL's zero-copy view stack.  Only
`resample_decimate` (groupBy on block keys) and `statistics` (global
agg) shuffle, each exactly once, with map-side partial aggregation.
"""

from __future__ import annotations

from dataclasses import dataclass, field, replace
from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class MDArray:
    """A long-format N-D array: `df` has one index column per entry of
    `dims` (same order, BIGINT, 0-based, dense) plus `value_col`."""

    df: DataFrame
    dims: tuple[tuple[str, int], ...]  # (name, size), outermost first
    value_col: str = "value"
    scale: float = 1.0
    offset: float = 0.0
    nodata: Optional[float] = None

    @property
    def ndim(self) -> int:
        return len(self.dims)

    @property
    def shape(self) -> tuple[int, ...]:
        return tuple(s for _, s in self.dims)

    def index_cols(self) -> list[str]:
        return [n for n, _ in self.dims]


# ---------------------------------------------------------------------------
# GetView slice-expression parser (gdalmultidim.cpp:5677 syntax)
# ---------------------------------------------------------------------------

_NEWAXIS = "newaxis"
_ELLIPSIS = "..."


def parse_view_expr(expr: str) -> list:
    """Parse one-or-more concatenated "[...]" groups into a flat token
    list: int, (start|None, stop|None, step|None) triples, 'newaxis',
    or '...'.  Field access (["name"]) is not supported (our values
    are scalar columns, not compound types)."""
    expr = expr.strip()
    if not expr.startswith("["):
        raise ValueError(f"view expression must start with '[': {expr!r}")
    tokens: list = []
    depth_chunks: list[str] = []
    i = 0
    while i < len(expr):
        if expr[i] != "[":
            raise ValueError(f"expected '[' at position {i} in {expr!r}")
        j = expr.index("]", i)
        depth_chunks.append(expr[i + 1 : j])
        i = j + 1
    for chunk in depth_chunks:
        for raw in chunk.split(","):
            tok = raw.strip()
            if tok == "":
                raise ValueError(f"empty token in view expression {expr!r}")
            if tok == _ELLIPSIS:
                tokens.append(_ELLIPSIS)
            elif tok == _NEWAXIS:
                tokens.append(_NEWAXIS)
            elif ":" in tok:
                parts = tok.split(":")
                if len(parts) > 3:
                    raise ValueError(f"bad slice {tok!r}")
                while len(parts) < 3:
                    parts.append("")
                start, stop, step = (
                    int(p) if p.strip() else None for p in parts
                )
                tokens.append((start, stop, step))
            else:
                tokens.append(int(tok))
    return tokens


def _expand_ellipsis(tokens: list, ndim: int) -> list:
    """Replace a single '...' with the full-slices it stands for."""
    n_ell = sum(1 for t in tokens if t is _ELLIPSIS or t == _ELLIPSIS)
    if n_ell > 1:
        raise ValueError("at most one ellipsis allowed")
    consumed = sum(
        1 for t in tokens if not (t == _ELLIPSIS or t == _NEWAXIS)
    )
    if consumed > ndim:
        raise ValueError(f"too many indices for {ndim}-D array")
    out: list = []
    for t in tokens:
        if t == _ELLIPSIS:
            out.extend([(None, None, None)] * (ndim - consumed))
        else:
            out.append(t)
    # Implicit trailing full slices (numpy behavior).
    consumed2 = sum(1 for t in out if t != _NEWAXIS)
    out.extend([(None, None, None)] * (ndim - consumed2))
    return out


def _normalize_slice(start, stop, step, n: int) -> tuple[int, int, int, int]:
    """Python slice.indices() semantics; returns (start, stop, step,
    out_size).  Zero-size views are an error (GDAL model forbids
    0-size dimensions, gdalmultidim.cpp GetView doc)."""
    s = slice(start, stop, step)
    b, e, st = s.indices(n)
    if st > 0:
        size = max(0, (e - b + st - 1) // st)
    else:
        size = max(0, (e - b + st + 1) // st)
    if size <= 0:
        raise ValueError("view would produce a zero-size dimension")
    return b, e, st, size


def get_view(md: MDArray, expr: str) -> MDArray:
    """GetView: numpy basic slicing over the long format.

    Integer index -> filter + drop the dimension; slice -> filter +
    affine reindex `new = (old - start) / step`; newaxis -> constant-0
    index column.  All narrow Column math — a chain of views is a
    chain of filters Catalyst collapses into one scan predicate (and
    pushes into parquet when the index columns are file-sort keys).
    """
    tokens = _expand_ellipsis(parse_view_expr(expr), md.ndim)
    df = md.df
    new_dims: list[tuple[str, int]] = []
    sel_exprs: list[Column] = []
    dim_iter = iter(md.dims)
    new_i = 0
    for tok in tokens:
        if tok == _NEWAXIS:
            name = f"newdim{new_i}"
            new_dims.append((name, 1))
            sel_exprs.append(F.lit(0).cast("long").alias(name))
            new_i += 1
            continue
        dname, dsize = next(dim_iter)
        col = F.col(dname)
        if isinstance(tok, int):
            idx = tok if tok >= 0 else tok + dsize
            if not (0 <= idx < dsize):
                raise ValueError(f"index {tok} out of range for {dname}")
            df = df.filter(col == F.lit(idx))
            continue  # dimension dropped
        start, stop, step = tok
        b, e, st, size = _normalize_slice(start, stop, step, dsize)
        if st == 1 and b == 0 and size == dsize:
            new_dims.append((dname, dsize))
            sel_exprs.append(col.alias(dname))
            continue
        if st > 0:
            df = df.filter(
                (col >= F.lit(b))
                & (col < F.lit(e))
                & (((col - F.lit(b)) % F.lit(st)) == 0)
            )
            # integer div: float division rounds above 2^53 indices
            newcol = F.expr(f"(`{dname}` - {b}) div {st}")
        else:
            df = df.filter(
                (col <= F.lit(b))
                & (col > F.lit(e))
                & (((F.lit(b) - col) % F.lit(-st)) == 0)
            )
            newcol = F.expr(f"({b} - `{dname}`) div {-st}")
        new_dims.append((dname, size))
        sel_exprs.append(newcol.cast("long").alias(dname))
    out = df.select(*sel_exprs, F.col(md.value_col))
    return replace(md, df=out, dims=tuple(new_dims))


# ---------------------------------------------------------------------------
# Transpose (gdalmultidim.cpp:6204)
# ---------------------------------------------------------------------------

def transpose(md: MDArray, axis_map: Sequence[int]) -> MDArray:
    """Reorder axes; -1 inserts a new axis of size 1.  Every old axis
    must appear exactly once (reference validation, :6218-6243).
    Pure projection — zero shuffle."""
    used = [False] * md.ndim
    for a in axis_map:
        if a < -1 or a >= md.ndim:
            raise ValueError("Invalid axis number")
        if a >= 0:
            if used[a]:
                raise ValueError(f"Axis {a} is repeated")
            used[a] = True
    if not all(used):
        raise ValueError("One or several original axis missing")
    sel: list[Column] = []
    new_dims: list[tuple[str, int]] = []
    n_new = 0
    for a in axis_map:
        if a == -1:
            name = f"newdim{n_new}"
            n_new += 1
            new_dims.append((name, 1))
            sel.append(F.lit(0).cast("long").alias(name))
        else:
            name, size = md.dims[a]
            new_dims.append((name, size))
            sel.append(F.col(name))
    out = md.df.select(*sel, F.col(md.value_col))
    return replace(md, df=out, dims=tuple(new_dims))


# ---------------------------------------------------------------------------
# GetUnscaled / GetMask (gdalmultidim.cpp:6634, :7483)
# ---------------------------------------------------------------------------

def get_unscaled(
    md: MDArray,
    scale: Optional[float] = None,
    offset: Optional[float] = None,
) -> MDArray:
    """value*scale+offset as Float64; nodata -> NULL (the long-format
    dual of the reference's dstNodata=NaN).  Narrow map."""
    sc = md.scale if scale is None else scale
    off = md.offset if offset is None else offset
    v = F.col(md.value_col).cast("double")
    expr = v * F.lit(float(sc)) + F.lit(float(off))
    if md.nodata is not None:
        expr = F.when(v == F.lit(float(md.nodata)), F.lit(None)).otherwise(
            expr
        )
    out = md.df.select(*md.index_cols(), expr.alias(md.value_col))
    return replace(md, df=out, scale=1.0, offset=0.0, nodata=None)


def get_mask(md: MDArray) -> MDArray:
    """Validity mask: 1 where value != nodata (and non-NULL), else 0."""
    v = F.col(md.value_col)
    valid = v.isNotNull()
    if md.nodata is not None:
        valid = valid & (v != F.lit(md.nodata))
    out = md.df.select(
        *md.index_cols(), F.when(valid, 1).otherwise(0).alias(md.value_col)
    )
    return replace(md, df=out, scale=1.0, offset=0.0, nodata=None)


# ---------------------------------------------------------------------------
# Decimated resample over the trailing 2 dims (GetResampled subset)
# ---------------------------------------------------------------------------

def resample_decimate(
    md: MDArray, fy: int, fx: int, alg: str = "average"
) -> MDArray:
    """Integer-factor decimation over the LAST TWO dims — the
    GetResampled(:8522) subset that needs no warp: each output cell
    aggregates the fy x fx input block (average / nearest / min /
    max).  'nearest' picks the block's top-left sample, matching the
    overview nearest rule for integer factors (gcore/overview.cpp).

    One groupBy shuffle on (leading dims, by, bx); partial aggregation
    is map-side, so at 100 TB the shuffle carries one row per OUTPUT
    cell, not per input sample.
    """
    if md.ndim < 2:
        raise ValueError("resample_decimate needs >= 2 dims")
    if fy < 1 or fx < 1:
        raise ValueError("factors must be >= 1")
    lead = [n for n, _ in md.dims[:-2]]
    (yname, ysize), (xname, xsize) = md.dims[-2], md.dims[-1]
    oy, ox = (ysize + fy - 1) // fy, (xsize + fx - 1) // fx
    # integer floor-div on the long index (float division is exact
    # only below 2^53 — wrong bins for hypercube indices beyond that)
    df = md.df.withColumn("_by", F.expr(f"{yname} div {fy}"))
    df = df.withColumn("_bx", F.expr(f"{xname} div {fx}"))
    v = F.col(md.value_col)
    if alg == "average":
        agg = F.avg(v)
    elif alg == "min":
        agg = F.min(v)
    elif alg == "max":
        agg = F.max(v)
    elif alg == "sum":
        agg = F.sum(v)
    elif alg == "nearest":
        agg = F.max(
            F.when(
                ((F.col(yname) % F.lit(fy)) == 0)
                & ((F.col(xname) % F.lit(fx)) == 0),
                v,
            )
        )
    else:
        raise ValueError(f"unknown alg {alg!r}")
    out = (
        df.groupBy(*lead, "_by", "_bx")
        .agg(agg.alias(md.value_col))
        .withColumnRenamed("_by", yname)
        .withColumnRenamed("_bx", xname)
        .select(*lead, yname, xname, md.value_col)
    )
    dims = md.dims[:-2] + ((yname, oy), (xname, ox))
    return replace(md, df=out, dims=dims)


# ---------------------------------------------------------------------------
# Statistics (ComputeStatistics analog)
# ---------------------------------------------------------------------------

def statistics(md: MDArray, by: Sequence[str] = ()) -> DataFrame:
    """min/max/sum/count over valid cells, optionally grouped by
    leading dims.  Exact integer outputs when the value column is
    integral (sum as BIGINT) — float-parity-safe for oracles."""
    v = F.col(md.value_col)
    valid = v.isNotNull()
    if md.nodata is not None:
        valid = valid & (v != F.lit(md.nodata))
    df = md.df.filter(valid)
    aggs = [
        F.min(v).alias("vmin"),
        F.max(v).alias("vmax"),
        F.sum(v).alias("vsum"),
        F.count(v).alias("n"),
    ]
    if by:
        return df.groupBy(*by).agg(*aggs)
    return df.agg(*aggs)


def mdim_info(md: MDArray) -> DataFrame:
    """gdalmdiminfo-style report (apps/gdalalg_mdim_info.cpp /
    apps/gdalmdiminfo_lib.cpp): one row per dimension carrying the
    structural metadata (index, name, size) alongside the array-wide
    statistics — min / max / exact milli-mean / valid count, nodata
    excluded.  The dims table is metadata-sized; stats come from ONE
    distributed aggregation cross-joined in (broadcast of one row)."""
    from pyspark.sql import functions as F

    spark = md.df.sparkSession
    dims = spark.createDataFrame(
        [(i, n, s) for i, (n, s) in enumerate(md.dims)],
        "dim_idx int, dim_name string, dim_size long",
    )
    v = F.col(md.value_col).cast("long")
    valid = md.df
    if md.nodata is not None:
        valid = valid.where(F.col(md.value_col) != F.lit(md.nodata))
    agg = valid.agg(
        F.min(v).alias("vmin"),
        F.max(v).alias("vmax"),
        F.sum(v).alias("vsum"),
        F.count(F.lit(1)).alias("n_valid"),
    ).select(
        "vmin", "vmax",
        F.expr(
            "(1000 * vsum - pmod(1000 * vsum, n_valid)) div n_valid"
        ).alias("vmean_milli"),
        "n_valid",
    )
    return dims.crossJoin(agg).select(
        "dim_idx", "dim_name", "dim_size",
        "vmin", "vmax", "vmean_milli", "n_valid",
    )
