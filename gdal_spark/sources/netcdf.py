"""NetCDF classic (CDF-1 / CDF-2) N-D array source/sink for the
multidim model.

Wire format re-derived from the reference's netCDF driver semantics
(/root/reference/frmts/netcdf/netcdfdataset.cpp format handling;
multidim behavior /root/reference/autotest/gdrivers/netcdf_multidim.py)
against the public classic-format spec (the format is pure big-endian
XDR structs — no library needed):

- magic 'CDF' + version (\\x01 = 32-bit offsets, \\x02 = 64-bit),
  numrecs, then three tagged lists: NC_DIMENSION(0x0A),
  gatt NC_ATTRIBUTE(0x0C), NC_VARIABLE(0x0B); an absent list is
  (0, 0).  Names are int32 length + bytes padded to 4.
- dims: name + int32 length, 0 marking THE record dimension.
- vars: name, ndims, dimids, vatt list, nc_type, vsize, begin
  (int32 in CDF-1, int64 in CDF-2).
- fixed-size variables are one contiguous big-endian row-major block
  at `begin`; record variables store one record's slab per variable
  per record, interleaved, each slab padded to 4 (single record var:
  unpadded per spec).

Spark mapping: the READ is distributed — the driver parses only the
header (a few hundred bytes), then a DataFrame of slab descriptors
(outermost-index ranges) fans out and each task opens the shared file
and reads its own byte range (the Zarr-chunk pattern with ranges
instead of objects).  The WRITE streams `toLocalIterator()` over the
row-major-sorted long format — one record/row-group buffer in memory
at a time, never a collect (the round-3 streamed single-file sink
pattern)."""

from __future__ import annotations

import os
import struct
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from gdal_spark.operators.multidim import MDArray

NC_BYTE, NC_CHAR, NC_SHORT, NC_INT, NC_FLOAT, NC_DOUBLE = 1, 2, 3, 4, 5, 6
_TAG_DIM, _TAG_VAR, _TAG_ATT = 0x0A, 0x0B, 0x0C

_NP = {
    NC_BYTE: np.dtype(">i1"),
    NC_SHORT: np.dtype(">i2"),
    NC_INT: np.dtype(">i4"),
    NC_FLOAT: np.dtype(">f4"),
    NC_DOUBLE: np.dtype(">f8"),
}
_SPARK_T = {
    NC_BYTE: T.IntegerType(),
    NC_SHORT: T.IntegerType(),
    NC_INT: T.IntegerType(),
    NC_FLOAT: T.FloatType(),
    NC_DOUBLE: T.DoubleType(),
}
_NC_OF_STR = {"int": NC_INT, "double": NC_DOUBLE, "float": NC_FLOAT,
              "short": NC_SHORT}


def _pad4(n: int) -> int:
    return (n + 3) & ~3


# ---------------------------------------------------------------------------
# header encode
# ---------------------------------------------------------------------------

def _enc_name(name: str) -> bytes:
    b = name.encode("utf-8")
    return struct.pack(">i", len(b)) + b + b"\x00" * (_pad4(len(b)) - len(b))


def _enc_att(name: str, value) -> bytes:
    if isinstance(value, str):
        b = value.encode("utf-8")
        return (
            _enc_name(name)
            + struct.pack(">ii", NC_CHAR, len(b))
            + b + b"\x00" * (_pad4(len(b)) - len(b))
        )
    if isinstance(value, float):
        return _enc_name(name) + struct.pack(">iid", NC_DOUBLE, 1, value)
    return _enc_name(name) + struct.pack(">iii", NC_INT, 1, int(value))


def _enc_att_list(atts: dict) -> bytes:
    if not atts:
        return struct.pack(">ii", 0, 0)
    out = struct.pack(">ii", _TAG_ATT, len(atts))
    for k, v in atts.items():
        out += _enc_att(k, v)
    return out


# ---------------------------------------------------------------------------
# sink
# ---------------------------------------------------------------------------

def write_netcdf(
    md: MDArray,
    path: str,
    var_name: str = "data",
    nc_type: int = NC_INT,
    version: int = 1,
    record_dim: bool = False,
    fill_value=0,
    atts: dict | None = None,
) -> None:
    """Stream the MDArray into one classic-format file.  With
    record_dim=True the outermost dimension becomes THE record
    dimension (length 0 in the dim list, count in numrecs)."""
    if version not in (1, 2):
        raise ValueError("classic netCDF is CDF-1 or CDF-2")
    if nc_type not in _NP:
        raise ValueError(f"unsupported nc_type {nc_type}")
    dims = md.dims
    shape = [s for _, s in dims]
    names = [n for n, _ in dims]
    item = _NP[nc_type].itemsize
    if record_dim:
        numrecs = shape[0]
        rec_shape = shape[1:]
        n_per_rec = int(np.prod(rec_shape)) if rec_shape else 1
        vsize = _pad4(n_per_rec * item)
    else:
        numrecs = 0
        n_per_rec = int(np.prod(shape))
        vsize = _pad4(n_per_rec * item)

    header = b"CDF" + bytes([version])
    header += struct.pack(">i", numrecs)
    # dim list
    header += struct.pack(">ii", _TAG_DIM, len(dims))
    for k, (n, s) in enumerate(dims):
        dlen = 0 if (record_dim and k == 0) else s
        header += _enc_name(n) + struct.pack(">i", dlen)
    header += _enc_att_list(dict(atts or {}))
    # var list (one variable)
    var = _enc_name(var_name)
    var += struct.pack(">i", len(dims))
    for k in range(len(dims)):
        var += struct.pack(">i", k)
    var += _enc_att_list({"_FillValue": float(fill_value)}
                         if nc_type == NC_DOUBLE else {})
    var += struct.pack(">ii", nc_type, vsize)
    begin_at = len(header) + struct.pack(">ii", _TAG_VAR, 1).__len__() + len(var)
    begin_at += 4 if version == 1 else 8
    header += struct.pack(">ii", _TAG_VAR, 1)
    header += var
    header += struct.pack(">i" if version == 1 else ">q", begin_at)

    np_dtype = _NP[nc_type]
    value_col = md.value_col
    # one "block" per outermost index: a record's slab when
    # record_dim, else one row-major slice of the contiguous block.
    # Packing is DISTRIBUTED (one applyInPandas group per block); the
    # driver only streams the packed payloads in order — never rows.
    inner_sizes = shape[1:]
    inner = int(np.prod(inner_sizes)) if inner_sizes else 1
    if inner * item % 4 != 0 and record_dim:
        raise ValueError("record slab must be 4-byte aligned "
                         "(use NC_INT/NC_FLOAT/NC_DOUBLE)")
    strides = []
    acc = 1
    for s in reversed(inner_sizes):
        strides.append(acc)
        acc *= s
    strides = list(reversed(strides))
    outer_name = names[0]
    inner_names = names[1:]
    fv = fill_value
    slab_pad = (vsize - inner * item) if record_dim else 0

    def pack(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        buf = np.full(inner, fv, dtype=np_dtype)
        lin = np.zeros(len(pdf), dtype=np.int64)
        for n, s in zip(inner_names, strides):
            lin += pdf[n].to_numpy(np.int64) * s
        buf[lin] = pdf[value_col].to_numpy()
        return pd.DataFrame(
            [{"rec": int(key[0]), "payload": buf.tobytes() + b"\x00" * slab_pad}]
        )

    packed = (
        md.df.select(*names, value_col)
        .groupBy(outer_name)
        .applyInPandas(pack, "rec long, payload binary")
        .orderBy("rec")
    )

    total_blocks = shape[0] if shape else 1
    fill_blob = (
        np.full(inner, fv, dtype=np_dtype).tobytes() + b"\x00" * slab_pad
    )
    tmp = path + f".tmp{os.getpid()}"
    with open(tmp, "wb") as fh:
        fh.write(header)
        cur = 0
        for row in packed.toLocalIterator():
            rec = int(row["rec"])
            while cur < rec:  # wholly-missing blocks become fill
                fh.write(fill_blob)
                cur += 1
            fh.write(bytes(row["payload"]))
            cur += 1
        while cur < total_blocks:
            fh.write(fill_blob)
            cur += 1
        if not record_dim:
            fh.write(b"\x00" * (vsize - total_blocks * inner * item))
    os.replace(tmp, path)


# ---------------------------------------------------------------------------
# header decode
# ---------------------------------------------------------------------------

class _Rd:
    def __init__(self, b: bytes):
        self.b, self.o = b, 0

    def i4(self) -> int:
        (v,) = struct.unpack_from(">i", self.b, self.o)
        self.o += 4
        return v

    def i8(self) -> int:
        (v,) = struct.unpack_from(">q", self.b, self.o)
        self.o += 8
        return v

    def name(self) -> str:
        n = self.i4()
        s = self.b[self.o : self.o + n].decode("utf-8")
        self.o += _pad4(n)
        return s

    def atts(self) -> dict:
        tag = self.i4()
        cnt = self.i4()
        if tag == 0 and cnt == 0:
            return {}
        if tag != _TAG_ATT:
            raise ValueError("bad attribute list tag")
        out = {}
        for _ in range(cnt):
            nm = self.name()
            t = self.i4()
            ne = self.i4()
            if t == NC_CHAR:
                raw = self.b[self.o : self.o + ne]
                self.o += _pad4(ne)
                out[nm] = raw.decode("utf-8")
            else:
                dt = _NP[t]
                raw = self.b[self.o : self.o + ne * dt.itemsize]
                self.o += _pad4(ne * dt.itemsize)
                vals = np.frombuffer(raw, dtype=dt)
                out[nm] = vals[0].item() if ne == 1 else vals.tolist()
        return out


def parse_header(blob: bytes) -> dict:
    """Parse the classic header -> {version, numrecs, dims:[(name,len)],
    gatts, vars:[{name, dimids, atts, nc_type, vsize, begin}]}."""
    if blob[:3] != b"CDF" or blob[3] not in (1, 2):
        raise ValueError("not a classic netCDF (CDF-1/CDF-2) payload")
    version = blob[3]
    r = _Rd(blob)
    r.o = 4
    numrecs = r.i4()
    tag, cnt = r.i4(), r.i4()
    dims = []
    if tag == _TAG_DIM:
        for _ in range(cnt):
            nm = r.name()
            dims.append((nm, r.i4()))
    elif (tag, cnt) != (0, 0):
        raise ValueError("bad dim list tag")
    gatts = r.atts()
    tag, cnt = r.i4(), r.i4()
    vars_ = []
    if tag == _TAG_VAR:
        for _ in range(cnt):
            nm = r.name()
            nd = r.i4()
            dimids = [r.i4() for _ in range(nd)]
            vatts = r.atts()
            nc_type = r.i4()
            vsize = r.i4()
            begin = r.i4() if version == 1 else r.i8()
            vars_.append(
                dict(name=nm, dimids=dimids, atts=vatts,
                     nc_type=nc_type, vsize=vsize, begin=begin)
            )
    elif (tag, cnt) != (0, 0):
        raise ValueError("bad var list tag")
    return dict(version=version, numrecs=numrecs, dims=dims,
                gatts=gatts, vars=vars_)


def read_netcdf(
    spark: SparkSession,
    path: str,
    var_name: str | None = None,
    slab_rows: int = 64,
) -> MDArray:
    """-> MDArray over a distributed byte-range scan: the driver reads
    only the header, then one task per outermost-index slab opens the
    shared file and reads its own range (record vars: record stride =
    sum of all record-var vsizes, per the classic spec)."""
    with open(path, "rb") as fh:
        hdr = parse_header(fh.read(65536))
    if not hdr["vars"]:
        raise ValueError("no variables")
    var = hdr["vars"][0] if var_name is None else next(
        v for v in hdr["vars"] if v["name"] == var_name
    )
    if var["nc_type"] not in _NP:
        raise ValueError(f"unsupported nc_type {var['nc_type']}")
    dims_all = hdr["dims"]
    vdims = [(dims_all[d][0], dims_all[d][1]) for d in var["dimids"]]
    is_record = bool(vdims) and vdims[0][1] == 0
    if is_record:
        vdims[0] = (vdims[0][0], hdr["numrecs"])
        rec_vars = [v for v in hdr["vars"]
                    if v["dimids"] and dims_all[v["dimids"][0]][1] == 0]
        rec_stride = (rec_vars[0]["vsize"] if len(rec_vars) == 1
                      else sum(v["vsize"] for v in rec_vars))
    names = [n for n, _ in vdims]
    shape = [s for _, s in vdims]
    np_dtype = _NP[var["nc_type"]]
    item = np_dtype.itemsize
    inner_shape = shape[1:] if shape else []
    inner = int(np.prod(inner_shape)) if inner_shape else 1
    outer = shape[0] if shape else 1
    begin = var["begin"]
    # byte offset of outermost index k
    if is_record:
        def off(k: int) -> int:
            return begin + k * rec_stride
        row_bytes = inner * item
    else:
        def off(k: int) -> int:
            return begin + k * inner * item
        row_bytes = inner * item

    schema = T.StructType(
        [T.StructField(n, T.LongType()) for n in names]
        + [T.StructField("value", _SPARK_T[var["nc_type"]])]
    )
    slabs = [(k, min(k + slab_rows, outer)) for k in range(0, outer, slab_rows)]
    sdf = spark.createDataFrame(
        [(a, b) for a, b in slabs], "lo long, hi long"
    ).repartition(max(1, len(slabs)))
    rec_like = is_record  # plain locals for the closure
    stride = rec_stride if is_record else inner * item

    def scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        with open(path, "rb") as fh2:
            for pdf in batches:
                for lo, hi in zip(pdf["lo"], pdf["hi"]):
                    lo, hi = int(lo), int(hi)
                    for k in range(lo, hi):
                        fh2.seek(begin + k * stride)
                        raw = fh2.read(row_bytes)
                        arr = np.frombuffer(raw, dtype=np_dtype)
                        grids = np.meshgrid(
                            *[np.arange(s) for s in inner_shape],
                            indexing="ij",
                        ) if inner_shape else []
                        rec = {names[0]: np.full(inner, k, dtype=np.int64)}
                        for n, g in zip(names[1:], grids):
                            rec[n] = g.ravel()
                        rec["value"] = (
                            arr.astype(np_dtype.newbyteorder("="))
                        )
                        yield pd.DataFrame(rec)

    df = sdf.mapInPandas(scan, schema)
    fill = var["atts"].get("_FillValue")
    return MDArray(df=df, dims=tuple(zip(names, shape)),
                   value_col="value", nodata=fill)
