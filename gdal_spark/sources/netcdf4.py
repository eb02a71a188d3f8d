"""netCDF-4 (HDF5-backed) subset source/sink.

netCDF-4 is the HDF5 file format plus usage conventions
(/root/reference/frmts/netcdf/netcdfdataset.cpp nc4 mode;
autotest/gdrivers/netcdf_multidim.py): every dimension is an HDF5
"dimension scale" dataset carrying CLASS="DIMENSION_SCALE", a NAME
attribute, and the netCDF library's private `_Netcdf4Dimid` ordinal;
data variables reference their dimensions.

Subset here (documented, loud): dimension linkage is resolved through
`_Netcdf4Dimid` + the variable's `_Netcdf4Coordinates` int-array
attribute (which the netCDF library writes for variables whose
dimension order differs from creation order, and which we always
write).  The canonical DIMENSION_LIST attribute is a vlen of object
references living in the HDF5 global heap — vlen/reference datatypes
are outside sources/hdf5.py's classic subset, so files relying ONLY
on DIMENSION_LIST fall back to positional dimension naming
(phony_dim_N, exactly the reference's HDF5-driver fallback for
non-netCDF files).

The Spark scan/write shapes are sources/hdf5.py's (distributed chunk
scan, distributed pack + streamed compose).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import SparkSession

from gdal_spark.operators.multidim import MDArray
from gdal_spark.sources.hdf5 import describe_hdf5, read_hdf5, write_hdf5

__all__ = ["write_netcdf4", "read_netcdf4"]

_DIM_NAME_FMT = ("This is a netCDF dimension but not a netCDF "
                 "variable.{:10d}")


def write_netcdf4(
    md: MDArray,
    path: str,
    var_name: str = "data",
    dtype: str = "<i4",
    chunks: tuple | None = None,
    gzip: int = 6,
    fill_value=0,
    superblock: int = 0,
    oh_version: int = 1,
    atts: dict | None = None,
) -> None:
    """One netCDF-4 file: the variable plus one dimension-scale
    dataset per dim (pure dimensions, netCDF NAME convention)."""
    scales = []
    for i, (name, size) in enumerate(md.dims):
        scales.append((
            name,
            np.zeros(int(size), dtype="<f4"),
            {
                "CLASS": "DIMENSION_SCALE",
                "NAME": _DIM_NAME_FMT.format(int(size)),
                "_Netcdf4Dimid": i,
            },
        ))
    attrs = {"_Netcdf4Coordinates": list(range(len(md.dims)))}
    attrs.update(atts or {})
    write_hdf5(
        md, path, var_name=var_name, dtype=dtype, chunks=chunks,
        gzip=gzip, fill_value=fill_value, superblock=superblock,
        oh_version=oh_version, attrs=attrs, extra_datasets=scales,
    )


def read_netcdf4(
    spark: SparkSession,
    path: str,
    var_name: str | None = None,
) -> MDArray:
    """-> MDArray with REAL dimension names resolved through the
    dimension-scale datasets (phony_dim_N fallback otherwise)."""
    info = describe_hdf5(path)
    dsets = info["datasets"]
    dim_of_id = {}
    scale_names = set()
    for name, spec in dsets.items():
        a = spec.get("attrs", {})
        if a.get("CLASS") == "DIMENSION_SCALE":
            scale_names.add(name)
            if "_Netcdf4Dimid" in a:
                dim_of_id[int(a["_Netcdf4Dimid"])] = name
    if var_name is None:
        cands = {n: s for n, s in dsets.items() if n not in scale_names}
        if not cands:
            raise ValueError("netcdf4: no data variable found")
        var_name = max(
            cands, key=lambda n: int(np.prod(cands[n].get("shape", (0,)))))
    spec = dsets[var_name]
    rank = len(spec["shape"])
    coords = spec.get("attrs", {}).get("_Netcdf4Coordinates")
    if coords is not None:
        ids = [coords] if isinstance(coords, int) else list(coords)
        names = [dim_of_id.get(int(i), f"phony_dim_{k}")
                 for k, i in enumerate(ids)]
    else:
        names = [f"phony_dim_{k}" for k in range(rank)]
    return read_hdf5(spark, path, var_name=var_name, dim_names=names)
