"""GeoParquet writer/reader — parquet vector files carrying the
spec's file-level `geo` metadata, interoperable with the reference's
Parquet driver.

Metadata layout re-derived from
/root/reference/ogr/ogrsf_frmts/parquet/ogrparquetwriterlayer.cpp
(:640-760): key-value entry "geo" (:838-843) holding JSON
{version: "1.1.0", primary_column, columns: {<name>: {encoding:
"WKB", geometry_types: [...], bbox: [minx, miny, maxx, maxy],
crs ...}}}; the CRS member is OMITTED for EPSG:4326/OGC:CRS84 by
default (:672-684, OGR_PARQUET_CRS_OMIT_IF_WGS84) — our layers are
lon/lat WGS84, so omission is the spec-faithful default here too.

Distributed shape: each Spark partition writes its own
`part-<id>.parquet` via pyarrow with that file's own bbox and
geometry_types (GeoParquet metadata is per-file); reads are plain
`spark.read.parquet` for data plus ONE driver-side footer read for
the metadata (never a data scan).  Shared output filesystem assumed,
as for any Spark file sink.
"""

from __future__ import annotations

import json
import os
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gdal_spark.geo import wkb as wkbmod

_TYPE_NAMES = {
    1: "Point", 2: "LineString", 3: "Polygon",
    4: "MultiPoint", 5: "MultiLineString", 6: "MultiPolygon",
}


def _envelope(g) -> tuple[float, float, float, float]:
    xs: list[float] = []
    ys: list[float] = []
    if g.polys:
        for rings in g.polys:
            for ring in rings:
                arr = np.asarray(ring)
                xs += [arr[:, 0].min(), arr[:, 0].max()]
                ys += [arr[:, 1].min(), arr[:, 1].max()]
    for part in g.parts:
        arr = np.asarray(part)
        xs += [arr[:, 0].min(), arr[:, 0].max()]
        ys += [arr[:, 1].min(), arr[:, 1].max()]
    return min(xs), min(ys), max(xs), max(ys)


def write_geoparquet(
    df: DataFrame, out_dir: str, geom_col: str = "geometry"
) -> None:
    os.makedirs(out_dir, exist_ok=True)
    cols = [f.name for f in df.schema.fields]

    def write_part(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pyarrow as pa
        import pyarrow.parquet as pq
        from pyspark import TaskContext

        parts = list(batches)
        if not parts or all(len(p) == 0 for p in parts):
            yield pd.DataFrame({"n": []})
            return
        pdf = pd.concat(parts, ignore_index=True)
        minx = miny = float("inf")
        maxx = maxy = float("-inf")
        gtypes: set[str] = set()
        for blob in pdf[geom_col]:
            g = wkbmod.parse_wkb(bytes(blob))
            gtypes.add(_TYPE_NAMES.get(g.type_id, "Unknown"))
            x0, y0, x1, y1 = _envelope(g)
            minx, miny = min(minx, x0), min(miny, y0)
            maxx, maxy = max(maxx, x1), max(maxy, y1)
        geo = {
            "version": "1.1.0",
            "primary_column": geom_col,
            "columns": {
                geom_col: {
                    "encoding": "WKB",
                    "geometry_types": sorted(gtypes),
                    "bbox": [minx, miny, maxx, maxy],
                    # crs omitted: lon/lat WGS84 (OGC:CRS84), the
                    # spec default (writerlayer.cpp:672-684)
                }
            },
        }
        table = pa.Table.from_pandas(pdf[cols], preserve_index=False)
        table = table.replace_schema_metadata(
            {**(table.schema.metadata or {}), b"geo": json.dumps(geo)}
        )
        pid = TaskContext.get().partitionId()
        tmp = os.path.join(out_dir, f".part-{pid:05d}.parquet.tmp")
        pq.write_table(table, tmp)
        os.replace(tmp, os.path.join(out_dir, f"part-{pid:05d}.parquet"))
        yield pd.DataFrame({"n": [len(pdf)]})

    df.mapInPandas(write_part, "n long").agg(F.sum("n")).first()


def read_geoparquet(
    spark: SparkSession, path: str
) -> tuple[DataFrame, dict]:
    """-> (DataFrame, geo metadata dict from one file footer).
    Raises when the `geo` key is absent or the encoding is not WKB."""
    import pyarrow.parquet as pq

    part = sorted(
        f for f in os.listdir(path)
        if f.endswith(".parquet") and not f.startswith(".")
    )
    if not part:
        raise ValueError(f"no parquet files under {path}")
    schema = pq.read_schema(os.path.join(path, part[0]))
    md = schema.metadata or {}
    if b"geo" not in md:
        raise ValueError("missing GeoParquet 'geo' metadata")
    geo = json.loads(md[b"geo"])
    enc = geo["columns"][geo["primary_column"]]["encoding"]
    if enc != "WKB":
        raise ValueError(f"unsupported geometry encoding {enc!r}")
    return spark.read.parquet(path), geo
