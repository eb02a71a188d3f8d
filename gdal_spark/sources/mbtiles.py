"""MBTiles raster tile archive source/sink via stdlib sqlite3.

A REAL raster tile format of the reference (frmts/mbtiles/
mbtilesdataset.cpp): sqlite database with

    metadata(name TEXT, value TEXT)        -- name/format required
    tiles(zoom_level, tile_column, tile_row, tile_data BLOB)

where tile_row is TMS (south-up): row = 2^z - 1 - y for XYZ y
(mbtilesdataset.cpp tile fetch computes the same flip; also
apps/gdalalg_raster_tile.cpp:348-352 convention handling). The
reference driver requires the `format` metadata to dispatch the tile
codec (png/jpg/webp) — all three of which this repo decodes natively
(raster/codecs.py).

Scale shape mirrors the GPKG source: sqlite is single-writer, so the
sink funnels through the driver but STREAMS `df.toLocalIterator()`
in bounded insert batches (driver memory O(one partition + batch));
reads run distributed as rowid-range-partitioned read-only scans —
a billion-tile archive splits into n_partitions independent tasks.
"""

from __future__ import annotations

import os
import sqlite3

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from gdal_spark.tiles import tilemath as tm

__all__ = ["write_mbtiles", "read_mbtiles", "read_mbtiles_metadata"]

_BATCH = 10_000


def write_mbtiles(
    df: DataFrame,
    path: str,
    name: str = "gdal_spark",
    fmt: str = "png",
    tile_type: str = "baselayer",
    description: str = "",
) -> None:
    """Stream (tile_z, tile_x, tile_y XYZ, payload) rows into an
    MBTiles archive. Computes minzoom/maxzoom and the WGS84 `bounds`
    metadata from the tiles actually written (the reference driver
    reads these to size the dataset)."""
    if fmt not in ("png", "jpg", "jpeg", "webp"):
        raise ValueError(f"unsupported MBTiles format: {fmt}")
    if os.path.exists(path):
        os.remove(path)
    con = sqlite3.connect(path)
    cur = con.cursor()
    cur.execute("CREATE TABLE metadata (name TEXT, value TEXT)")
    cur.execute(
        "CREATE TABLE tiles (zoom_level INTEGER, tile_column INTEGER,"
        " tile_row INTEGER, tile_data BLOB)"
    )
    cur.execute(
        "CREATE UNIQUE INDEX tile_index ON tiles"
        " (zoom_level, tile_column, tile_row)"
    )
    zmin = zmax = None
    w = s = e = n = None
    batch: list[tuple] = []
    for r in df.toLocalIterator():
        z, x, y = int(r["tile_z"]), int(r["tile_x"]), int(r["tile_y"])
        row = (1 << z) - 1 - y  # XYZ -> TMS south-up
        batch.append((z, x, row, bytes(r["payload"])))
        zmin = z if zmin is None else min(zmin, z)
        zmax = z if zmax is None else max(zmax, z)
        lw, ls, le, ln = tm.tile_bounds_deg(z, x, y)
        w = lw if w is None else min(w, lw)
        s = ls if s is None else min(s, ls)
        e = le if e is None else max(e, le)
        n = ln if n is None else max(n, ln)
        if len(batch) >= _BATCH:
            cur.executemany("INSERT INTO tiles VALUES (?,?,?,?)", batch)
            batch.clear()
    if batch:
        cur.executemany("INSERT INTO tiles VALUES (?,?,?,?)", batch)
    meta = [
        ("name", name),
        ("type", tile_type),
        ("version", "1.1"),
        ("description", description or name),
        ("format", "jpg" if fmt == "jpeg" else fmt),
    ]
    if zmin is not None:
        meta += [
            ("minzoom", str(zmin)),
            ("maxzoom", str(zmax)),
            ("bounds", f"{w:.10f},{s:.10f},{e:.10f},{n:.10f}"),
        ]
    cur.executemany("INSERT INTO metadata VALUES (?,?)", meta)
    con.commit()
    con.close()


def read_mbtiles_metadata(path: str) -> dict[str, str]:
    con = sqlite3.connect(f"file:{path}?mode=ro", uri=True)
    rows = con.execute("SELECT name, value FROM metadata").fetchall()
    con.close()
    return dict(rows)


_READ_SCHEMA = T.StructType(
    [
        T.StructField("tile_z", T.IntegerType()),
        T.StructField("tile_x", T.IntegerType()),
        T.StructField("tile_y", T.IntegerType()),
        T.StructField("payload", T.BinaryType()),
    ]
)


def read_mbtiles(
    spark: SparkSession, path: str, n_partitions: int = 8
) -> DataFrame:
    """Distributed MBTiles scan: rowid-range-partitioned read-only
    sqlite reads; tile_row flipped back from TMS to XYZ tile_y."""
    con = sqlite3.connect(f"file:{path}?mode=ro", uri=True)
    lo, hi = con.execute("SELECT min(rowid), max(rowid) FROM tiles").fetchone()
    con.close()
    if lo is None:
        return spark.createDataFrame([], _READ_SCHEMA)
    step = max(1, (hi - lo + 1) // n_partitions + 1)
    ranges = [
        (lo + i * step, min(hi, lo + (i + 1) * step - 1))
        for i in range(n_partitions)
        if lo + i * step <= hi
    ]
    rdf = spark.createDataFrame(ranges, "r0 long, r1 long")

    def scan(batches):
        for pdf in batches:
            recs = []
            for r0, r1 in zip(pdf["r0"], pdf["r1"]):
                c = sqlite3.connect(f"file:{path}?mode=ro", uri=True)
                rows = c.execute(
                    "SELECT zoom_level, tile_column, tile_row, tile_data"
                    " FROM tiles WHERE rowid BETWEEN ? AND ?",
                    (int(r0), int(r1)),
                ).fetchall()
                c.close()
                for z, x, row, blob in rows:
                    recs.append(
                        {
                            "tile_z": int(z),
                            "tile_x": int(x),
                            "tile_y": (1 << int(z)) - 1 - int(row),
                            "payload": bytes(blob),
                        }
                    )
            yield pd.DataFrame(
                recs, columns=["tile_z", "tile_x", "tile_y", "payload"]
            )

    return rdf.mapInPandas(scan, _READ_SCHEMA)
