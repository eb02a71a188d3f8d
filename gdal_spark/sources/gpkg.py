"""GeoPackage vector source/sink via the stdlib sqlite3 module.

A REAL OGR file format beyond (Geo)Parquet: reads and writes the
GeoPackage feature model the reference implements in
ogr/ogrsf_frmts/gpkg/ — the required metadata tables
(gpkg_spatial_ref_sys, gpkg_contents, gpkg_geometry_columns) and the
StandardGeoPackageBinary geometry blob (magic 'GP', version 0, flags
with envelope-indicator bits 3..1 and little-endian bit 0, srs_id,
optional XY envelope, then plain WKB —
ogrgeopackageutility.cpp:200-330).

Reads run distributed: each task opens the sqlite file read-only and
scans its rowid range (sqlite files are safely readable from many
processes), so a 10^9-feature GPKG splits into rowid-partitioned
scans; writes funnel through the driver (sqlite is single-writer by
design — the reference serializes writes the same way).
"""

from __future__ import annotations

import os
import sqlite3
import struct

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["write_gpkg", "read_gpkg", "gpkg_blob_to_wkb",
           "wkb_to_gpkg_blob", "write_gpkg_tiles", "read_gpkg_tiles",
           "read_gpkg_tile_matrix"]


def wkb_to_gpkg_blob(wkb: bytes, srs_id: int = 4326) -> bytes:
    """WKB -> StandardGeoPackageBinary with a 2D envelope."""
    from gdal_spark.geo.wkb import parse_wkb

    g = parse_wkb(bytes(wkb))
    xmin, ymin, xmax, ymax = g.bounds()
    flags = 0x01 | (1 << 1)  # little-endian header + XY envelope
    hdr = struct.pack("<2sBBi", b"GP", 0, flags, srs_id)
    env = struct.pack("<4d", xmin, xmax, ymin, ymax)
    return hdr + env + bytes(wkb)


def gpkg_blob_to_wkb(blob: bytes) -> bytes:
    """StandardGeoPackageBinary -> the embedded WKB."""
    b = bytes(blob)
    if b[:2] != b"GP":
        raise ValueError("not a GeoPackage geometry blob")
    flags = b[3]
    env_ind = (flags >> 1) & 0x07
    n_env = {0: 0, 1: 4, 2: 6, 3: 6, 4: 8}[env_ind]
    return b[8 + 8 * n_env :]


def write_gpkg(
    df: DataFrame,
    path: str,
    layer: str,
    geom_col: str = "geometry",
    srs_id: int = 4326,
    geometry_type: str = "GEOMETRY",
) -> None:
    """Materialize (fid, <attrs>, geometry WKB) as a GeoPackage layer
    with the required metadata tables. Attribute columns map per the
    reference's type table (long->INTEGER, double->REAL,
    string->TEXT).

    sqlite is single-writer by design, so the sink funnels through the
    driver — but it STREAMS `df.toLocalIterator()` in bounded insert
    batches (driver memory O(one Spark partition + batch), never the
    whole layer).
    """
    fields = [
        (f.name, f.dataType) for f in df.schema.fields
        if f.name not in (geom_col, "fid")
    ]

    def sql_type(dt):
        s = dt.simpleString()
        if s in ("bigint", "int", "smallint", "tinyint", "boolean"):
            return "INTEGER"
        if s in ("double", "float"):
            return "REAL"
        return "TEXT"

    if os.path.exists(path):
        os.remove(path)
    con = sqlite3.connect(path)
    cur = con.cursor()
    cur.execute("PRAGMA application_id = 1196444487")  # 'GPKG'
    cur.execute("PRAGMA user_version = 10300")         # 1.3.0
    cur.execute(
        """CREATE TABLE gpkg_spatial_ref_sys (
             srs_name TEXT NOT NULL, srs_id INTEGER PRIMARY KEY,
             organization TEXT NOT NULL, organization_coordsys_id INTEGER NOT NULL,
             definition TEXT NOT NULL, description TEXT)"""
    )
    cur.executemany(
        "INSERT INTO gpkg_spatial_ref_sys VALUES (?,?,?,?,?,?)",
        [
            ("Undefined cartesian SRS", -1, "NONE", -1, "undefined", None),
            ("Undefined geographic SRS", 0, "NONE", 0, "undefined", None),
            ("WGS 84", 4326, "EPSG", 4326, "GEOGCS[\"WGS 84\"]", None),
        ],
    )
    cur.execute(
        """CREATE TABLE gpkg_contents (
             table_name TEXT NOT NULL PRIMARY KEY, data_type TEXT NOT NULL,
             identifier TEXT UNIQUE, description TEXT DEFAULT '',
             last_change DATETIME, min_x DOUBLE, min_y DOUBLE,
             max_x DOUBLE, max_y DOUBLE, srs_id INTEGER)"""
    )
    cur.execute(
        """CREATE TABLE gpkg_geometry_columns (
             table_name TEXT NOT NULL, column_name TEXT NOT NULL,
             geometry_type_name TEXT NOT NULL, srs_id INTEGER NOT NULL,
             z TINYINT NOT NULL, m TINYINT NOT NULL,
             CONSTRAINT pk_geom_cols PRIMARY KEY (table_name, column_name))"""
    )
    attr_ddl = "".join(f", \"{n}\" {sql_type(t)}" for n, t in fields)
    cur.execute(
        f"CREATE TABLE \"{layer}\" (fid INTEGER PRIMARY KEY{attr_ddl}, \"{geom_col}\" BLOB)"
    )
    cols = ["fid"] + [n for n, _ in fields] + [geom_col]
    ph = ",".join("?" * len(cols))
    bounds = [np.inf, np.inf, -np.inf, -np.inf]
    from gdal_spark.geo.wkb import parse_wkb

    batch: list[tuple] = []
    insert_sql = f"INSERT INTO \"{layer}\" VALUES ({ph})"
    for r in df.toLocalIterator():
        wkb = bytes(r[geom_col])
        xmin, ymin, xmax, ymax = parse_wkb(wkb).bounds()
        bounds = [
            min(bounds[0], xmin), min(bounds[1], ymin),
            max(bounds[2], xmax), max(bounds[3], ymax),
        ]
        batch.append(
            tuple(r[c] for c in cols[:-1]) + (wkb_to_gpkg_blob(wkb, srs_id),)
        )
        if len(batch) >= 10_000:
            cur.executemany(insert_sql, batch)
            batch.clear()
    if batch:
        cur.executemany(insert_sql, batch)
    cur.execute(
        "INSERT INTO gpkg_contents VALUES (?,?,?,?,datetime('now'),?,?,?,?,?)",
        (layer, "features", layer, "", bounds[0], bounds[1], bounds[2],
         bounds[3], srs_id),
    )
    cur.execute(
        "INSERT INTO gpkg_geometry_columns VALUES (?,?,?,?,0,0)",
        (layer, geom_col, geometry_type, srs_id),
    )
    con.commit()
    con.close()


def read_gpkg(
    spark: SparkSession, path: str, layer: str, n_partitions: int = 8
) -> DataFrame:
    """Distributed GeoPackage scan: rowid-range partitioned sqlite
    reads, geometry blobs unwrapped to plain WKB. Schema inferred
    from the sqlite table declaration."""
    con = sqlite3.connect(path)
    cur = con.cursor()
    info = cur.execute(f"PRAGMA table_info(\"{layer}\")").fetchall()
    geom_col = cur.execute(
        "SELECT column_name FROM gpkg_geometry_columns WHERE table_name = ?",
        (layer,),
    ).fetchone()[0]
    lo, hi = cur.execute(
        f"SELECT min(rowid), max(rowid) FROM \"{layer}\""
    ).fetchone()
    con.close()
    fields = []
    names = []
    for _cid, name, decl, *_ in info:
        names.append(name)
        if name == geom_col:
            fields.append(T.StructField(name, T.BinaryType()))
        elif decl.upper().startswith("INT"):
            fields.append(T.StructField(name, T.LongType()))
        elif decl.upper() in ("REAL", "DOUBLE", "FLOAT"):
            fields.append(T.StructField(name, T.DoubleType()))
        else:
            fields.append(T.StructField(name, T.StringType()))
    schema = T.StructType(fields)
    if lo is None:
        return spark.createDataFrame([], schema)
    step = max(1, (hi - lo + 1) // n_partitions + 1)
    ranges = [(lo + i * step, min(hi, lo + (i + 1) * step - 1))
              for i in range(n_partitions) if lo + i * step <= hi]
    rdf = spark.createDataFrame(ranges, "r0 long, r1 long")
    collist = ", ".join(f'"{n}"' for n in names)

    def scan(batches):
        for pdf in batches:
            out = []
            for r0, r1 in zip(pdf["r0"], pdf["r1"]):
                c = sqlite3.connect(f"file:{path}?mode=ro", uri=True)
                rows = c.execute(
                    f"SELECT {collist} FROM \"{layer}\" "
                    f"WHERE rowid BETWEEN ? AND ?", (int(r0), int(r1))
                ).fetchall()
                c.close()
                for row in rows:
                    rec = dict(zip(names, row))
                    rec[geom_col] = gpkg_blob_to_wkb(rec[geom_col])
                    out.append(rec)
            yield pd.DataFrame(out, columns=names)

    return rdf.mapInPandas(scan, schema)


# --------------------------------------------------------------------------
# GeoPackage raster tiles (the reference's GPKG raster half:
# gdalgeopackagerasterband.cpp; table DDL ogrgeopackagedatasource.cpp
# :5283-5311 — gpkg_tile_matrix_set + gpkg_tile_matrix + the tile
# pyramid user table).  GPKG tile_row is TOP-DOWN (XYZ), unlike
# MBTiles' TMS south-up rows.
# --------------------------------------------------------------------------

_TILES_SCHEMA = T.StructType(
    [
        T.StructField("tile_z", T.IntegerType()),
        T.StructField("tile_x", T.IntegerType()),
        T.StructField("tile_y", T.IntegerType()),
        T.StructField("payload", T.BinaryType()),
    ]
)


def write_gpkg_tiles(
    df: DataFrame,
    path: str,
    table: str = "tiles",
    tile_size: int = 256,
) -> None:
    """Stream (tile_z, tile_x, tile_y XYZ, payload) rows into a
    GeoPackage tile pyramid over the global web-mercator matrix set
    (one gpkg_tile_matrix row per zoom actually present)."""
    from gdal_spark.tiles import tilemath as tm

    if os.path.exists(path):
        os.remove(path)
    con = sqlite3.connect(path)
    cur = con.cursor()
    cur.execute("PRAGMA application_id = 1196444487")  # 'GPKG'
    cur.execute(
        """CREATE TABLE gpkg_spatial_ref_sys (
        srs_name TEXT NOT NULL, srs_id INTEGER NOT NULL PRIMARY KEY,
        organization TEXT NOT NULL,
        organization_coordsys_id INTEGER NOT NULL,
        definition TEXT NOT NULL, description TEXT)"""
    )
    cur.execute(
        "INSERT INTO gpkg_spatial_ref_sys VALUES "
        "('WGS 84 / Pseudo-Mercator', 3857, 'EPSG', 3857, "
        "'PROJCS[...]', NULL)"
    )
    cur.execute(
        """CREATE TABLE gpkg_contents (
        table_name TEXT NOT NULL PRIMARY KEY, data_type TEXT NOT NULL,
        identifier TEXT UNIQUE, description TEXT DEFAULT '',
        last_change DATETIME, min_x DOUBLE, min_y DOUBLE,
        max_x DOUBLE, max_y DOUBLE, srs_id INTEGER)"""
    )
    cur.execute(
        """CREATE TABLE gpkg_tile_matrix_set (
        table_name TEXT NOT NULL PRIMARY KEY, srs_id INTEGER NOT NULL,
        min_x DOUBLE NOT NULL, min_y DOUBLE NOT NULL,
        max_x DOUBLE NOT NULL, max_y DOUBLE NOT NULL)"""
    )
    cur.execute(
        """CREATE TABLE gpkg_tile_matrix (
        table_name TEXT NOT NULL, zoom_level INTEGER NOT NULL,
        matrix_width INTEGER NOT NULL, matrix_height INTEGER NOT NULL,
        tile_width INTEGER NOT NULL, tile_height INTEGER NOT NULL,
        pixel_x_size DOUBLE NOT NULL, pixel_y_size DOUBLE NOT NULL,
        CONSTRAINT pk_ttm PRIMARY KEY (table_name, zoom_level))"""
    )
    cur.execute(
        f"""CREATE TABLE "{table}" (
        id INTEGER PRIMARY KEY AUTOINCREMENT,
        zoom_level INTEGER NOT NULL, tile_column INTEGER NOT NULL,
        tile_row INTEGER NOT NULL, tile_data BLOB NOT NULL,
        UNIQUE (zoom_level, tile_column, tile_row))"""
    )
    zooms: set[int] = set()
    batch: list[tuple] = []
    ext = [None, None, None, None]
    for r in df.toLocalIterator():
        z, x, y = int(r["tile_z"]), int(r["tile_x"]), int(r["tile_y"])
        zooms.add(z)
        # GPKG rows are top-down: tile_row == XYZ tile_y
        batch.append((z, x, y, bytes(r["payload"])))
        span = 2.0 * tm.ORIGIN / (1 << z)
        bx0 = -tm.ORIGIN + x * span
        by1 = tm.ORIGIN - y * span
        vals = (bx0, by1 - span, bx0 + span, by1)
        for k, v in enumerate(vals):
            cmp_ = min if k < 2 else max
            ext[k] = v if ext[k] is None else cmp_(ext[k], v)
        if len(batch) >= 500:
            cur.executemany(
                f'INSERT INTO "{table}" (zoom_level, tile_column,'
                " tile_row, tile_data) VALUES (?,?,?,?)", batch)
            batch.clear()
    if batch:
        cur.executemany(
            f'INSERT INTO "{table}" (zoom_level, tile_column,'
            " tile_row, tile_data) VALUES (?,?,?,?)", batch)
    cur.execute(
        "INSERT INTO gpkg_tile_matrix_set VALUES (?,3857,?,?,?,?)",
        (table, -tm.ORIGIN, -tm.ORIGIN, tm.ORIGIN, tm.ORIGIN),
    )
    for z in sorted(zooms):
        res = tm.resolution(z, tile_size)
        cur.execute(
            "INSERT INTO gpkg_tile_matrix VALUES (?,?,?,?,?,?,?,?)",
            (table, z, 1 << z, 1 << z, tile_size, tile_size, res, res),
        )
    cur.execute(
        "INSERT INTO gpkg_contents VALUES "
        "(?, 'tiles', ?, '', datetime('now'), ?, ?, ?, ?, 3857)",
        (table, table, *ext),
    )
    con.commit()
    con.close()


def read_gpkg_tiles(
    spark: SparkSession, path: str, table: str = "tiles",
    n_partitions: int = 8,
) -> DataFrame:
    """Distributed GPKG tile scan: rowid-range-partitioned read-only
    sqlite reads; rows are already top-down XYZ."""
    con = sqlite3.connect(f"file:{path}?mode=ro", uri=True)
    lo, hi = con.execute(
        f'SELECT min(id), max(id) FROM "{table}"').fetchone()
    con.close()
    if lo is None:
        return spark.createDataFrame([], _TILES_SCHEMA)
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
                    f"SELECT zoom_level, tile_column, tile_row,"
                    f' tile_data FROM "{table}"'
                    " WHERE id BETWEEN ? AND ?", (int(r0), int(r1)),
                ).fetchall()
                c.close()
                for z, x, y, blob in rows:
                    recs.append(
                        {"tile_z": z, "tile_x": x, "tile_y": y,
                         "payload": blob}
                    )
            yield pd.DataFrame(
                recs, columns=[f.name for f in _TILES_SCHEMA.fields]
            )

    return rdf.mapInPandas(scan, _TILES_SCHEMA)


def read_gpkg_tile_matrix(path: str, table: str = "tiles"):
    """The per-zoom matrix metadata (width/height/tile size/pixel
    size) + the matrix-set extent — what the reference sizes the
    dataset from."""
    con = sqlite3.connect(f"file:{path}?mode=ro", uri=True)
    ms = con.execute(
        "SELECT min_x, min_y, max_x, max_y FROM gpkg_tile_matrix_set"
        " WHERE table_name = ?", (table,),
    ).fetchone()
    rows = con.execute(
        "SELECT zoom_level, matrix_width, matrix_height, tile_width,"
        " tile_height, pixel_x_size, pixel_y_size FROM gpkg_tile_matrix"
        " WHERE table_name = ? ORDER BY zoom_level", (table,),
    ).fetchall()
    con.close()
    return ms, rows
