"""SpatiaLite vector source/sink via the stdlib sqlite3 module — the
reference's SQLite driver in its SpatiaLite layout
(ogr/ogrsf_frmts/sqlite/ogrsqlitelayer.cpp ImportSpatiaLiteGeometry /
ExportSpatiaLiteGeometry; metadata per ogrsqlitedatasource.cpp:
`geometry_columns` + `spatial_ref_sys`).

SpatiaLite geometry BLOB wire format (re-derived from the published
spec + the reference reader):

  00 | endian(01=LE) | srid int32 | MBR 4×double | 7C |
  class int32 | body… | FE

Bodies are WKB-like but carry NO inner endian/class bytes for rings;
each sub-geometry of a multi is preceded by the 0x69 entity marker
and its own class int32.

Scale shape mirrors sources/gpkg.py: distributed rowid-partitioned
reads (sqlite files are multi-process read-safe), streamed
single-writer sink (sqlite is single-writer by design — the
reference serializes writes the same way).
"""

from __future__ import annotations

import os
import sqlite3
import struct

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from gdal_spark.geo import wkb as wkbmod
from gdal_spark.geo.wkb import parse_wkb

__all__ = [
    "write_spatialite", "read_spatialite",
    "wkb_to_splite_blob", "splite_blob_to_wkb",
]


def _body(g: wkbmod.Geometry) -> bytes:
    t = g.type_id
    if t == wkbmod.WKB_POINT:
        x, y = g.parts[0][0]
        return struct.pack("<2d", float(x), float(y))
    if t == wkbmod.WKB_LINESTRING:
        pts = np.asarray(g.parts[0], dtype="<f8")
        return struct.pack("<I", len(pts)) + pts.tobytes()
    if t == wkbmod.WKB_POLYGON:
        out = [struct.pack("<I", len(g.parts))]
        for ring in g.parts:
            r = np.asarray(ring, dtype="<f8")
            out.append(struct.pack("<I", len(r)) + r.tobytes())
        return b"".join(out)
    # multis: count + per entity 0x69 marker + class + body
    if t == wkbmod.WKB_MULTIPOINT:
        pts = g.parts[0]
        out = [struct.pack("<I", len(pts))]
        for x, y in pts:
            out.append(struct.pack("<BI2d", 0x69, 1, float(x), float(y)))
        return b"".join(out)
    if t == wkbmod.WKB_MULTILINESTRING:
        out = [struct.pack("<I", len(g.parts))]
        for part in g.parts:
            sub = wkbmod.Geometry(wkbmod.WKB_LINESTRING, parts=[part])
            out.append(struct.pack("<BI", 0x69, 2) + _body(sub))
        return b"".join(out)
    if t == wkbmod.WKB_MULTIPOLYGON:
        out = [struct.pack("<I", len(g.polys))]
        for rings in g.polys:
            sub = wkbmod.Geometry(wkbmod.WKB_POLYGON, parts=rings)
            out.append(struct.pack("<BI", 0x69, 3) + _body(sub))
        return b"".join(out)
    raise ValueError(f"spatialite: unsupported {g.type_name}")


def wkb_to_splite_blob(wkb: bytes, srid: int = 4326) -> bytes:
    g = parse_wkb(bytes(wkb))
    xmin, ymin, xmax, ymax = g.bounds()
    return (
        struct.pack("<BBi4d", 0x00, 0x01, srid, xmin, ymin, xmax, ymax)
        + b"\x7c" + struct.pack("<I", g.type_id) + _body(g) + b"\xfe"
    )


def _parse_body(buf: bytes, off: int, tid: int):
    if tid == 1:
        x, y = struct.unpack_from("<2d", buf, off)
        return wkbmod.Geometry(1, parts=[np.array([[x, y]])]), off + 16
    if tid == 2:
        (n,) = struct.unpack_from("<I", buf, off)
        off += 4
        pts = np.frombuffer(buf, "<f8", 2 * n, off).reshape(n, 2).copy()
        return wkbmod.Geometry(2, parts=[pts]), off + 16 * n
    if tid == 3:
        (nr,) = struct.unpack_from("<I", buf, off)
        off += 4
        rings = []
        for _ in range(nr):
            (n,) = struct.unpack_from("<I", buf, off)
            off += 4
            rings.append(
                np.frombuffer(buf, "<f8", 2 * n, off).reshape(n, 2).copy())
            off += 16 * n
        return wkbmod.Geometry(3, parts=rings), off
    if tid in (4, 5, 6):
        (n,) = struct.unpack_from("<I", buf, off)
        off += 4
        subs = []
        for _ in range(n):
            marker, sub_tid = struct.unpack_from("<BI", buf, off)
            if marker != 0x69:
                raise ValueError("spatialite: missing entity marker")
            off += 5
            sub, off = _parse_body(buf, off, sub_tid)
            subs.append(sub)
        if tid == 4:
            return wkbmod.Geometry(
                4, parts=[np.vstack([s.parts[0] for s in subs])]), off
        if tid == 5:
            return wkbmod.Geometry(
                5, parts=[s.parts[0] for s in subs]), off
        return wkbmod.Geometry(6, polys=[s.parts for s in subs]), off
    raise ValueError(f"spatialite: unsupported class {tid}")


def splite_blob_to_wkb(blob: bytes) -> bytes:
    b = bytes(blob)
    if b[0] != 0x00 or b[1] != 0x01 or b[38] != 0x7C:
        raise ValueError("not a (little-endian) SpatiaLite blob")
    (tid,) = struct.unpack_from("<I", b, 39)
    g, _ = _parse_body(b, 43, tid)
    return wkbmod.geometry_to_wkb(g)


_GEOM_TYPE_NAMES = {1: "POINT", 2: "LINESTRING", 3: "POLYGON",
                    4: "MULTIPOINT", 5: "MULTILINESTRING",
                    6: "MULTIPOLYGON"}


def write_spatialite(df: DataFrame, path: str, layer: str,
                     geom_col: str = "geometry", srid: int = 4326
                     ) -> None:
    """Streamed single-writer sink with SpatiaLite metadata tables."""
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
    cur.execute(
        """CREATE TABLE spatial_ref_sys (
             srid INTEGER NOT NULL PRIMARY KEY, auth_name TEXT,
             auth_srid INTEGER, ref_sys_name TEXT, proj4text TEXT,
             srtext TEXT)"""
    )
    cur.execute(
        "INSERT INTO spatial_ref_sys VALUES (4326, 'epsg', 4326, "
        "'WGS 84', '+proj=longlat +datum=WGS84 +no_defs', NULL)"
    )
    cur.execute(
        """CREATE TABLE geometry_columns (
             f_table_name TEXT NOT NULL, f_geometry_column TEXT NOT NULL,
             geometry_type INTEGER NOT NULL, coord_dimension INTEGER NOT NULL,
             srid INTEGER NOT NULL, spatial_index_enabled INTEGER NOT NULL,
             CONSTRAINT pk_geom_cols PRIMARY KEY (f_table_name, f_geometry_column))"""
    )
    attr_ddl = "".join(f", \"{n}\" {sql_type(t)}" for n, t in fields)
    cur.execute(
        f"CREATE TABLE \"{layer}\" (fid INTEGER PRIMARY KEY{attr_ddl}, "
        f"\"{geom_col}\" BLOB)"
    )
    cols = ["fid"] + [n for n, _ in fields] + [geom_col]
    ph = ",".join("?" * len(cols))
    insert_sql = f"INSERT INTO \"{layer}\" VALUES ({ph})"
    batch: list[tuple] = []
    geom_type = 0
    for r in df.toLocalIterator():
        wkb = bytes(r[geom_col])
        geom_type = parse_wkb(wkb).type_id
        batch.append(
            tuple(r[c] for c in cols[:-1])
            + (wkb_to_splite_blob(wkb, srid),)
        )
        if len(batch) >= 10_000:
            cur.executemany(insert_sql, batch)
            batch.clear()
    if batch:
        cur.executemany(insert_sql, batch)
    cur.execute(
        "INSERT INTO geometry_columns VALUES (?,?,?,2,?,0)",
        (layer, geom_col, geom_type, srid),
    )
    con.commit()
    con.close()


def read_spatialite(spark: SparkSession, path: str, layer: str,
                    n_partitions: int = 8) -> DataFrame:
    """Distributed rowid-partitioned scan, blobs unwrapped to WKB."""
    con = sqlite3.connect(path)
    cur = con.cursor()
    info = cur.execute(f"PRAGMA table_info(\"{layer}\")").fetchall()
    geom_col = cur.execute(
        "SELECT f_geometry_column FROM geometry_columns "
        "WHERE f_table_name = ?", (layer,),
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
                    rec[geom_col] = splite_blob_to_wkb(rec[geom_col])
                    out.append(rec)
            yield pd.DataFrame(out, columns=names)

    return rdf.mapInPandas(scan, schema)
