"""PGDump — the ogr2ogr -f PGDump SQL-script interchange target.

Semantics re-derived from the reference driver
(/root/reference/ogr/ogrsf_frmts/pgdump/ogrpgdumplayer.cpp):

- one CREATE TABLE statement, then `COPY <table> (<cols>) FROM
  STDIN;` with tab-separated rows terminated by a `\\.` line
  (:771; PG_USE_COPY mode — the INSERT mode is just the slower
  spelling of the same rows);
- text fields escape embedded \\, tab, newline, CR (:735);
  NULL is `\\N`;
- geometry serializes as hex EWKB (OGRGeometryToHexEWKB, :351):
  standard WKB with the 0x20000000 SRID flag OR'd into the type
  word and the 4-byte SRID spliced after it.

The write is a STREAMED single-file sink (toLocalIterator); the
read scans lines distributed and keeps only COPY data rows.
"""

from __future__ import annotations

import struct

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["write_pgdump", "read_pgdump", "hex_ewkb", "parse_hex_ewkb"]

_EWKB_SRID_FLAG = 0x20000000


def hex_ewkb(wkb: bytes, srid: int) -> str:
    bo = "<" if wkb[0] == 1 else ">"
    (t,) = struct.unpack_from(f"{bo}I", wkb, 1)
    out = (
        wkb[:1]
        + struct.pack(f"{bo}I", t | _EWKB_SRID_FLAG)
        + struct.pack(f"{bo}I", srid)
        + wkb[5:]
    )
    return out.hex().upper()


def parse_hex_ewkb(hx: str) -> tuple[bytes, int | None]:
    raw = bytes.fromhex(hx)
    bo = "<" if raw[0] == 1 else ">"
    (t,) = struct.unpack_from(f"{bo}I", raw, 1)
    if not t & _EWKB_SRID_FLAG:
        return raw, None
    (srid,) = struct.unpack_from(f"{bo}I", raw, 5)
    wkb = raw[:1] + struct.pack(f"{bo}I", t & ~_EWKB_SRID_FLAG) + raw[9:]
    return wkb, srid


_SQL_TYPES = {
    "bigint": "BIGINT",
    "int": "INTEGER",
    "double": "DOUBLE PRECISION",
    "float": "REAL",
    "string": "TEXT",
    "boolean": "BOOLEAN",
}


def _esc(v) -> str:
    s = str(v)
    return (
        s.replace("\\", "\\\\")
        .replace("\t", "\\t")
        .replace("\n", "\\n")
        .replace("\r", "\\r")
    )


def write_pgdump(df: DataFrame, path: str, layer: str,
                 geom_col: str = "geometry", srid: int = 4326) -> None:
    import os

    attrs = [f for f in df.schema.fields if f.name != geom_col]
    cols = [f.name for f in attrs] + ["wkb_geometry"]
    col_list = ", ".join(f'"{c}"' for c in cols)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        f.write("SET standard_conforming_strings = ON;\n")
        defs = ", ".join(
            f'"{a.name}" '
            f"{_SQL_TYPES.get(a.dataType.simpleString(), 'TEXT')}"
            for a in attrs
        )
        f.write(
            f'CREATE TABLE "{layer}" ({defs}, "wkb_geometry" GEOMETRY);\n'
        )
        f.write(f'COPY "{layer}" ({col_list}) FROM STDIN;\n')
        for row in df.toLocalIterator():
            vals = [
                "\\N" if row[a.name] is None else _esc(row[a.name])
                for a in attrs
            ]
            vals.append(hex_ewkb(bytes(row[geom_col]), srid))
            f.write("\t".join(vals) + "\n")
        f.write("\\.\n")
    os.replace(tmp, path)


def read_pgdump(spark: SparkSession, path: str,
                attr_schema: str) -> DataFrame:
    """Distributed COPY-row scan back into attrs + (geometry, srid).
    Column order comes from the COPY statement (read driver-side —
    the header is metadata-sized)."""
    import re

    cols = None
    with open(path) as f:
        for line in f:
            m = re.match(r'COPY\s+"[^"]+"\s*\(([^)]*)\)', line)
            if m:
                cols = [c.strip().strip('"') for c in m.group(1).split(",")]
                break
    if cols is None:
        raise ValueError("pgdump: no COPY statement found")

    attrs = T._parse_datatype_string(attr_schema)
    schema = T.StructType(
        list(attrs.fields)
        + [T.StructField("geometry", T.BinaryType()),
           T.StructField("srid", T.IntegerType())]
    )
    names = [f.name for f in attrs.fields]
    casts = {f.name: f.dataType.simpleString() for f in attrs.fields}

    def decode(batches):
        import pandas as pd

        for pdf in batches:
            recs = []
            for line in pdf["value"]:
                s = str(line)
                if (
                    not s or s.startswith(("SET ", "CREATE ", "COPY "))
                    or s == "\\."
                ):
                    continue
                parts = s.split("\t")
                if len(parts) != len(cols):
                    continue
                rec = dict(zip(cols, parts))
                out = {}
                for n in names:
                    v = rec.get(n)
                    if v is None or v == "\\N":
                        out[n] = None
                    elif casts[n] in ("bigint", "int"):
                        out[n] = int(v)
                    elif casts[n] in ("double", "float"):
                        out[n] = float(v)
                    else:
                        out[n] = (
                            v.replace("\\t", "\t").replace("\\n", "\n")
                            .replace("\\r", "\r").replace("\\\\", "\\")
                        )
                wkb, srid = parse_hex_ewkb(rec["wkb_geometry"])
                out["geometry"] = wkb
                out["srid"] = srid
                recs.append(out)
            yield pd.DataFrame(
                recs, columns=[f.name for f in schema.fields]
            )

    return spark.read.text(path).mapInPandas(decode, schema)
