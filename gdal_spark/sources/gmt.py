"""OGR GMT ASCII vector format (.gmt).

Semantics re-derived from the reference driver
(/root/reference/ogr/ogrsf_frmts/gmt/ogrgmtlayer.cpp):

- header comments: `# @VGMT1.0 @GPOLYGON` (geometry class),
  `# @N<name>|<name>...` field names, `# @T<type>|<type>...` field
  types, `# FEATURE_DATA`;
- each feature starts with a `>` separator line followed by
  `# @D<val>|<val>...` attribute data (pipe-separated, strings may
  be double-quoted);
- polygon rings are coordinate blocks `lon lat` one pair per line;
  interior rings are introduced by a `# @H` comment (holes), the
  outer ring by `# @P`.

Write is the streamed single-file sink; read is a whole-file
driver-side parse into a distributed DataFrame (GMT files are
feature-sequential text — the reference reads them the same way;
the at-scale path is GeoParquet)."""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from gdal_spark.geo.wkb import parse_wkb, wkb_polygon

__all__ = ["write_gmt", "read_gmt"]

_GMT_TYPES = {
    "bigint": "integer",
    "int": "integer",
    "double": "double",
    "string": "string",
}


def write_gmt(df: DataFrame, path: str,
              geom_col: str = "geometry") -> None:
    import os

    attrs = [f for f in df.schema.fields if f.name != geom_col]
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        f.write("# @VGMT1.0 @GPOLYGON\n")
        f.write("# @N" + "|".join(a.name for a in attrs) + "\n")
        f.write(
            "# @T"
            + "|".join(
                _GMT_TYPES.get(a.dataType.simpleString(), "string")
                for a in attrs
            )
            + "\n"
        )
        f.write("# FEATURE_DATA\n")
        for row in df.toLocalIterator():
            f.write(">\n")
            vals = []
            for a in attrs:
                v = row[a.name]
                if v is None:
                    vals.append("")
                elif a.dataType.simpleString() == "string":
                    vals.append(f'"{v}"')
                else:
                    vals.append(str(v))
            f.write("# @D" + "|".join(vals) + "\n")
            g = parse_wkb(bytes(row[geom_col]))
            if g.type_id != 3:
                raise ValueError("gmt: polygon layers only")
            for ri, ring in enumerate(g.parts):
                f.write("# @P\n" if ri == 0 else "# @H\n")
                for x, y in ring:
                    f.write(f"{x!r} {y!r}\n")
    os.replace(tmp, path)


def read_gmt(spark: SparkSession, path: str,
             attr_schema: str) -> DataFrame:
    attrs = T._parse_datatype_string(attr_schema)
    schema = T.StructType(
        list(attrs.fields) + [T.StructField("geometry", T.BinaryType())]
    )
    names = [f.name for f in attrs.fields]
    casts = {f.name: f.dataType.simpleString() for f in attrs.fields}

    feats = []
    cur: dict | None = None
    rings: list = []
    ring: list = []
    file_names: list[str] = []

    def flush_ring():
        nonlocal ring
        if ring:
            rings.append(np.asarray(ring, dtype=np.float64))
            ring = []

    def flush_feat():
        nonlocal cur, rings
        flush_ring()
        if cur is not None and rings:
            cur["geometry"] = wkb_polygon(rings)
            feats.append(cur)
        cur, rings = None, []

    with open(path) as f:
        for raw in f:
            line = raw.rstrip("\n")
            if line.startswith("# @N"):
                file_names = line[4:].split("|")
                continue
            if line.startswith("# @D"):
                vals = line[4:].split("|")
                rec = dict(zip(file_names, vals))
                cur = {}
                for n in names:
                    v = rec.get(n, "")
                    if v == "":
                        cur[n] = None
                    elif casts[n] in ("bigint", "int"):
                        cur[n] = int(v)
                    elif casts[n] in ("double", "float"):
                        cur[n] = float(v)
                    else:
                        cur[n] = v.strip('"')
                continue
            if line.startswith(">"):
                flush_feat()
                continue
            if line.startswith("# @H") or line.startswith("# @P"):
                flush_ring()
                continue
            if line.startswith("#") or not line.strip():
                continue
            x, y = line.split()[:2]
            ring.append((float(x), float(y)))
    flush_feat()
    rows = [tuple(ft[n] for n in names) + (ft["geometry"],)
            for ft in feats]
    return spark.createDataFrame(rows, schema)
