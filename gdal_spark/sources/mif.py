"""MapInfo MIF/MID vector source/sink — the reference's MITAB
driver's interchange-format surface (ogr/ogrsf_frmts/mitab/
mitab_miffile.cpp header + data sections; mitab_feature_mif.cpp
geometry grammar):

- .mif: `Version` / `Delimiter` / `Columns n` header, then `Data`
  followed by one geometry block per feature — `Point x y`,
  `Pline [Multiple k] n` + coordinate lines, `Region n` + per-ring
  count/coordinate lines.
- .mid: one delimited attribute row per feature, aligned with the
  .mif geometry order.

Coordinates serialize repr-exact (the reference's %.15g loses
last-ulp fidelity — would break value-level roundtrip oracles).

Ring semantics: the reference assembles multi-ring Regions by
containment analysis (mitab_feature_mif.cpp TABRegion). The engine
writes exterior-first and reads ring 1 as the shell with subsequent
rings as holes — exact for single-polygon Regions, the only shape
the engine's fixtures and sinks emit; multi-shell Regions raise.

Scale shape: the write is a streamed single-file funnel
(df.toLocalIterator(), O(one partition) driver memory). The read
parses each .mif/.mid PAIR in one executor task (geometry blocks
span lines, so the file — not the line — is the split unit);
a directory of MIF files scans fully distributed, mirroring how the
reference parallelizes across datasets rather than within one.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from gdal_spark.geo import wkb as wkbmod
from gdal_spark.geo.wkb import parse_wkb

__all__ = ["write_mif", "read_mif"]

_TYPE_TO_MIF = {
    "bigint": "Integer", "int": "Integer", "smallint": "Smallint",
    "double": "Float", "float": "Float", "string": "Char(254)",
    "date": "Date",
}


def _r(v: float) -> str:
    return repr(float(v))


def _geom_lines(wkb: bytes) -> list[str]:
    g = parse_wkb(bytes(wkb))
    if g.type_id == wkbmod.WKB_POINT:
        x, y = g.parts[0][0]
        return [f"Point {_r(x)} {_r(y)}"]
    if g.type_id == wkbmod.WKB_LINESTRING:
        pts = g.parts[0]
        return [f"Pline {len(pts)}"] + [f"{_r(x)} {_r(y)}" for x, y in pts]
    if g.type_id == wkbmod.WKB_MULTILINESTRING:
        out = [f"Pline Multiple {len(g.parts)}"]
        for seg in g.parts:
            out.append(f"  {len(seg)}")
            out += [f"{_r(x)} {_r(y)}" for x, y in seg]
        return out
    if g.type_id == wkbmod.WKB_POLYGON:
        rings = g.parts
        out = [f"Region {len(rings)}"]
        for ring in rings:
            out.append(f"  {len(ring)}")
            out += [f"{_r(x)} {_r(y)}" for x, y in ring]
        return out
    if g.type_id == wkbmod.WKB_MULTIPOLYGON:
        raise ValueError(
            "mif: multi-shell Regions need containment analysis the "
            "engine does not model — dissolve to single polygons first"
        )
    raise ValueError(f"mif: unsupported geometry {g.type_name}")


def write_mif(df: DataFrame, path: str, geom_col: str = "geometry",
              delimiter: str = ",") -> None:
    """Write (…attrs, geometry WKB) to `path`(.mif) + sibling .mid."""
    base = path[:-4] if path.lower().endswith(".mif") else path
    attrs = [f for f in df.schema.fields if f.name != geom_col]
    mif_tmp, mid_tmp = base + ".mif.tmp", base + ".mid.tmp"
    with open(mif_tmp, "w") as fmif, open(mid_tmp, "w") as fmid:
        fmif.write("Version 300\nCharset \"Neutral\"\n")
        fmif.write(f"Delimiter \"{delimiter}\"\n")
        fmif.write(f"Columns {len(attrs)}\n")
        for f in attrs:
            mt = _TYPE_TO_MIF.get(f.dataType.simpleString())
            if mt is None:
                raise ValueError(f"mif: no column type for {f.dataType}")
            fmif.write(f"  {f.name} {mt}\n")
        fmif.write("Data\n\n")
        for row in df.toLocalIterator():
            for line in _geom_lines(row[geom_col]):
                fmif.write(line + "\n")
            vals = []
            for f in attrs:
                v = row[f.name]
                if v is None:
                    vals.append('""' if f.dataType.simpleString() == "string" else "")
                elif f.dataType.simpleString() == "string":
                    vals.append('"' + str(v).replace('"', '""') + '"')
                elif isinstance(v, float):
                    vals.append(repr(v))
                else:
                    vals.append(str(v))
            fmid.write(delimiter.join(vals) + "\n")
    os.replace(mif_tmp, base + ".mif")
    os.replace(mid_tmp, base + ".mid")


# ---------------------------------------------------------------------------
# read
# ---------------------------------------------------------------------------

def _parse_mif_text(text: str):
    """-> (delimiter, [(name, mif_type)], [wkb…]) in feature order."""
    lines = text.splitlines()
    i = 0
    delim = "\t"
    cols: list[tuple[str, str]] = []
    n = len(lines)
    while i < n:
        s = lines[i].strip()
        low = s.lower()
        if low.startswith("delimiter"):
            delim = s.split('"')[1]
        elif low.startswith("columns"):
            k = int(s.split()[1])
            for j in range(1, k + 1):
                parts = lines[i + j].split()
                cols.append((parts[0], parts[1]))
            i += k
        elif low == "data":
            i += 1
            break
        i += 1
    geoms = []
    while i < n:
        s = lines[i].strip()
        low = s.lower()
        if not s:
            i += 1
            continue
        toks = s.split()
        if low.startswith("point"):
            geoms.append(wkbmod.wkb_point(float(toks[1]), float(toks[2])))
            i += 1
        elif low.startswith("pline"):
            if len(toks) >= 2 and toks[1].lower() == "multiple":
                nseg = int(toks[2])
                i += 1
                segs = []
                for _ in range(nseg):
                    cnt = int(lines[i].strip())
                    i += 1
                    seg = np.array(
                        [tuple(map(float, lines[i + p].split()))
                         for p in range(cnt)]
                    )
                    i += cnt
                    segs.append(seg)
                g = wkbmod.Geometry(wkbmod.WKB_MULTILINESTRING, parts=segs)
                geoms.append(wkbmod.geometry_to_wkb(g))
            else:
                cnt = int(toks[1])
                i += 1
                pts = np.array(
                    [tuple(map(float, lines[i + p].split()))
                     for p in range(cnt)]
                )
                i += cnt
                geoms.append(wkbmod.wkb_linestring(pts))
        elif low.startswith("region"):
            nring = int(toks[1])
            i += 1
            rings = []
            for _ in range(nring):
                cnt = int(lines[i].strip())
                i += 1
                ring = np.array(
                    [tuple(map(float, lines[i + p].split()))
                     for p in range(cnt)]
                )
                i += cnt
                rings.append(ring)
            geoms.append(wkbmod.wkb_polygon(rings))
        elif low.startswith(("pen", "brush", "symbol", "smooth", "center")):
            i += 1  # style clauses attach to the previous feature
        else:
            raise ValueError(f"mif: unexpected line {s!r}")
    return delim, cols, geoms


def _split_mid_line(line: str, delim: str) -> list[str | None]:
    """Delimited with optional double-quoted strings ('""' escape)."""
    out: list[str | None] = []
    i, n = 0, len(line)
    while i <= n:
        if i < n and line[i] == '"':
            j = i + 1
            buf = []
            while j < n:
                if line[j] == '"':
                    if j + 1 < n and line[j + 1] == '"':
                        buf.append('"')
                        j += 2
                        continue
                    break
                buf.append(line[j])
                j += 1
            out.append("".join(buf))
            i = j + 2  # past closing quote + delimiter
        else:
            j = line.find(delim, i)
            if j == -1:
                tok = line[i:n]
                out.append(tok if tok else None)
                break
            tok = line[i:j]
            out.append(tok if tok else None)
            i = j + 1
    return out


def read_mif(spark: SparkSession, path: str, attr_schema: str) -> DataFrame:
    """Distributed per-file parse of `path` (one .mif file or a
    directory of them); each task reads one .mif + its sibling .mid."""
    attrs = T._parse_datatype_string(attr_schema)
    schema = T.StructType(
        list(attrs.fields) + [T.StructField("geometry", T.BinaryType())]
    )
    names = [f.name for f in attrs.fields]
    kinds = {f.name: f.dataType.simpleString() for f in attrs.fields}

    def decode_files(batches):
        for pdf in batches:
            rows = []
            for fpath, content in zip(pdf["path"], pdf["content"]):
                delim, cols, geoms = _parse_mif_text(
                    bytes(content).decode("utf-8")
                )
                local = fpath[len("file:"):] if str(fpath).startswith("file:") else str(fpath)
                mid = os.path.splitext(local)[0] + ".mid"
                with open(mid) as f:
                    mid_lines = [ln.rstrip("\n") for ln in f]
                col_names = [c[0] for c in cols]
                for wkb, line in zip(geoms, mid_lines):
                    vals = _split_mid_line(line, delim)
                    rec = dict(zip(col_names, vals))
                    r = {}
                    for nm in names:
                        v = rec.get(nm)
                        if v is None or v == "":
                            r[nm] = None
                        elif kinds[nm] in ("bigint", "int", "smallint"):
                            r[nm] = int(v)
                        elif kinds[nm] in ("double", "float"):
                            r[nm] = float(v)
                        else:
                            r[nm] = v
                    r["geometry"] = wkb
                    rows.append(r)
            yield pd.DataFrame(rows, columns=names + ["geometry"])

    raw = spark.read.format("binaryFile").load(
        path if path.lower().endswith(".mif") else os.path.join(path, "*.mif")
    ).select("path", "content")
    return raw.mapInPandas(decode_files, schema)
