"""ESRI Shapefile source/sink (pure struct) — the reference's
ogr/ogrsf_frmts/shape/ driver re-derived for the shapes the engine
carries: Point (1), PolyLine (3), Polygon (5) with multi-ring parts.

Layout per the ESRI whitepaper (what shapelib/shpopen.c implements):
- .shp: 100-byte header (big-endian file code 9994 + file length in
  16-bit words; little-endian version 1000, shape type, XY bbox),
  then records of (record number, content length) big-endian +
  little-endian shape payload;
- .shx: same header + (offset, content length) big-endian pairs;
- .dbf: dBase III header with 32-byte field descriptors; N (numeric,
  width 18) and C (character) fields; records are fixed-width ASCII
  preceded by a deletion flag byte.

Reads are distributed: tasks read their record-index ranges through
the .shx offsets (the whole point of the index file); writes funnel
through the driver like the reference's sequential writer.
"""

from __future__ import annotations

import os
import struct

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as T_unused  # noqa: F401
from pyspark.sql import functions as F
from pyspark.sql import types as T

from gdal_spark.geo.wkb import (
    parse_wkb,
    wkb_linestring,
    wkb_multipolygon,
    wkb_point,
    wkb_polygon,
)

__all__ = ["write_shp", "read_shp"]


def _shape_record(wkb: bytes) -> bytes:
    g = parse_wkb(bytes(wkb))
    if g.type_name == "Point":
        x, y = g.parts[0][0]
        return struct.pack("<idd", 1, float(x), float(y))
    if g.type_name == "LineString":
        pts = g.parts[0]
        xmin, ymin, xmax, ymax = g.bounds()
        head = struct.pack(
            "<i4dii", 3, xmin, ymin, xmax, ymax, 1, len(pts)
        ) + struct.pack("<i", 0)
        return head + np.asarray(pts, dtype="<f8").tobytes()
    # Polygon: outer ring CW per spec, holes CCW (reverse of OGC)
    rings = []
    for poly in g.all_rings():
        for idx, r in enumerate(poly):
            r = np.asarray(r, dtype=np.float64)
            area = 0.5 * np.sum(r[:-1, 0] * r[1:, 1] - r[1:, 0] * r[:-1, 1])
            is_outer = idx == 0
            cw = area < 0
            if is_outer != cw:  # outer must be CW, holes CCW
                r = r[::-1].copy()
            rings.append(r)
    xmin, ymin, xmax, ymax = g.bounds()
    n_pts = sum(len(r) for r in rings)
    head = struct.pack("<i4dii", 5, xmin, ymin, xmax, ymax, len(rings), n_pts)
    off = 0
    parts = []
    for r in rings:
        parts.append(off)
        off += len(r)
    head += struct.pack(f"<{len(rings)}i", *parts)
    return head + b"".join(np.asarray(r, dtype="<f8").tobytes() for r in rings)


def _record_to_wkb(buf: bytes) -> bytes:
    (stype,) = struct.unpack_from("<i", buf, 0)
    if stype == 1:
        x, y = struct.unpack_from("<dd", buf, 4)
        return wkb_point(x, y)
    if stype == 3:
        n_parts, n_pts = struct.unpack_from("<ii", buf, 36)
        pts = np.frombuffer(
            buf, "<f8", 2 * n_pts, 44 + 4 * n_parts
        ).reshape(n_pts, 2)
        return wkb_linestring(pts.copy())
    if stype == 5:
        n_parts, n_pts = struct.unpack_from("<ii", buf, 36)
        parts = struct.unpack_from(f"<{n_parts}i", buf, 44)
        pts = np.frombuffer(
            buf, "<f8", 2 * n_pts, 44 + 4 * n_parts
        ).reshape(n_pts, 2)
        bounds = list(parts) + [n_pts]
        rings = [pts[bounds[i] : bounds[i + 1]].copy() for i in range(n_parts)]
        # Classify rings by WINDING ORDER per the ESRI spec (the
        # reference's shape driver, shape/shp2ogr.cpp, does the same):
        # CW (negative shoelace area) = outer, CCW = hole. A record
        # may carry multiple outer rings (a multi-part polygon) — group
        # each hole with the outer ring containing its first vertex and
        # emit MultiPolygon WKB when more than one outer is present.
        from gdal_spark.geo.geom import points_in_polygon

        outers: list[np.ndarray] = []
        holes: list[np.ndarray] = []
        for r in rings:
            area = 0.5 * np.sum(r[:-1, 0] * r[1:, 1] - r[1:, 0] * r[:-1, 1])
            (outers if area < 0 else holes).append(r)
        if not outers:  # degenerate record: treat all rings as outers
            outers, holes = holes, []
        polys = [[o[::-1].copy()] for o in outers]  # outer -> OGC CCW
        for hole in holes:
            hx, hy = float(hole[0, 0]), float(hole[0, 1])
            owner = 0
            for pi, grp in enumerate(polys):
                if points_in_polygon([hx], [hy], [grp[0]])[0]:
                    owner = pi
                    break
            polys[owner].append(hole[::-1].copy())  # hole -> OGC CW
        if len(polys) == 1:
            return wkb_polygon(polys[0])
        return wkb_multipolygon(polys)
    raise ValueError(f"unsupported shape type {stype}")


def write_prj(base_path: str, crs) -> None:
    """ESRI .prj sidecar: the layer CRS as WKT1 (the reference's
    shape driver writes/reads exactly this file,
    ogr/ogrsf_frmts/shape/ogrshapedatasource.cpp)."""
    from gdal_spark.geo.wktcrs import to_wkt

    with open(base_path + ".prj", "w") as f:
        f.write(to_wkt(crs))


def read_prj(base_path: str):
    """.prj sidecar -> registry CRS key (any WKT1/WKT2 the engine's
    importer takes); None when the sidecar is absent, like the
    reference's 'unknown SRS' layer state."""
    import os

    from gdal_spark.geo.wktcrs import wkt_to_crs

    p = base_path + ".prj"
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return wkt_to_crs(f.read())


def write_shp(df: DataFrame, base_path: str, geom_col: str = "geometry",
              crs=None) -> None:
    """Write (fid, <attrs>, geometry WKB) as base_path{.shp,.shx,.dbf}
    (+ .prj when `crs` is given).

    Shapefiles are an inherently single-file sequential format (the
    reference's shape driver writes serially too), but the funnel
    streams `df.toLocalIterator()` — driver memory stays O(one Spark
    partition), never the whole layer. Placeholder headers are written
    first and patched (seek 0) once totals/bounds are known.
    """
    fields = [
        (f.name, f.dataType.simpleString()) for f in df.schema.fields
        if f.name != geom_col
    ]
    descs = b""
    widths = []
    for name, dt in fields:
        if dt in ("bigint", "int", "smallint", "boolean"):
            ftype, width, dec = b"N", 18, 0
        elif dt in ("double", "float"):
            ftype, width, dec = b"N", 18, 6
        else:
            ftype, width, dec = b"C", 32, 0
        widths.append(width)
        descs += struct.pack(
            "<11sc4xBB14x", name[:10].encode().ljust(11, b"\x00"), ftype,
            width, dec,
        )
    rec_len = 1 + sum(widths)

    def header(total_words: int, stype: int, bounds: list[float]) -> bytes:
        return (
            struct.pack(">i5i", 9994, 0, 0, 0, 0, 0)
            + struct.pack(">i", total_words)
            + struct.pack("<ii4d", 1000, stype, *bounds)
            + struct.pack("<4d", 0, 0, 0, 0)
        )

    placeholder = header(50, 0, [0.0, 0.0, 0.0, 0.0])
    bounds = [np.inf, np.inf, -np.inf, -np.inf]
    stype = 0
    n_rows = 0
    offset_words = 50
    with open(base_path + ".shp", "wb") as fshp, open(
        base_path + ".shx", "wb"
    ) as fshx, open(base_path + ".dbf", "wb") as fdbf:
        fshp.write(placeholder)
        fshx.write(placeholder)
        fdbf.write(
            struct.pack("<BBBBIHH20x", 3, 124, 1, 1, 0, 32 + len(descs) + 1,
                        rec_len)
            + descs + b"\x0d"
        )
        for r in df.toLocalIterator():
            rec = _shape_record(r[geom_col])
            if n_rows == 0:
                (stype,) = struct.unpack_from("<i", rec, 0)
            b = parse_wkb(bytes(r[geom_col])).bounds()
            bounds = [min(bounds[0], b[0]), min(bounds[1], b[1]),
                      max(bounds[2], b[2]), max(bounds[3], b[3])]
            clen = len(rec) // 2
            fshp.write(struct.pack(">ii", n_rows + 1, clen) + rec)
            fshx.write(struct.pack(">ii", offset_words, clen))
            offset_words += 4 + clen
            out = b" "
            for (name, dt), width in zip(fields, widths):
                v = r[name]
                if dt in ("double", "float"):
                    s = f"{v:.6f}"[:width].rjust(width)
                elif dt in ("bigint", "int", "smallint", "boolean"):
                    s = str(int(v))[:width].rjust(width)
                else:
                    s = str(v)[:width].ljust(width)
                out += s.encode()
            fdbf.write(out)
            n_rows += 1
        fdbf.write(b"\x1a")
        fshp.seek(0)
        fshp.write(header(offset_words, stype, bounds))
        fshx.seek(0)
        fshx.write(header(50 + 4 * n_rows, stype, bounds))
        fdbf.seek(0)
        fdbf.write(
            struct.pack("<BBBBIHH20x", 3, 124, 1, 1, n_rows,
                        32 + len(descs) + 1, rec_len)
        )
    if crs is not None:
        write_prj(base_path, crs)


def read_shp(
    spark: SparkSession, base_path: str, n_partitions: int = 8
) -> DataFrame:
    """Distributed shapefile scan: .shx-indexed record ranges per
    task; attributes from .dbf; -> (fid, <attrs>, geometry WKB)."""
    with open(base_path + ".shx", "rb") as f:
        shx = f.read()
    n_recs = (len(shx) - 100) // 8
    with open(base_path + ".dbf", "rb") as f:
        dbf_head = f.read(32)
        _, _, _, _, n_dbf, hdr_len, rec_len = struct.unpack_from(
            "<BBBBIHH", dbf_head, 0
        )
        descs = f.read(hdr_len - 32 - 1)
    fields = []
    for off in range(0, len(descs), 32):
        name = descs[off : off + 11].split(b"\x00")[0].decode()
        ftype = descs[off + 11 : off + 12]
        width = descs[off + 16]
        dec = descs[off + 17]
        fields.append((name, ftype, width, dec))
    sfields = []
    for name, ftype, _w, dec in fields:
        if ftype == b"N" and dec == 0:
            sfields.append(T.StructField(name, T.LongType()))
        elif ftype == b"N":
            sfields.append(T.StructField(name, T.DoubleType()))
        else:
            sfields.append(T.StructField(name, T.StringType()))
    schema = T.StructType(sfields + [T.StructField("geometry", T.BinaryType())])
    names = [f[0] for f in fields]
    step = max(1, n_recs // n_partitions + 1)
    ranges = [(i, min(n_recs, i + step)) for i in range(0, n_recs, step)]
    rdf = spark.createDataFrame(ranges, "r0 long, r1 long")

    def scan(batches):
        for pdf in batches:
            out = []
            with open(base_path + ".shp", "rb") as fshp, open(
                base_path + ".dbf", "rb"
            ) as fdbf:
                for r0, r1 in zip(pdf["r0"], pdf["r1"]):
                    for i in range(int(r0), int(r1)):
                        off_w, len_w = struct.unpack_from(
                            ">ii", shx, 100 + 8 * i
                        )
                        fshp.seek(off_w * 2 + 8)
                        rec = fshp.read(len_w * 2)
                        fdbf.seek(hdr_len + i * rec_len + 1)
                        raw = fdbf.read(rec_len - 1)
                        vals = {}
                        pos = 0
                        for name, ftype, width, dec in fields:
                            cell = raw[pos : pos + width].decode().strip()
                            pos += width
                            if ftype == b"N" and dec == 0:
                                vals[name] = int(cell) if cell else None
                            elif ftype == b"N":
                                vals[name] = float(cell) if cell else None
                            else:
                                vals[name] = cell
                        vals["geometry"] = _record_to_wkb(rec)
                        out.append(vals)
            yield pd.DataFrame(out, columns=names + ["geometry"])

    return rdf.mapInPandas(scan, schema)
