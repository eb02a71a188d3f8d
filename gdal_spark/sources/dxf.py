"""DXF vector source/sink — the reference's DXF driver surface
(ogr/ogrsf_frmts/dxf/ogrdxflayer.cpp entity translation,
ogrdxfwriterlayer.cpp entity emission), scoped to the ASCII
group-code/value wire format's core entity set:

  POINT        codes 10/20                     -> Point
  LINE         codes 10/20 + 11/21             -> LineString(2)
  LWPOLYLINE   90 count, 70 bit0 closed,       -> LineString (closed
               repeated 10/20                     rings repeat the
                                                  first vertex, the
                                                  reference's choice —
                                                  polygons arrive via
                                                  HATCH only)

Feature attributes mirror the reference's fixed DXF schema subset:
`Layer` (group 8) and `EntityHandle` (group 5, hex). Arbitrary
attribute columns do NOT survive DXF — same as the reference.

- write: streamed single-file sink (toLocalIterator, O(one
  partition) driver memory) emitting a minimal ENTITIES-only
  document (the reference's reader accepts header-less files).
  Coordinates are repr-exact.
- read: distributed per-FILE parse (group-code pairs span lines, so
  the file is the split unit; directories of .dxf files scan fully
  parallel) via binaryFile + mapInPandas.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from gdal_spark.geo import wkb as wkbmod
from gdal_spark.geo.wkb import parse_wkb

__all__ = ["write_dxf", "read_dxf"]

_SCHEMA = T.StructType(
    [
        T.StructField("layer", T.StringType()),
        T.StructField("entity_handle", T.StringType()),
        T.StructField("geometry", T.BinaryType()),
    ]
)


def _r(v: float) -> str:
    return repr(float(v))


def _entity_pairs(wkb: bytes, layer: str, handle: str) -> list[str]:
    g = parse_wkb(bytes(wkb))
    head = lambda name: ["0", name, "5", handle, "8", layer]  # noqa: E731
    if g.type_id == wkbmod.WKB_POINT:
        x, y = g.parts[0][0]
        return head("POINT") + ["10", _r(x), "20", _r(y)]
    if g.type_id == wkbmod.WKB_LINESTRING:
        pts = g.parts[0]
        closed = len(pts) > 2 and np.array_equal(pts[0], pts[-1])
        if len(pts) == 2:
            return head("LINE") + [
                "10", _r(pts[0][0]), "20", _r(pts[0][1]),
                "11", _r(pts[1][0]), "21", _r(pts[1][1]),
            ]
        body = pts[:-1] if closed else pts
        out = head("LWPOLYLINE") + ["90", str(len(body)),
                                    "70", "1" if closed else "0"]
        for x, y in body:
            out += ["10", _r(x), "20", _r(y)]
        return out
    raise ValueError(
        f"dxf: unsupported geometry {g.type_name} — polygons emit one "
        "closed LWPOLYLINE per ring (reference parity: polygons read "
        "back from DXF only via HATCH)"
    )


def write_dxf(df: DataFrame, path: str, geom_col: str = "geometry",
              layer_col: str = "layer", handle_col: str | None = None
              ) -> None:
    """Write (layer, [handle,] geometry WKB) rows as a minimal
    ENTITIES-only DXF. Handles default to sequential hex like the
    reference's writer."""
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        f.write("0\nSECTION\n2\nENTITIES\n")
        seq = 0x100
        for row in df.toLocalIterator():
            handle = (
                str(row[handle_col]) if handle_col else format(seq, "X")
            )
            seq += 1
            f.write("\n".join(
                _entity_pairs(row[geom_col], str(row[layer_col]), handle)
            ) + "\n")
        f.write("0\nENDSEC\n0\nEOF\n")
    os.replace(tmp, path)


def _parse_dxf_text(text: str):
    """-> rows of (layer, handle, wkb) from the ENTITIES section."""
    lines = text.splitlines()
    pairs = [
        (lines[i].strip(), lines[i + 1].strip())
        for i in range(0, len(lines) - 1, 2)
    ]
    rows = []
    in_entities = False
    i = 0
    n = len(pairs)

    def collect(start: int):
        """Group codes of one entity until the next 0 code."""
        j = start
        out = []
        while j < n and pairs[j][0] != "0":
            out.append(pairs[j])
            j += 1
        return out, j

    while i < n:
        code, val = pairs[i]
        if code == "0" and val == "SECTION":
            in_entities = i + 1 < n and pairs[i + 1] == ("2", "ENTITIES")
            i += 1
            continue
        if code == "0" and val in ("ENDSEC", "EOF"):
            in_entities = False
            i += 1
            continue
        if not in_entities or code != "0":
            i += 1
            continue
        etype = val
        body, i = collect(i + 1)
        d: dict[str, list[str]] = {}
        for c, v in body:
            d.setdefault(c, []).append(v)
        layer = d.get("8", [""])[0]
        handle = d.get("5", [""])[0]
        if etype == "POINT":
            wkb = wkbmod.wkb_point(float(d["10"][0]), float(d["20"][0]))
        elif etype == "LINE":
            wkb = wkbmod.wkb_linestring(np.array([
                (float(d["10"][0]), float(d["20"][0])),
                (float(d["11"][0]), float(d["21"][0])),
            ]))
        elif etype == "LWPOLYLINE":
            pts = np.array(
                [(float(x), float(y)) for x, y in zip(d["10"], d["20"])]
            )
            closed = int(d.get("70", ["0"])[0]) & 1
            if closed:
                pts = np.vstack([pts, pts[:1]])
            wkb = wkbmod.wkb_linestring(pts)
        else:
            continue  # entity types out of scope are skipped, like
            # the reference's unsupported-entity warning path
        rows.append((layer, handle, wkb))
    return rows


def read_dxf(spark: SparkSession, path: str) -> DataFrame:
    """Distributed per-file parse -> (layer, entity_handle,
    geometry)."""
    def decode_files(batches):
        for pdf in batches:
            recs = []
            for content in pdf["content"]:
                for layer, handle, wkb in _parse_dxf_text(
                    bytes(content).decode("utf-8")
                ):
                    recs.append(
                        {"layer": layer, "entity_handle": handle,
                         "geometry": wkb}
                    )
            yield pd.DataFrame(
                recs, columns=["layer", "entity_handle", "geometry"]
            )

    raw = spark.read.format("binaryFile").load(
        path if path.lower().endswith(".dxf") else os.path.join(path, "*.dxf")
    ).select("content")
    return raw.mapInPandas(decode_files, _SCHEMA)
