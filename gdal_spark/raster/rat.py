"""Raster Attribute Table (RAT) — per-value class table derived from
pixels, joinable to classification outputs, PAM-XML round-trippable.

Semantics re-derived from the reference:

- field model: /root/reference/gcore/gdal.h:2149-2169
  (GDALRATFieldUsage: PixelCount=1, Name=2, Min=3, Max=4, MinMax=5,
  Red/Green/Blue=6/7/8, ...) and gdal.h GDALRATFieldType
  (Integer=0, Real=1, String=2);
- XML persistence: /root/reference/gcore/gdal_rat.cpp:598 Serialize —
  <GDALRasterAttributeTable tableType="thematic|athematic"
  [Row0Min= BinSize=]> with <FieldDefn index><Name/><Type
  typeAsString/><Usage usageAsString/></FieldDefn> then <Row index>
  holding one <F> per column — exactly what lands in PAM .aux.xml;
- the classic "RAT from a paletted band" = value histogram
  (GFU_MinMax + GFU_PixelCount) joined to the color table
  (GFU_Red/Green/Blue) plus a class name column (GFU_Name).

Spark shape: a RAT IS a (tiny) DataFrame.  `rat_from_band_counts`
reduces per-image value histograms with one groupBy (map-side
combine; the 256-row result is metadata).  No collects anywhere.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "GFT_INTEGER", "GFT_REAL", "GFT_STRING",
    "GFU", "FieldDef", "rat_from_band_counts",
    "serialize_rat", "parse_rat",
]

GFT_INTEGER, GFT_REAL, GFT_STRING = 0, 1, 2

GFU = {
    "Generic": 0, "PixelCount": 1, "Name": 2, "Min": 3, "Max": 4,
    "MinMax": 5, "Red": 6, "Green": 7, "Blue": 8, "Alpha": 9,
    "RedMin": 10, "GreenMin": 11, "BlueMin": 12, "AlphaMin": 13,
    "RedMax": 14, "GreenMax": 15, "BlueMax": 16, "AlphaMax": 17,
}
_USAGE_NAME = {v: k for k, v in GFU.items()}
_TYPE_NAME = {GFT_INTEGER: "Integer", GFT_REAL: "Real",
              GFT_STRING: "String"}


class FieldDef:
    __slots__ = ("name", "ftype", "usage")

    def __init__(self, name: str, ftype: int, usage: int):
        self.name, self.ftype, self.usage = name, ftype, usage

    def __eq__(self, o):
        return (self.name, self.ftype, self.usage) == (
            o.name, o.ftype, o.usage)

    def __repr__(self):
        return f"FieldDef({self.name!r}, {self.ftype}, {self.usage})"


PALETTED_RAT_FIELDS = [
    FieldDef("Value", GFT_INTEGER, GFU["MinMax"]),
    FieldDef("PixelCount", GFT_INTEGER, GFU["PixelCount"]),
    FieldDef("Name", GFT_STRING, GFU["Name"]),
    FieldDef("Red", GFT_INTEGER, GFU["Red"]),
    FieldDef("Green", GFT_INTEGER, GFU["Green"]),
    FieldDef("Blue", GFT_INTEGER, GFU["Blue"]),
]


def rat_from_band_counts(counts: DataFrame, palette: np.ndarray
                         ) -> tuple[DataFrame, list[FieldDef]]:
    """counts: (value int, pixel_count long) partial histograms (any
    multiplicity — they are summed).  palette: (256, 3) uint8.
    -> (RAT DataFrame ordered by value, field definitions)."""
    pal = [(int(v), int(r), int(g), int(b))
           for v, (r, g, b) in enumerate(np.asarray(palette))]
    spark = counts.sparkSession
    pal_df = spark.createDataFrame(
        pal, "value int, red int, green int, blue int")
    agg = counts.groupBy("value").agg(
        F.sum("pixel_count").alias("pixel_count"))
    return (
        pal_df.join(agg, "value", "left")
        .select(
            "value",
            F.coalesce("pixel_count", F.lit(0)).alias("pixel_count"),
            F.concat(F.lit("class_"), F.col("value")).alias("name"),
            "red", "green", "blue",
        )
        .orderBy("value"),
        PALETTED_RAT_FIELDS,
    )


def serialize_rat(rows: list[tuple], fields: list[FieldDef],
                  table_type: str = "thematic") -> str:
    """gdal_rat.cpp:598 Serialize XML (the PAM .aux.xml payload)."""
    root = ET.Element("GDALRasterAttributeTable",
                      {"tableType": table_type})
    for i, fd in enumerate(fields):
        col = ET.SubElement(root, "FieldDefn", {"index": str(i)})
        ET.SubElement(col, "Name").text = fd.name
        t = ET.SubElement(col, "Type",
                          {"typeAsString": _TYPE_NAME[fd.ftype]})
        t.text = str(fd.ftype)
        u = ET.SubElement(col, "Usage",
                          {"usageAsString": _USAGE_NAME.get(fd.usage, "")})
        u.text = str(fd.usage)
    for ri, row in enumerate(rows):
        r = ET.SubElement(root, "Row", {"index": str(ri)})
        for v in row:
            ET.SubElement(r, "F").text = str(v)
    return ET.tostring(root, encoding="unicode")


def parse_rat(xml: str) -> tuple[list[tuple], list[FieldDef], str]:
    """-> (rows, fields, table_type); values typed per the columns."""
    root = ET.fromstring(xml)
    if root.tag != "GDALRasterAttributeTable":
        raise ValueError("rat: not a GDALRasterAttributeTable document")
    table_type = root.get("tableType", "thematic")
    fields = []
    for col in root.findall("FieldDefn"):
        fields.append(FieldDef(
            col.findtext("Name", ""),
            int(col.findtext("Type", "0")),
            int(col.findtext("Usage", "0")),
        ))
    rows = []
    for r in sorted(root.findall("Row"), key=lambda e: int(e.get("index"))):
        vals = []
        for fd, f in zip(fields, r.findall("F")):
            txt = f.text or ""
            if fd.ftype == GFT_INTEGER:
                vals.append(int(txt))
            elif fd.ftype == GFT_REAL:
                vals.append(float(txt))
            else:
                vals.append(txt)
        rows.append(tuple(vals))
    return rows, fields, table_type
