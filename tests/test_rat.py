"""Raster Attribute Table (raster/rat.py): histogram reduction and
the gdal_rat.cpp PAM-XML serialize/parse roundtrip."""

import numpy as np
import pytest

from gdal_spark.raster import rat as R


def test_rat_from_band_counts_sums_partials(spark):
    counts = spark.createDataFrame(
        [(3, 10), (3, 5), (7, 2), (255, 1)],
        "value int, pixel_count long")
    pal = np.arange(256, dtype=np.uint8)[:, None].repeat(3, 1)
    df, fields = R.rat_from_band_counts(counts, pal)
    rows = {r["value"]: r for r in df.collect()}
    assert len(rows) == 256
    assert rows[3]["pixel_count"] == 15
    assert rows[7]["pixel_count"] == 2
    assert rows[0]["pixel_count"] == 0          # absent -> 0
    assert rows[255]["name"] == "class_255"
    assert (rows[9]["red"], rows[9]["green"], rows[9]["blue"]) == (9, 9, 9)
    assert [f.usage for f in fields] == [
        R.GFU["MinMax"], R.GFU["PixelCount"], R.GFU["Name"],
        R.GFU["Red"], R.GFU["Green"], R.GFU["Blue"]]


def test_xml_roundtrip_matches_reference_shape():
    fields = R.PALETTED_RAT_FIELDS
    rows = [(0, 12, "class_0", 0, 0, 0), (1, 7, "class_1", 1, 1, 1)]
    xml = R.serialize_rat(rows, fields)
    # reference Serialize() structure (gdal_rat.cpp:598)
    assert xml.startswith(
        '<GDALRasterAttributeTable tableType="thematic">')
    assert '<FieldDefn index="0"><Name>Value</Name>' in xml
    assert '<Type typeAsString="Integer">0</Type>' in xml
    assert '<Usage usageAsString="MinMax">5</Usage>' in xml
    assert '<Row index="1"><F>1</F><F>7</F><F>class_1</F>' in xml
    back_rows, back_fields, ttype = R.parse_rat(xml)
    assert back_rows == rows
    assert back_fields == fields
    assert ttype == "thematic"


def test_parse_rat_types_and_loudness():
    xml = (
        '<GDALRasterAttributeTable tableType="athematic">'
        '<FieldDefn index="0"><Name>Min</Name><Type>1</Type>'
        "<Usage>3</Usage></FieldDefn>"
        '<FieldDefn index="1"><Name>Label</Name><Type>2</Type>'
        "<Usage>2</Usage></FieldDefn>"
        '<Row index="0"><F>0.5</F><F>low</F></Row>'
        "</GDALRasterAttributeTable>")
    rows, fields, ttype = R.parse_rat(xml)
    assert ttype == "athematic"
    assert rows == [(0.5, "low")]
    assert fields[0].ftype == R.GFT_REAL
    with pytest.raises(ValueError):
        R.parse_rat("<NotARat/>")
