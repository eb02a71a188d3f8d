"""GMT + JML vector formats (sources/gmt.py, sources/jml.py)."""

import numpy as np
import pytest

from gdal_spark.geo.wkb import parse_wkb, wkb_polygon
from gdal_spark.sources.gmt import read_gmt, write_gmt
from gdal_spark.sources.jml import read_jml, write_jml


def _df(spark):
    outer = np.array([[0.0, 0.0], [8.0, 0.0], [8.0, 8.0], [0.0, 8.0],
                      [0.0, 0.0]])
    hole = np.array([[2.0, 2.0], [2.0, 4.0], [4.0, 4.0], [4.0, 2.0],
                     [2.0, 2.0]])
    rows = [
        (1, 10, "residential", wkb_polygon([outer])),
        (2, 20, None, wkb_polygon([outer, hole])),   # holed + null attr
    ]
    return spark.createDataFrame(
        rows, "fid long, eas_id long, kind string, geometry binary"
    )


@pytest.mark.parametrize("writer,reader,ext", [
    (write_gmt, read_gmt, "gmt"), (write_jml, read_jml, "jml"),
])
def test_roundtrip_with_holes_and_nulls(spark, tmp_path, writer,
                                        reader, ext):
    path = str(tmp_path / f"z.{ext}")
    writer(_df(spark), path)
    back = {
        r["fid"]: r
        for r in reader(spark, path,
                        "fid long, eas_id long, kind string").collect()
    }
    assert back[1]["kind"] == "residential"
    assert back[2]["kind"] is None
    g = parse_wkb(bytes(back[2]["geometry"]))
    assert g.type_id == 3 and len(g.parts) == 2   # hole preserved
    assert back[1]["eas_id"] == 10


def test_gmt_layout(spark, tmp_path):
    path = str(tmp_path / "z.gmt")
    write_gmt(_df(spark), path)
    text = open(path).read()
    assert text.startswith("# @VGMT1.0 @GPOLYGON")
    assert "# @Nfid|eas_id|kind" in text
    assert "# @Tinteger|integer|string" in text
    assert "# @H" in text        # the hole ring marker
    assert text.count(">\n") == 2


def test_jml_layout(spark, tmp_path):
    path = str(tmp_path / "z.jml")
    write_jml(_df(spark), path)
    text = open(path).read()
    assert "<JCSGMLInputTemplate>" in text
    assert '<valueElement elementName="property"' in text
    assert "innerBoundaryIs" in text
    assert '<property name="kind">residential</property>' in text
