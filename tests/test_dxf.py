"""DXF source/sink (sources/dxf.py) — entity grammar + handles
(ogr/ogrsf_frmts/dxf)."""

import numpy as np

from gdal_spark.geo import wkb as wkbmod
from gdal_spark.sources.dxf import read_dxf, write_dxf


def test_roundtrip_entities(spark, tmp_path):
    ring = np.array([(0.0, 0.0), (4.0, 0.0), (4.0, 3.0), (0.0, 0.0)])
    rows = [
        ("pts", "A1", bytearray(wkbmod.wkb_point(1.0 / 3.0, -2.25))),
        ("lns", "A2", bytearray(wkbmod.wkb_linestring(
            np.array([(0.0, 0.0), (2.0, 5.0)])))),       # 2 pts -> LINE
        ("lns", "A3", bytearray(wkbmod.wkb_linestring(
            np.array([(0.0, 0.0), (1.0, 1.0), (2.0, 0.0)])))),  # open LWP
        ("rng", "A4", bytearray(wkbmod.wkb_linestring(ring))),  # closed
    ]
    df = spark.createDataFrame(
        rows, "layer string, entity_handle string, geometry binary"
    )
    path = str(tmp_path / "t.dxf")
    write_dxf(df, path, handle_col="entity_handle")
    back = read_dxf(spark, path).toPandas().set_index("entity_handle")
    assert len(back) == 4
    g1 = wkbmod.parse_wkb(bytes(back.loc["A1", "geometry"]))
    assert tuple(g1.parts[0][0]) == (1.0 / 3.0, -2.25)   # repr-exact
    g2 = wkbmod.parse_wkb(bytes(back.loc["A2", "geometry"]))
    assert len(g2.parts[0]) == 2
    g3 = wkbmod.parse_wkb(bytes(back.loc["A3", "geometry"]))
    assert len(g3.parts[0]) == 3
    assert not np.array_equal(g3.parts[0][0], g3.parts[0][-1])
    g4 = wkbmod.parse_wkb(bytes(back.loc["A4", "geometry"]))
    assert np.array_equal(g4.parts[0][0], g4.parts[0][-1])  # re-closed
    assert len(g4.parts[0]) == 4
    assert back.loc["A4", "layer"] == "rng"


def test_foreign_minimal_file_and_skips(spark, tmp_path):
    doc = "\n".join([
        "0", "SECTION", "2", "HEADER", "0", "ENDSEC",
        "0", "SECTION", "2", "ENTITIES",
        "0", "CIRCLE", "5", "FF", "8", "c", "10", "0", "20", "0", "40", "5",
        "0", "POINT", "5", "2A", "8", "lyr", "10", "7.5", "20", "-1.25",
        "0", "ENDSEC", "0", "EOF",
    ]) + "\n"
    (tmp_path / "f.dxf").write_text(doc)
    back = read_dxf(spark, str(tmp_path / "f.dxf")).collect()
    assert len(back) == 1                      # CIRCLE skipped, like
    assert back[0]["layer"] == "lyr"           # the reference warns
    assert back[0]["entity_handle"] == "2A"
    g = wkbmod.parse_wkb(bytes(back[0]["geometry"]))
    assert tuple(g.parts[0][0]) == (7.5, -1.25)
