"""PGDump source/sink (sources/pgdump.py) vs
ogr/ogrsf_frmts/pgdump/ogrpgdumplayer.cpp COPY + EWKB semantics."""

import numpy as np
import pytest

from gdal_spark.geo.wkb import parse_wkb, wkb_polygon
from gdal_spark.sources.pgdump import (
    hex_ewkb,
    parse_hex_ewkb,
    read_pgdump,
    write_pgdump,
)


def _square():
    ring = np.array([[0.0, 0.0], [4.0, 0.0], [4.0, 4.0], [0.0, 4.0],
                     [0.0, 0.0]])
    return wkb_polygon([ring])


def test_hex_ewkb_flag_and_srid():
    wkb = _square()
    hx = hex_ewkb(wkb, 4326)
    # little-endian: type word carries the 0x20000000 flag
    assert hx[:2] == "01"
    assert int.from_bytes(bytes.fromhex(hx[2:10]), "little") == (
        3 | 0x20000000
    )
    assert int.from_bytes(bytes.fromhex(hx[10:18]), "little") == 4326
    back, srid = parse_hex_ewkb(hx)
    assert back == wkb and srid == 4326


def test_plain_wkb_hex_parses_without_srid():
    wkb = _square()
    back, srid = parse_hex_ewkb(wkb.hex().upper())
    assert back == wkb and srid is None


def test_roundtrip_with_nulls_and_escapes(spark, tmp_path):
    rows = [
        (1, "plain", _square()),
        (2, None, _square()),
        (3, "tab\there\nand newline", _square()),
    ]
    df = spark.createDataFrame(
        rows, "fid long, kind string, geometry binary"
    )
    path = str(tmp_path / "dump.sql")
    write_pgdump(df, path, layer="t", srid=3857)
    text = open(path).read()
    assert 'CREATE TABLE "t"' in text
    assert "FROM STDIN;" in text and "\\." in text
    assert "\\N" in text                    # the null
    assert "tab\\there" in text             # escaped tab
    back = {
        r["fid"]: r
        for r in read_pgdump(spark, path, "fid long, kind string")
        .collect()
    }
    assert back[2]["kind"] is None
    assert back[3]["kind"] == "tab\there\nand newline"
    assert back[1]["srid"] == 3857
    g = parse_wkb(bytes(back[1]["geometry"]))
    assert g.type_id == 3
