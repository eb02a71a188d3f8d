"""Arrow IPC (Feather v2) vector format (sources/arrowipc.py)."""

import json

import numpy as np
import pyarrow as pa
import pytest

from gdal_spark.geo.wkb import parse_wkb, wkb_polygon
from gdal_spark.sources.arrowipc import read_arrow_ipc, write_arrow_ipc


def _df(spark, n=2):
    outer = np.array([[0.0, 0.0], [8.0, 0.0], [8.0, 8.0], [0.0, 8.0],
                      [0.0, 0.0]])
    hole = np.array([[2.0, 2.0], [2.0, 4.0], [4.0, 4.0], [4.0, 2.0],
                     [2.0, 2.0]])
    rows = [
        (1, 10, "residential", wkb_polygon([outer])),
        (2, 20, None, wkb_polygon([outer, hole])),
    ]
    for i in range(3, n + 1):
        rows.append((i, 10 * i, f"k{i}", wkb_polygon([outer + i])))
    return spark.createDataFrame(
        rows, "fid long, eas_id long, kind string, geometry binary"
    )


def test_roundtrip_with_holes_and_nulls(spark, tmp_path):
    path = str(tmp_path / "z.arrow")
    write_arrow_ipc(_df(spark), path)
    back = {r["fid"]: r for r in read_arrow_ipc(spark, path).collect()}
    assert back[1]["kind"] == "residential"
    assert back[2]["kind"] is None
    g = parse_wkb(bytes(back[2]["geometry"]))
    assert g.type_id == 3 and len(g.parts) == 2   # hole preserved
    assert back[1]["eas_id"] == 10


def test_multi_batch_distributed_read(spark, tmp_path):
    path = str(tmp_path / "many.arrow")
    write_arrow_ipc(_df(spark, 23), path, batch_rows=5)
    with pa.OSFile(path, "rb") as fh:
        assert pa.ipc.open_file(fh).num_record_batches == 5
    back = read_arrow_ipc(spark, path)
    assert back.rdd.getNumPartitions() >= 5   # one task per batch
    got = sorted(r["fid"] for r in back.collect())
    assert got == list(range(1, 24))


def test_geo_metadata_and_extension_name(spark, tmp_path):
    path = str(tmp_path / "z.arrow")
    write_arrow_ipc(_df(spark), path)
    with pa.OSFile(path, "rb") as fh:
        schema = pa.ipc.open_file(fh).schema
    geo = json.loads(schema.metadata[b"geo"])
    assert geo["primary_column"] == "geometry"
    assert geo["columns"]["geometry"]["encoding"] == "WKB"
    f = schema.field("geometry")
    assert f.metadata[b"ARROW:extension:name"] == b"geoarrow.wkb"


def test_extension_name_fallback_without_geo_key(spark, tmp_path):
    # a foreign writer that only sets ogc.wkb must still be readable
    # (ograrrowlayer.hpp:1011 accepts either extension name)
    path = str(tmp_path / "foreign.arrow")
    fields = [
        pa.field("fid", pa.int64()),
        pa.field("wkbgeom", pa.binary(),
                 metadata={b"ARROW:extension:name": b"ogc.wkb"}),
    ]
    outer = np.array([[0.0, 0.0], [1.0, 0.0], [1.0, 1.0], [0.0, 0.0]])
    tab = pa.table(
        {"fid": [7], "wkbgeom": [wkb_polygon([outer])]},
        schema=pa.schema(fields),
    )
    with pa.OSFile(path, "wb") as sink:
        with pa.ipc.new_file(sink, tab.schema) as w:
            w.write_table(tab)
    back = read_arrow_ipc(spark, path).collect()
    assert back[0]["fid"] == 7
    assert "geometry" in read_arrow_ipc(spark, path).columns


def test_reader_raises_without_any_geometry_marker(spark, tmp_path):
    path = str(tmp_path / "plain.arrow")
    tab = pa.table({"a": [1, 2]})
    with pa.OSFile(path, "wb") as sink:
        with pa.ipc.new_file(sink, tab.schema) as w:
            w.write_table(tab)
    with pytest.raises(ValueError, match="no geo metadata"):
        read_arrow_ipc(spark, path)


def test_stream_variant_distributed_spans(spark, tmp_path):
    from gdal_spark.sources.arrowipc import (
        read_arrow_stream, write_arrow_stream,
    )

    path = str(tmp_path / "many.arrows")
    write_arrow_stream(_df(spark, 23), path, batch_rows=5)
    back = read_arrow_stream(spark, path)
    got = sorted(r["fid"] for r in back.collect())
    assert got == list(range(1, 24))
    assert back.rdd.getNumPartitions() >= 5    # one task per batch span
    g = parse_wkb(bytes(
        {r["fid"]: r for r in back.collect()}[2]["geometry"]))
    assert g.type_id == 3 and len(g.parts) == 2


def test_stream_has_no_footer_but_same_metadata(spark, tmp_path):
    from gdal_spark.sources.arrowipc import write_arrow_stream

    path = str(tmp_path / "z.arrows")
    write_arrow_stream(_df(spark), path)
    with pa.OSFile(path, "rb") as fh:
        with pytest.raises(pa.lib.ArrowInvalid):
            pa.ipc.open_file(fh)           # not the footer format
    with pa.OSFile(path, "rb") as fh:
        schema = pa.ipc.open_stream(fh).schema
    assert schema.field("geometry").metadata[
        b"ARROW:extension:name"] == b"geoarrow.wkb"
    assert b"geo" in schema.metadata
