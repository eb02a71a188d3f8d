"""MVT wire format (sources/mvt.py) vs mvt_tile.h field constants
and the public MVT 2.1 command/zigzag rules."""

from gdal_spark.sources.mvt import (
    _cmd,
    decode_mvt_tile,
    encode_mvt_tile,
)


def _tile(feats):
    return decode_mvt_tile(encode_mvt_tile({"l": feats}))["l"]


def test_command_integer():
    assert _cmd(1, 1) == 9          # MoveTo x1 (spec example)
    assert _cmd(2, 3) == 26         # LineTo x3
    assert _cmd(7, 1) == 15         # ClosePath


def test_polygon_roundtrip_closing_vertex_omitted():
    ring = [(0, 0), (100, 0), (100, 100), (0, 100)]
    out = _tile([{"id": 1, "type": 3, "parts": [ring], "props": {}}])
    f = out["features"][0]
    assert f["parts"] == [ring]
    assert out["extent"] == 4096


def test_cursor_persists_across_parts():
    # second ring deltas are relative to the first ring's last vertex
    parts = [[(10, 10), (20, 10), (20, 20)], [(5, 5), (8, 5), (8, 9)]]
    out = _tile([{"id": 1, "type": 3, "parts": parts, "props": {}}])
    assert out["features"][0]["parts"] == parts


def test_multipoint_single_moveto():
    pts = [[(1, 2), (3, 4), (-5, -6)]]
    out = _tile([{"id": 2, "type": 1, "parts": pts, "props": {}}])
    assert out["features"][0]["parts"] == pts


def test_value_types_dedup():
    feats = [
        {"id": 1, "type": 1, "parts": [[(0, 0)]],
         "props": {"s": "x", "n": -7, "d": 2.5, "b": True}},
        {"id": 2, "type": 1, "parts": [[(1, 1)]],
         "props": {"s": "x", "n": -7}},      # same values -> dedup
    ]
    buf = encode_mvt_tile({"l": feats})
    out = decode_mvt_tile(buf)["l"]
    assert out["features"][0]["props"] == {
        "s": "x", "n": -7, "d": 2.5, "b": True
    }
    assert out["features"][1]["props"] == {"s": "x", "n": -7}
    # the shared string value appears once in the layer values table
    # (use a marker long enough not to collide with wire bytes)
    feats2 = [
        {"id": 1, "type": 1, "parts": [[(0, 0)]],
         "props": {"s": "MARKER_STRING"}},
        {"id": 2, "type": 1, "parts": [[(1, 1)]],
         "props": {"s": "MARKER_STRING"}},
    ]
    buf2 = encode_mvt_tile({"l": feats2})
    assert buf2.count(b"MARKER_STRING") == 1


def test_multiple_layers():
    buf = encode_mvt_tile(
        {
            "a": [{"id": 1, "type": 1, "parts": [[(0, 0)]], "props": {}}],
            "b": [{"id": 2, "type": 1, "parts": [[(9, 9)]], "props": {}}],
        }
    )
    out = decode_mvt_tile(buf)
    assert set(out) == {"a", "b"}
    assert out["b"]["features"][0]["parts"] == [[(9, 9)]]
