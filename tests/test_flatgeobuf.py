"""FlatGeobuf source/sink (sources/flatgeobuf.py). Reference:
ogr/ogrsf_frmts/flatgeobuf/ — packedrtree.{h,cpp} for the Hilbert
curve + packed index, geometrywriter.cpp for geometry encoding."""

import struct

import numpy as np
import pytest

from gdal_spark.geo.wkb import (
    parse_wkb,
    wkb_linestring,
    wkb_multipolygon,
    wkb_point,
    wkb_polygon,
)
from gdal_spark.sources.flatgeobuf import (
    MAGIC,
    _build_rtree,
    _level_bounds,
    _NODE_DT,
    hilbert_u32,
    read_fgb,
    write_fgb,
)


def sq(x0, y0, s):
    return np.array(
        [[x0, y0], [x0 + s, y0], [x0 + s, y0 + s], [x0, y0 + s], [x0, y0]],
        dtype=float,
    )


class TestHilbert:
    def test_reference_bit_twiddle_values(self):
        # hand-checked against the packedrtree.cpp transform: the
        # curve starts at (0,0)=0 and adjacent cells differ by 1
        h = hilbert_u32(np.array([0, 0, 1, 1]), np.array([0, 1, 1, 0]))
        assert h[0] == 0
        assert sorted(h.tolist()) == [0, 1, 2, 3]

    def test_locality(self):
        # consecutive hilbert values are adjacent cells
        xs = np.arange(256, dtype=np.uint32)
        ys = np.zeros(256, dtype=np.uint32)
        h = hilbert_u32(xs, ys)
        assert len(set(h.tolist())) == 256

    def test_full_curve_is_a_bijection_on_16x16(self):
        g = np.arange(16, dtype=np.uint32)
        X, Y = np.meshgrid(g, g)
        h = hilbert_u32(X.ravel() * 4096, Y.ravel() * 4096)
        assert len(set(h.tolist())) == 256


class TestPackedRTree:
    def test_level_bounds_match_reference_shape(self):
        # numItems=100, nodeSize=16: levels 100, 7, 1 bottom-up
        bounds, num = _level_bounds(100, 16)
        assert num == 108
        assert bounds[0] == (8, 108)   # leaves last (top-down storage)
        assert bounds[1] == (1, 8)
        assert bounds[2] == (0, 1)

    def test_parent_extents_cover_children(self):
        leaves = np.zeros(40, dtype=_NODE_DT)
        rng = np.random.default_rng(2)
        leaves["minx"] = rng.uniform(0, 100, 40)
        leaves["miny"] = rng.uniform(0, 100, 40)
        leaves["maxx"] = leaves["minx"] + 1
        leaves["maxy"] = leaves["miny"] + 1
        leaves["off"] = np.arange(40) * 100
        buf = _build_rtree(leaves, 16)
        nodes = np.frombuffer(buf, dtype=_NODE_DT)
        root = nodes[0]
        assert root["minx"] == leaves["minx"].min()
        assert root["maxy"] == leaves["maxy"].max()
        # root's offset points at its first child node (byte offset)
        assert root["off"] == 1 * 40


class TestRoundtrip:
    @pytest.fixture()
    def df(self, spark):
        rows = []
        for i in range(57):
            x0, y0 = (i * 13) % 100, (i * 7) % 100
            rings = [sq(x0, y0, 5.0)]
            if i % 3 == 0:
                rings.append(sq(x0 + 1, y0 + 1, 1.0)[::-1].copy())
            rows.append(
                (i, float(i) * 1.5, f"name_{i}",
                 bytearray(wkb_polygon(rings)))
            )
        return spark.createDataFrame(
            rows, "fid long, score double, label string, geometry binary"
        ), rows

    def test_polygon_roundtrip_byte_exact(self, spark, df, tmp_path):
        frame, rows = df
        path = str(tmp_path / "t.fgb")
        write_fgb(frame, path, geometry_type="Polygon")
        with open(path, "rb") as f:
            assert f.read(8) == MAGIC
        got = {r.fid: r for r in read_fgb(spark, path, 4).collect()}
        assert len(got) == 57
        for i in range(57):
            assert bytes(got[i].geometry) == bytes(rows[i][3])
            assert got[i].score == i * 1.5
            assert got[i].label == f"name_{i}"

    def test_hilbert_sorted_feature_order(self, spark, df, tmp_path):
        frame, _rows = df
        path = str(tmp_path / "t.fgb")
        write_fgb(frame, path, geometry_type="Polygon")
        # leaf offsets in the index must be strictly increasing (the
        # features were written in hilbert order)
        from gdal_spark.sources.flatgeobuf import _read_header

        _gt, n, node_size, _c, idx_off, _f = _read_header(path)
        bounds, _num = _level_bounds(n, node_size)
        with open(path, "rb") as f:
            f.seek(idx_off + bounds[0][0] * 40)
            leaves = np.frombuffer(f.read(n * 40), dtype=_NODE_DT)
        assert (np.diff(leaves["off"].astype(np.int64)) > 0).all()

    def test_other_geometry_types(self, spark, tmp_path):
        rows = [
            (0, bytearray(wkb_point(3.5, -2.25))),
            (1, bytearray(wkb_point(10.0, 4.0))),
        ]
        d = spark.createDataFrame(rows, "fid long, geometry binary")
        p = str(tmp_path / "pt.fgb")
        write_fgb(d, p, geometry_type="Point")
        back = {r.fid: bytes(r.geometry) for r in read_fgb(spark, p).collect()}
        assert back == {i: bytes(b) for i, b in rows}

        ln = bytearray(
            wkb_linestring(np.array([[0, 0], [3, 4], [9, 1]], dtype=float))
        )
        d2 = spark.createDataFrame([(0, ln)], "fid long, geometry binary")
        p2 = str(tmp_path / "ln.fgb")
        write_fgb(d2, p2, geometry_type="LineString")
        assert bytes(read_fgb(spark, p2).collect()[0].geometry) == bytes(ln)

        mp = bytearray(
            wkb_multipolygon([[sq(0, 0, 2)], [sq(5, 5, 3), sq(6, 6, 1)[::-1].copy()]])
        )
        d3 = spark.createDataFrame([(0, mp)], "fid long, geometry binary")
        p3 = str(tmp_path / "mp.fgb")
        write_fgb(d3, p3, geometry_type="MultiPolygon")
        assert bytes(read_fgb(spark, p3).collect()[0].geometry) == bytes(mp)

    def test_null_attr(self, spark, tmp_path):
        d = spark.createDataFrame(
            [(0, None, bytearray(wkb_point(1, 2)))],
            "fid long, label string, geometry binary",
        )
        p = str(tmp_path / "n.fgb")
        write_fgb(d, p, geometry_type="Point")
        r = read_fgb(spark, p).collect()[0]
        assert r.label is None and r.fid == 0
