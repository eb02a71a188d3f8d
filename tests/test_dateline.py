"""Antimeridian wrapping (geo/dateline.py) — ogr2ogr -wrapdateline
semantics (ogr/ogrgeometryfactory.cpp WRAPDATELINE)."""

import numpy as np
import pytest

from gdal_spark.geo.dateline import (
    split_line_at_dateline,
    unwrap_lons,
    wrap_dateline_wkb,
)
from gdal_spark.geo.wkb import (
    parse_wkb,
    wkb_linestring,
    wkb_point,
    wkb_polygon,
)


def test_unwrap_east_and_west():
    e = unwrap_lons(np.array([[172.0, 0], [-172.0, 0], [-160.0, 0]]))
    assert e[:, 0].tolist() == [172.0, 188.0, 200.0]
    w = unwrap_lons(np.array([[-175.0, 0], [175.0, 0]]))
    assert w[:, 0].tolist() == [-175.0, -185.0]


def test_split_exact_interpolation():
    pieces = split_line_at_dateline(np.array([[172.0, 0.0], [-172.0, 8.0]]))
    assert [p.tolist() for p in pieces] == [
        [[172.0, 0.0], [180.0, 4.0]],
        [[-180.0, 4.0], [-172.0, 8.0]],
    ]


def test_split_no_crossing_identity():
    p = split_line_at_dateline(np.array([[10.0, 1.0], [20.0, 2.0]]))
    assert len(p) == 1 and p[0].tolist() == [[10.0, 1.0], [20.0, 2.0]]


def test_multiple_wraps():
    # spiral crossing the dateline twice -> three pieces
    line = np.array([[170.0, 0.0], [-170.0, 0.0], [-170.0, 1.0],
                     [170.0, 1.0], [160.0, 1.0]])
    # walk east across then back west across
    pieces = split_line_at_dateline(line)
    assert len(pieces) == 3
    for p in pieces:
        assert (np.abs(p[:, 0]) <= 180.0).all()


def test_polygon_split_preserves_area():
    ring = np.array([[176.0, 0.0], [-176.0, 0.0], [-176.0, 4.0],
                     [176.0, 4.0], [176.0, 0.0]])
    out = parse_wkb(wrap_dateline_wkb(wkb_polygon([ring])))
    assert out.type_id == 6 and len(out.polys) == 2
    areas = []
    for rings in out.polys:
        r = rings[0]
        x, y = r[:-1, 0], r[:-1, 1]
        areas.append(abs(np.dot(x, np.roll(y, -1))
                         - np.dot(y, np.roll(x, -1))) / 2)
    assert sorted(areas) == [16.0, 16.0]


def test_polygon_not_crossing_unchanged():
    ring = np.array([[10.0, 0.0], [20.0, 0.0], [20.0, 5.0],
                     [10.0, 5.0], [10.0, 0.0]])
    out = parse_wkb(wrap_dateline_wkb(wkb_polygon([ring])))
    assert out.type_id == 3
    assert out.parts[0].tolist() == ring.tolist()


def test_point_normalizes():
    g = parse_wkb(wrap_dateline_wkb(wkb_point(190.0, 3.0)))
    assert g.parts[0][0].tolist() == [-170.0, 3.0]
    g2 = parse_wkb(wrap_dateline_wkb(wkb_point(-541.0, 3.0)))
    assert g2.parts[0][0].tolist() == [179.0, 3.0]
