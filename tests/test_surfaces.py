"""PolyhedralSurface/TIN WKB (geo/surfaces.py) — wire roundtrips,
CastToMultiPolygon demotion, SFCGAL-semantics 3D area."""

import numpy as np
import pytest

from gdal_spark.geo import surfaces as S
from gdal_spark.geo.wkb import parse_wkb


def _unit_box_surface():
    """The 6 quad faces of the unit cube as a PolyhedralSurface."""
    q = [
        [(0, 0, 0), (0, 1, 0), (1, 1, 0), (1, 0, 0)],   # bottom
        [(0, 0, 1), (1, 0, 1), (1, 1, 1), (0, 1, 1)],   # top
        [(0, 0, 0), (1, 0, 0), (1, 0, 1), (0, 0, 1)],
        [(1, 0, 0), (1, 1, 0), (1, 1, 1), (1, 0, 1)],
        [(1, 1, 0), (0, 1, 0), (0, 1, 1), (1, 1, 1)],
        [(0, 1, 0), (0, 0, 0), (0, 0, 1), (0, 1, 1)],
    ]
    return [[np.array(f, dtype=float)] for f in q]


def test_polyhedralsurface_roundtrip_and_area():
    blob = S.wkb_surface(S.WKB_POLYHEDRALSURFACE, _unit_box_surface())
    s = S.parse_surface(blob)
    assert s.type_id == S.WKB_POLYHEDRALSURFACE and s.has_z
    assert len(s.patches) == 6
    # cube surface area = 6 (SFCGAL area_3d semantics)
    assert S.surface_area_3d(s) == pytest.approx(6.0, rel=1e-12)
    # re-emit is byte-identical (closed rings, LE)
    assert S.wkb_surface(S.WKB_POLYHEDRALSURFACE, s.patches) == blob


def test_tin_roundtrip_and_demotion():
    tris = [
        [np.array([(0, 0, 0), (2, 0, 0), (0, 2, 0), (0, 0, 0)],
                  dtype=float)],
        [np.array([(2, 0, 0), (2, 2, 2), (0, 2, 0), (2, 0, 0)],
                  dtype=float)],
    ]
    blob = S.wkb_surface(S.WKB_TIN, tris)
    s = S.parse_surface(blob)
    assert s.type_id == S.WKB_TIN
    mp = parse_wkb(S.cast_to_multipolygon(s))
    assert mp.type_id == 6 and len(mp.polys) == 2
    # projected (demoted) triangles keep XY
    assert np.array_equal(mp.polys[0][0][:, 0], [0, 2, 0, 0])
    # 3D area: flat tri = 2; slanted tri cross((0,2,2),(-2,2,0))/2
    slant = np.linalg.norm(np.cross([0, 2, 2], [-2, 2, 0])) / 2
    assert S.surface_area_3d(s) == pytest.approx(2.0 + slant, rel=1e-12)


def test_xy_surface_parses_with_zero_z():
    tris = [[np.array([(0, 0), (1, 0), (0, 1), (0, 0)], dtype=float)]]
    blob = S.wkb_surface(S.WKB_TIN, tris, has_z=False)
    s = S.parse_surface(blob)
    assert not s.has_z
    assert S.surface_area_3d(s) == pytest.approx(0.5)


def test_patch_holes_subtract():
    outer = np.array([(0, 0, 0), (4, 0, 0), (4, 4, 0), (0, 4, 0),
                      (0, 0, 0)], dtype=float)
    hole = np.array([(1, 1, 0), (2, 1, 0), (2, 2, 0), (1, 1, 0)],
                    dtype=float)
    blob = S.wkb_surface(S.WKB_POLYHEDRALSURFACE, [[outer, hole]])
    s = S.parse_surface(blob)
    assert S.surface_area_3d(s) == pytest.approx(16.0 - 0.5, rel=1e-12)


def test_big_endian_parses():
    import struct

    tris = [[np.array([(0, 0, 0), (1, 0, 0), (0, 1, 0), (0, 0, 0)],
                      dtype=float)]]
    le = S.wkb_surface(S.WKB_TIN, tris)
    # hand-build the big-endian form of the same surface
    be = struct.pack(">BII", 0, 1016, 1)
    be += struct.pack(">BII", 0, 1017, 1) + struct.pack(">I", 4)
    be += np.array(tris[0][0], dtype=">f8").tobytes()
    s = S.parse_surface(be)
    assert S.cast_to_multipolygon(s) == S.cast_to_multipolygon(
        S.parse_surface(le))


def test_malformed_is_loud():
    with pytest.raises(ValueError, match="4-point"):
        S.wkb_surface(S.WKB_TIN, [[np.array(
            [(0, 0, 0), (1, 0, 0), (1, 1, 0), (0, 1, 0), (0, 0, 0)],
            dtype=float)]])
    with pytest.raises(ValueError, match="not a"):
        S.parse_surface(b"\x01" + (6).to_bytes(4, "little") + b"\x00" * 4)
