"""PolyhedralSurface / TIN / Triangle WKB (ISO SQL/MM surface types).

Semantics re-derived from the reference:

- type codes: /root/reference/ogr/ogr_core.h:437-442
  (wkbPolyhedralSurface=15, wkbTIN=16, wkbTriangle=17; ISO Z variants
  +1000); wire form is a collection header over polygon/triangle
  patches, triangles being 4-point single-ring polygons.
- CastToMultiPolygon: /root/reference/ogr/ogrpolyhedralsurface.cpp:700
  (each patch re-tagged as a Polygon inside a MultiPolygon) — the
  "demotion" every 2D pipeline entry point uses; here it also drops Z
  because the engine's vector schema is 2D WKB (documented).
- get_Area: ogrpolyhedralsurface.cpp:610 delegates to SFCGAL's
  3D surface area (sum of patch areas IN THEIR PLANES) —
  re-expressed below as Newell-normal magnitude per ring (|n|/2),
  holes subtracted, which is exact for planar patches and matches
  the cross-product form exactly for triangles.

Z handling: XY-only surfaces parse too (has_z=False, z arrays zero);
the 3D area then equals the projected area.
"""

from __future__ import annotations

import struct

import numpy as np

from gdal_spark.geo.wkb import wkb_multipolygon

__all__ = [
    "WKB_POLYHEDRALSURFACE", "WKB_TIN", "WKB_TRIANGLE",
    "Surface", "parse_surface", "wkb_surface",
    "cast_to_multipolygon", "surface_area_3d",
]

WKB_POLYHEDRALSURFACE = 15
WKB_TIN = 16
WKB_TRIANGLE = 17
_Z = 1000           # ISO SQL/MM Z offset (wkb25DBitInternalUse aside)


class Surface:
    """patches: list of rings-lists; each ring an (N, 3) float array
    (z = 0 for XY input)."""

    __slots__ = ("type_id", "has_z", "patches")

    def __init__(self, type_id: int, has_z: bool, patches):
        self.type_id = type_id
        self.has_z = has_z
        self.patches = patches


def _ring3(ring: np.ndarray) -> np.ndarray:
    r = np.asarray(ring, dtype=np.float64)
    if r.shape[1] == 2:
        r = np.column_stack([r, np.zeros(len(r))])
    if not np.array_equal(r[0], r[-1]):
        r = np.vstack([r, r[:1]])
    return r


def wkb_surface(type_id: int, patches, has_z: bool = True) -> bytes:
    """Emit a PolyhedralSurface(15)/TIN(16) over patch ring lists.
    TIN patches are emitted as Triangle(17) sub-geometries (single
    4-point ring each, enforced)."""
    if type_id not in (WKB_POLYHEDRALSURFACE, WKB_TIN):
        raise ValueError("wkb_surface: type must be 15 or 16")
    sub_t = WKB_TRIANGLE if type_id == WKB_TIN else 3
    code = type_id + (_Z if has_z else 0)
    sub_code = sub_t + (_Z if has_z else 0)
    out = [struct.pack("<BII", 1, code, len(patches))]
    for rings in patches:
        rr = [_ring3(r) for r in rings]
        if type_id == WKB_TIN:
            if len(rr) != 1 or len(rr[0]) != 4:
                raise ValueError("wkb_surface: TIN patch must be one "
                                 "4-point ring")
        out.append(struct.pack("<BII", 1, sub_code, len(rr)))
        for r in rr:
            out.append(struct.pack("<I", len(r)))
            out.append((r[:, :3] if has_z else r[:, :2])
                       .astype("<f8").tobytes())
    return b"".join(out)


def parse_surface(buf: bytes) -> Surface:
    bo = "<" if buf[0] == 1 else ">"
    (code,) = struct.unpack_from(bo + "I", buf, 1)
    has_z = code >= _Z
    tid = code % _Z
    if tid not in (WKB_POLYHEDRALSURFACE, WKB_TIN):
        raise ValueError(f"surface: type {code} is not a "
                         "PolyhedralSurface/TIN")
    (n,) = struct.unpack_from(bo + "I", buf, 5)
    off = 9
    dim = 3 if has_z else 2
    patches = []
    for _ in range(n):
        sbo = "<" if buf[off] == 1 else ">"
        (scode,) = struct.unpack_from(sbo + "I", buf, off + 1)
        stid = scode % _Z
        if stid not in (3, WKB_TRIANGLE):
            raise ValueError(f"surface: patch type {scode} is not a "
                             "Polygon/Triangle")
        if (scode >= _Z) != has_z:
            raise ValueError("surface: mixed-dimension patches")
        (nr,) = struct.unpack_from(sbo + "I", buf, off + 5)
        off += 9
        rings = []
        for _r in range(nr):
            (npt,) = struct.unpack_from(sbo + "I", buf, off)
            off += 4
            flat = np.frombuffer(buf, dtype=sbo + "f8",
                                 count=npt * dim, offset=off)
            off += npt * dim * 8
            pts = flat.reshape(npt, dim).astype(np.float64)
            rings.append(_ring3(pts))
        if stid == WKB_TRIANGLE and (nr != 1 or len(rings[0]) != 4):
            raise ValueError("surface: malformed Triangle patch")
        patches.append(rings)
    return Surface(tid, has_z, patches)


def cast_to_multipolygon(s: Surface) -> bytes:
    """OGRPolyhedralSurface::CastToMultiPolygonImpl: each patch keeps
    its rings and becomes a Polygon inside a MultiPolygon (2D WKB
    here: Z dropped, the engine's vector schema)."""
    return wkb_multipolygon([[r[:, :2] for r in rings]
                             for rings in s.patches])


def _newell_norm(ring: np.ndarray) -> float:
    """|Newell normal| = 2 * planar-patch area (exact cross-product
    area for triangles)."""
    a, b = ring[:-1], ring[1:]
    n = np.cross(a, b).sum(axis=0)
    return float(np.sqrt((n * n).sum()))


def surface_area_3d(s: Surface) -> float:
    """SFCGAL area_3d semantics (ogrpolyhedralsurface.cpp:610): sum
    of patch areas in their own planes, patch holes subtracted."""
    total = 0.0
    for rings in s.patches:
        total += _newell_norm(rings[0]) / 2.0
        for hole in rings[1:]:
            total -= _newell_norm(hole) / 2.0
    return total
