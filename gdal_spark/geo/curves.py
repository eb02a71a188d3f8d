"""Curve geometries (WKB types 8-12) + linearization.

Re-derives the reference's curve handling (ogr/ogr_core.h:407-517
type set; OGRGeometry::getLinearGeometry -> OGRGeometryFactory::
curveToLineString, ogr/ogrgeometryfactory.cpp:5439):

- CircularString (8): consecutive 3-point arcs (p0,p1,p2 / p2,p3,p4
  / ...); each arc strokes through its circle with a constant
  angular step derived from OGR_ARC_STEPSIZE (default 4 deg):
  per half-arc, nSteps = max(4, int(|dAlpha|/step + 0.5)), equal
  steps, original points added exactly, intermediate points at
  cx + R cos(a), cy + R sin(a) (OGRGeometryFactoryStrokeArc).
  Collinear triples degrade to straight segments.
  NOTE: we implement the deterministic ADD_INTERMEDIATE_POINT=TRUE
  variant; the reference's default "stealth" mode additionally hides
  the intermediate-point angle in low-order coordinate bits
  (ogrgeometryfactory.cpp:5550-5610), a lossless-roundtrip trick we
  intentionally skip (documented divergence).
- CompoundCurve (9): concatenation of LineString / CircularString
  components sharing endpoints.
- CurvePolygon (10): rings are curves; linearizes to Polygon.
- MultiCurve (11) / MultiSurface (12): containers.
"""

from __future__ import annotations

import math
import struct

import numpy as np

from gdal_spark.geo.wkb import (
    parse_wkb,
    wkb_linestring,
    wkb_polygon,
)

WKB_CIRCULARSTRING = 8
WKB_COMPOUNDCURVE = 9
WKB_CURVEPOLYGON = 10
WKB_MULTICURVE = 11
WKB_MULTISURFACE = 12

ARC_STEP_DEG = 4.0  # OGR_ARC_STEPSIZE default (GetDefaultArcStepSize)


def get_curve_parameters(
    x0, y0, x1, y1, x2, y2
) -> tuple[float, float, float, float, float, float] | None:
    """(cx, cy, R, alpha0, alpha1, alpha2) of the circle through the
    3 points with monotone alpha0 -> alpha1 -> alpha2, or None when
    collinear (ogrgeometryfactory.cpp GetCurveParameters)."""
    ax, ay = x1 - x0, y1 - y0
    bx, by = x2 - x0, y2 - y0
    den = 2.0 * (ax * by - ay * bx)
    if den == 0.0:
        return None
    aa = ax * ax + ay * ay
    bb = bx * bx + by * by
    ux = (by * aa - ay * bb) / den
    uy = (ax * bb - bx * aa) / den
    cx, cy = x0 + ux, y0 + uy
    R = math.hypot(ux, uy)
    a0 = math.atan2(y0 - cy, x0 - cx)
    a1 = math.atan2(y1 - cy, x1 - cx)
    a2 = math.atan2(y2 - cy, x2 - cx)
    # orient so the sweep passes through p1: same convention as the
    # reference (alpha1 between alpha0 and alpha2, monotone)
    if den > 0:  # counter-clockwise
        while a1 < a0:
            a1 += 2 * math.pi
        while a2 < a1:
            a2 += 2 * math.pi
    else:
        while a1 > a0:
            a1 -= 2 * math.pi
        while a2 > a1:
            a2 -= 2 * math.pi
    return cx, cy, R, a0, a1, a2


def _stroke(pts: list, cx, cy, R, a_from, a_to, step) -> None:
    """Append intermediate arc points strictly between a_from/a_to
    with the reference's equal-step rule (StrokeArc)."""
    if a_to == a_from:
        return
    sign = 1 if a_to > a_from else -1
    n_steps = int(abs((a_to - a_from) / step) + 0.5)
    if n_steps < 4:
        n_steps = 4
    d = sign * abs(a_to - a_from) / n_steps
    a = a_from + d
    while (a - a_to) * sign < -1e-8:
        pts.append((cx + R * math.cos(a), cy + R * math.sin(a)))
        a += d


def circular_to_points(coords: np.ndarray) -> np.ndarray:
    """Linearize a CircularString's coordinate array (odd count >= 3)
    to LineString vertices (curveToLineString semantics)."""
    step = math.radians(ARC_STEP_DEG)
    pts: list[tuple[float, float]] = [(float(coords[0, 0]), float(coords[0, 1]))]
    for k in range(0, len(coords) - 2, 2):
        x0, y0 = float(coords[k, 0]), float(coords[k, 1])
        x1, y1 = float(coords[k + 1, 0]), float(coords[k + 1, 1])
        x2, y2 = float(coords[k + 2, 0]), float(coords[k + 2, 1])
        par = get_curve_parameters(x0, y0, x1, y1, x2, y2)
        if par is None:  # collinear: straight segments
            pts.append((x1, y1))
            pts.append((x2, y2))
            continue
        cx, cy, R, a0, a1, a2 = par
        _stroke(pts, cx, cy, R, a0, a1, step)
        pts.append((x1, y1))
        _stroke(pts, cx, cy, R, a1, a2, step)
        pts.append((x2, y2))
    return np.asarray(pts, dtype=np.float64)


def _read_header(buf: bytes, off: int) -> tuple[str, int, int]:
    bo = "<" if buf[off] == 1 else ">"
    (tid,) = struct.unpack_from(f"{bo}I", buf, off + 1)
    return bo, tid % 1000, off + 5


def _read_points(buf: bytes, off: int, bo: str) -> tuple[np.ndarray, int]:
    (n,) = struct.unpack_from(f"{bo}I", buf, off)
    off += 4
    arr = np.frombuffer(buf, dtype=f"{'<' if bo == '<' else '>'}f8", count=2 * n, offset=off)
    return arr.reshape(n, 2).astype(np.float64), off + 16 * n


def _linearize_curve(buf: bytes, off: int) -> tuple[np.ndarray, int]:
    """One curve component (LineString 2 / CircularString 8 /
    CompoundCurve 9) -> vertex array + new offset."""
    bo, tid, off = _read_header(buf, off)
    if tid == 2:  # LineString
        return _read_points(buf, off, bo)
    if tid == WKB_CIRCULARSTRING:
        coords, off = _read_points(buf, off, bo)
        return circular_to_points(coords), off
    if tid == WKB_COMPOUNDCURVE:
        (n,) = struct.unpack_from(f"{bo}I", buf, off)
        off += 4
        parts = []
        for _ in range(n):
            pts, off = _linearize_curve(buf, off)
            # components share endpoints: drop the duplicated joint
            if parts and len(pts):
                pts = pts[1:]
            parts.append(pts)
        return np.concatenate(parts, axis=0), off
    raise ValueError(f"unsupported curve component type {tid}")


def linearize_wkb(buf: bytes) -> bytes:
    """Curve WKB -> linear WKB (getLinearGeometry). Linear inputs
    pass through unchanged."""
    bo, tid, off = _read_header(bytes(buf), 0)
    b = bytes(buf)
    if tid == WKB_CIRCULARSTRING or tid == WKB_COMPOUNDCURVE:
        pts, _ = _linearize_curve(b, 0)
        return wkb_linestring(pts)
    if tid == WKB_CURVEPOLYGON:
        (n,) = struct.unpack_from(f"{bo}I", b, off)
        off += 4
        rings = []
        for _ in range(n):
            pts, off = _linearize_curve(b, off)
            rings.append(pts)
        return wkb_polygon(rings)
    if tid in (WKB_MULTICURVE, WKB_MULTISURFACE):
        (n,) = struct.unpack_from(f"{bo}I", b, off)
        off += 4
        parts = []
        for _ in range(n):
            child_start = off
            _, ctid, _ = _read_header(b, child_start)
            # measure child length by linearizing through it
            if ctid == WKB_CURVEPOLYGON:
                cbo, _, coff = _read_header(b, child_start)
                (nr,) = struct.unpack_from(f"{cbo}I", b, coff)
                coff += 4
                rings = []
                for _ in range(nr):
                    pts, coff = _linearize_curve(b, coff)
                    rings.append(pts)
                parts.append(wkb_polygon(rings))
                off = coff
            else:
                pts, off = _linearize_curve(b, child_start)
                parts.append(wkb_linestring(pts))
        body = struct.pack("<BII", 1, 5 if tid == WKB_MULTICURVE else 6, len(parts))
        return body + b"".join(parts)
    # already linear
    parse_wkb(b)
    return b


def wkb_circularstring(coords: np.ndarray) -> bytes:
    out = struct.pack("<BII", 1, WKB_CIRCULARSTRING, len(coords))
    return out + np.asarray(coords, dtype="<f8").tobytes()


def wkb_curvepolygon(rings_wkb: list[bytes]) -> bytes:
    return struct.pack("<BII", 1, WKB_CURVEPOLYGON, len(rings_wkb)) + b"".join(
        rings_wkb
    )


def wkb_compoundcurve(parts_wkb: list[bytes]) -> bytes:
    return struct.pack("<BII", 1, WKB_COMPOUNDCURVE, len(parts_wkb)) + b"".join(
        parts_wkb
    )


# ---------------------------------------------------------------------------
# linear -> curve write-back (OGRGeometry::getCurveGeometry,
# ogr/ogrgeometry.cpp:3535 -> OGRGeometryFactory::curveFromLineString):
# detect maximal vertex runs on a common circle and re-fit them as
# CircularString arcs.  The reference's default linearizer hides the
# through-point angle in low-order coordinate bits ("stealth mode")
# for bit-exact roundtrips; our linearizer skips that (documented in
# the module header), so the fit recovers the CIRCLE exactly
# (center/radius/sweep) while intermediate stroke vertices may
# re-sample differently — the same behavior the reference has for
# foreign linearized input.
# ---------------------------------------------------------------------------


def line_to_curve_segments(coords: np.ndarray, eps: float = 1e-6) -> list:
    """LineString vertices -> [('arc', (p0, pm, p1), (cx, cy, R,
    sweep_rad)), ('line', [points...])] with maximal arc runs.  An
    arc needs >= 4 on-circle vertices (the minimum a stroked half-arc
    produces), monotone angles, consistent turn direction."""
    n = len(coords)
    segs: list = []
    line_run: list = []

    def flush_line():
        if len(line_run) >= 2:
            segs.append(("line", [tuple(p) for p in line_run]))

    i = 0
    while i < n - 1:
        par = None
        if i + 2 < n:
            par = get_curve_parameters(
                float(coords[i, 0]), float(coords[i, 1]),
                float(coords[i + 1, 0]), float(coords[i + 1, 1]),
                float(coords[i + 2, 0]), float(coords[i + 2, 1]),
            )
        j = i
        if par is not None:
            cx, cy, R, a0, a1, a2 = par
            sign = 1.0 if a2 > a0 else -1.0
            j = i + 2
            a_prev = a2
            while j + 1 < n:
                x, y = float(coords[j + 1, 0]), float(coords[j + 1, 1])
                if abs(math.hypot(x - cx, y - cy) - R) > eps * R:
                    break
                a = math.atan2(y - cy, x - cx)
                # unwrap monotone in the sweep direction
                while sign * (a - a_prev) < 0.0:
                    a += sign * 2.0 * math.pi
                if sign * (a - a_prev) > math.pi:  # direction flip
                    break
                a_prev = a
                j += 1
        if par is not None and j - i >= 3:
            flush_line()
            line_run.clear()
            mid = i + (j - i) // 2
            # re-derive the sweep from the accepted run endpoints
            a_end = a_prev if j > i + 2 else a2
            sweep = a_end - a0
            segs.append(
                (
                    "arc",
                    (
                        tuple(coords[i]),
                        tuple(coords[mid]),
                        tuple(coords[j]),
                    ),
                    (cx, cy, R, sweep),
                )
            )
            i = j
            continue
        if not line_run:
            line_run.append(coords[i])
        line_run.append(coords[i + 1])
        i += 1
    flush_line()
    return segs


def line_wkb_to_curve_wkb(buf: bytes, eps: float = 1e-6) -> bytes:
    """LineString WKB -> CircularString / CompoundCurve / LineString
    WKB (getCurveGeometry's return-the-simplest-type contract)."""
    g = parse_wkb(buf)
    coords = g.parts[0]
    segs = line_to_curve_segments(np.asarray(coords, dtype=np.float64), eps)
    if not segs:
        return buf
    if len(segs) == 1 and segs[0][0] == "arc":
        p0, pm, p1 = segs[0][1]
        return wkb_circularstring(np.array([p0, pm, p1]))
    if all(s[0] == "line" for s in segs):
        return buf
    parts = []
    for s in segs:
        if s[0] == "arc":
            p0, pm, p1 = s[1]
            parts.append(wkb_circularstring(np.array([p0, pm, p1])))
        else:
            parts.append(wkb_linestring(np.asarray(s[1], dtype=np.float64)))
    return wkb_compoundcurve(parts)
