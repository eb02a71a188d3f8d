"""Projection zoo: closed-form forward/inverse for the high-frequency
PROJ methods beyond the Mercator/TM/LCC families, behind a small
EPSG-parameter registry so `reproject(x, y, src, dst)` works for any
pair among the supported methods.

The reference delegates all of this to PROJ pipeline selection
(/root/reference/ogr/ogrct.cpp:1018,1091; conformance surface
/root/reference/autotest/osr/osr_ct.py).  This engine implements the
methods themselves from the published formulas (Snyder 1987 "Map
Projections — A Working Manual"; EPSG Guidance Note 7-2), numpy first
with DuckDB SQL twins that walk the identical expression trees:

- Albers Equal-Area Conic 2SP (EPSG method 9822, Snyder 14)
- Polar Stereographic variant B (EPSG 9829, Snyder 21) N + S aspects
- Oblique Stereographic (EPSG 9809, double/Gauss-Schreiber — the
  RD New / Amersfoort method)
- Sinusoidal (Snyder 30, ellipsoidal)
- Equidistant Cylindrical (EPSG 1028)

plus a registry mapping EPSG codes (and a few ESRI codes without an
EPSG twin) to (method, datum, parameters).  Datum crossings reuse the
Helmert machinery in gdal_spark.geo.datum.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import numpy as np

from gdal_spark.geo.datum import DATUMS, ELLIPSOIDS, datum_shift


def _d(v: float) -> str:
    """Exact float literal for DuckDB — QUOTED: an unquoted literal
    parses as DECIMAL and DuckDB's DECIMAL->DOUBLE conversion
    double-rounds (1 ulp off); string->double is correctly rounded in
    both engines (same fix as tilemath.sql_double)."""
    return f"cast('{float(v)!r}' as double)"


def ell_consts(datum: str) -> tuple[float, float, float]:
    """(a, e, e2) of the datum's ellipsoid."""
    a, inv_f = ELLIPSOIDS[DATUMS[datum][0]]
    f = 1.0 / inv_f
    e2 = f * (2.0 - f)
    return a, math.sqrt(e2), e2


# ---------------------------------------------------------------------------
# Meridian arc M(phi) and its inverse (rectifying-latitude series,
# Snyder 3-21/3-26) — shared by Sinusoidal and Equidistant Cylindrical.
# ---------------------------------------------------------------------------

def merid_coeffs(e2: float) -> tuple[float, float, float, float]:
    c0 = 1.0 - e2 / 4.0 - 3.0 * e2**2 / 64.0 - 5.0 * e2**3 / 256.0
    c2 = 3.0 * e2 / 8.0 + 3.0 * e2**2 / 32.0 + 45.0 * e2**3 / 1024.0
    c4 = 15.0 * e2**2 / 256.0 + 45.0 * e2**3 / 1024.0
    c6 = 35.0 * e2**3 / 3072.0
    return c0, c2, c4, c6


def merid_arc(phi, a: float, e2: float):
    c0, c2, c4, c6 = merid_coeffs(e2)
    return a * (
        c0 * phi - c2 * np.sin(2 * phi) + c4 * np.sin(4 * phi)
        - c6 * np.sin(6 * phi)
    )


def inv_merid_coeffs(e2: float) -> tuple[float, float, float, float]:
    e1 = (1.0 - math.sqrt(1.0 - e2)) / (1.0 + math.sqrt(1.0 - e2))
    d2 = 3.0 * e1 / 2.0 - 27.0 * e1**3 / 32.0
    d4 = 21.0 * e1**2 / 16.0 - 55.0 * e1**4 / 32.0
    d6 = 151.0 * e1**3 / 96.0
    d8 = 1097.0 * e1**4 / 512.0
    return d2, d4, d6, d8


def inv_merid_arc(M, a: float, e2: float):
    c0 = merid_coeffs(e2)[0]
    d2, d4, d6, d8 = inv_merid_coeffs(e2)
    mu = np.asarray(M, dtype=np.float64) / (a * c0)
    return (
        mu + d2 * np.sin(2 * mu) + d4 * np.sin(4 * mu)
        + d6 * np.sin(6 * mu) + d8 * np.sin(8 * mu)
    )


def sql_merid_arc(phi: str, a: float, e2: float) -> str:
    c0, c2, c4, c6 = merid_coeffs(e2)
    return (
        f"({_d(a)} * ({_d(c0)} * ({phi}) - {_d(c2)} * sin(2 * ({phi})) + "
        f"{_d(c4)} * sin(4 * ({phi})) - {_d(c6)} * sin(6 * ({phi}))))"
    )


def sql_inv_merid_arc(M: str, a: float, e2: float) -> str:
    """-> phi expression (radians); mirrors inv_merid_arc."""
    c0 = merid_coeffs(e2)[0]
    d2, d4, d6, d8 = inv_merid_coeffs(e2)
    mu = f"(({M}) / {_d(a * c0)})"
    return (
        f"({mu} + {_d(d2)} * sin(2 * {mu}) + {_d(d4)} * sin(4 * {mu}) + "
        f"{_d(d6)} * sin(6 * {mu}) + {_d(d8)} * sin(8 * {mu}))"
    )


# ---------------------------------------------------------------------------
# Albers Equal-Area Conic 2SP (EPSG 9822 / Snyder 14, ellipsoidal)
# ---------------------------------------------------------------------------

def _alb_q(sphi, e: float, e2: float):
    return (1.0 - e2) * (
        sphi / (1.0 - e2 * sphi * sphi)
        - (1.0 / (2.0 * e)) * np.log((1.0 - e * sphi) / (1.0 + e * sphi))
    )


def albers_consts(datum: str, lat1: float, lat2: float, lat0: float):
    """(n, C, rho0) of the cone — folded to plain floats so the SQL
    twins embed the SAME numpy-computed literals."""
    a, e, e2 = ell_consts(datum)
    p1, p2, p0 = (math.radians(v) for v in (lat1, lat2, lat0))
    s1, s2, s0 = math.sin(p1), math.sin(p2), math.sin(p0)
    m1 = math.cos(p1) / math.sqrt(1.0 - e2 * s1 * s1)
    m2 = math.cos(p2) / math.sqrt(1.0 - e2 * s2 * s2)
    q1 = float(_alb_q(np.float64(s1), e, e2))
    q2 = float(_alb_q(np.float64(s2), e, e2))
    q0 = float(_alb_q(np.float64(s0), e, e2))
    n = (m1 * m1 - m2 * m2) / (q2 - q1)
    C = m1 * m1 + n * q1
    rho0 = a * math.sqrt(C - n * q0) / n
    return n, C, rho0


def albers_forward(lon, lat, datum: str, lat1: float, lat2: float,
                   lat0: float, lon0: float, fe: float = 0.0,
                   fn: float = 0.0):
    a, e, e2 = ell_consts(datum)
    n, C, rho0 = albers_consts(datum, lat1, lat2, lat0)
    phi = np.radians(np.asarray(lat, dtype=np.float64))
    lam = np.radians(np.asarray(lon, dtype=np.float64))
    q = _alb_q(np.sin(phi), e, e2)
    rho = a * np.sqrt(C - n * q) / n  # mirrored in the SQL twin
    th = n * (lam - math.radians(lon0))
    return fe + rho * np.sin(th), fn + rho0 - rho * np.cos(th)


def albers_inverse(x, y, datum: str, lat1: float, lat2: float,
                   lat0: float, lon0: float, fe: float = 0.0,
                   fn: float = 0.0, iters: int = 8):
    a, e, e2 = ell_consts(datum)
    n, C, rho0 = albers_consts(datum, lat1, lat2, lat0)
    xp = np.asarray(x, dtype=np.float64) - fe
    yp = rho0 - (np.asarray(y, dtype=np.float64) - fn)
    rho = np.sqrt(xp * xp + yp * yp)
    th = np.arctan2(xp, yp)
    if n < 0.0:  # southern cone: rho and theta flip sign (Snyder 14-11)
        rho = -rho
        th = np.arctan2(-xp, -yp)
    q = (C - (rho * n / a) ** 2) / n
    phi = np.arcsin(np.clip(q / 2.0, -1.0, 1.0))
    for _ in range(iters):
        s = np.sin(phi)
        phi = phi + (1.0 - e2 * s * s) ** 2 / (2.0 * np.cos(phi)) * (
            q / (1.0 - e2)
            - s / (1.0 - e2 * s * s)
            + (1.0 / (2.0 * e)) * np.log((1.0 - e * s) / (1.0 + e * s))
        )
    return (
        np.degrees(th / n + math.radians(lon0)),
        np.degrees(phi),
    )


def sql_albers_forward(lon: str, lat: str, datum: str, lat1: float,
                       lat2: float, lat0: float, lon0: float,
                       fe: float = 0.0, fn: float = 0.0
                       ) -> tuple[str, str]:
    a, e, e2 = ell_consts(datum)
    n, C, rho0 = albers_consts(datum, lat1, lat2, lat0)
    phi = f"radians({lat})"
    s = f"sin({phi})"
    q = (
        f"({_d(1.0 - e2)} * (({s}) / (1.0 - {_d(e2)} * ({s}) * ({s})) - "
        f"{_d(1.0 / (2.0 * e))} * ln((1.0 - {_d(e)} * ({s})) / "
        f"(1.0 + {_d(e)} * ({s})))))"
    )
    rho = f"({_d(a)} * sqrt({_d(C)} - {_d(n)} * {q}) / {_d(n)})"
    th = f"({_d(n)} * (radians({lon}) - {_d(math.radians(lon0))}))"
    return (
        f"({_d(fe)} + {rho} * sin({th}))",
        f"({_d(fn + rho0)} - {rho} * cos({th}))",
    )


# ---------------------------------------------------------------------------
# Polar Stereographic variant B (EPSG 9829 / Snyder 21)
# ---------------------------------------------------------------------------

def _ps_tc(e: float) -> float:
    """sqrt((1+e)^(1+e) (1-e)^(1-e)) — the variant-B scale constant."""
    return math.sqrt((1.0 + e) ** (1.0 + e) * (1.0 - e) ** (1.0 - e))


def polar_stereo_consts(datum: str, lat_ts: float) -> float:
    """k0 implied by the standard parallel (EPSG 9829)."""
    a, e, e2 = ell_consts(datum)
    south = lat_ts < 0.0
    pf = math.radians(abs(lat_ts))
    sf = math.sin(pf)
    mf = math.cos(pf) / math.sqrt(1.0 - e2 * sf * sf)
    tf = math.tan(math.pi / 4.0 - pf / 2.0) * (
        (1.0 + e * sf) / (1.0 - e * sf)
    ) ** (e / 2.0)
    del south
    return mf * _ps_tc(e) / (2.0 * tf)


def polar_stereo_forward(lon, lat, datum: str, lat_ts: float,
                         lon0: float, fe: float = 0.0, fn: float = 0.0):
    """North aspect for lat_ts > 0, south aspect for lat_ts < 0."""
    a, e, e2 = ell_consts(datum)
    k0 = polar_stereo_consts(datum, lat_ts)
    south = lat_ts < 0.0
    phi = np.radians(np.asarray(lat, dtype=np.float64))
    lam = np.radians(np.asarray(lon, dtype=np.float64)) - math.radians(lon0)
    if south:
        phi = -phi  # mirror: compute in the north aspect
    s = np.sin(phi)
    # exp(c * ln(x)) staging (not **) so the SQL twin walks the
    # identical expression tree (same discipline as geo/crs.py LCC)
    t = np.tan(np.pi / 4.0 - phi / 2.0) * np.exp(
        (e / 2.0) * np.log((1.0 + e * s) / (1.0 - e * s))
    )
    rho = 2.0 * a * k0 * t / _ps_tc(e)
    x = fe + rho * np.sin(lam)
    y = fn + rho * np.cos(lam) if south else fn - rho * np.cos(lam)
    return x, y


def polar_stereo_inverse(x, y, datum: str, lat_ts: float, lon0: float,
                         fe: float = 0.0, fn: float = 0.0):
    a, e, e2 = ell_consts(datum)
    k0 = polar_stereo_consts(datum, lat_ts)
    south = lat_ts < 0.0
    xp = np.asarray(x, dtype=np.float64) - fe
    yp = np.asarray(y, dtype=np.float64) - fn
    rho = np.sqrt(xp * xp + yp * yp)
    t = rho * _ps_tc(e) / (2.0 * a * k0)  # mirrored in the SQL twin
    chi = np.pi / 2.0 - 2.0 * np.arctan(t)  # north-aspect conformal lat
    # conformal -> geodetic series (Snyder 3-5)
    A = e2 / 2.0 + 5.0 * e2**2 / 24.0 + e2**3 / 12.0 + 13.0 * e2**4 / 360.0
    B = 7.0 * e2**2 / 48.0 + 29.0 * e2**3 / 240.0 + 811.0 * e2**4 / 11520.0
    Cc = 7.0 * e2**3 / 120.0 + 81.0 * e2**4 / 1120.0
    Dd = 4279.0 * e2**4 / 161280.0
    phi = (
        chi + A * np.sin(2 * chi) + B * np.sin(4 * chi)
        + Cc * np.sin(6 * chi) + Dd * np.sin(8 * chi)
    )
    if south:
        lam = np.arctan2(xp, yp)
        phi = -phi
    else:
        lam = np.arctan2(xp, -yp)
    return np.degrees(lam + math.radians(lon0)), np.degrees(phi)


def sql_polar_stereo_forward(lon: str, lat: str, datum: str,
                             lat_ts: float, lon0: float,
                             fe: float = 0.0, fn: float = 0.0
                             ) -> tuple[str, str]:
    a, e, e2 = ell_consts(datum)
    k0 = polar_stereo_consts(datum, lat_ts)
    south = lat_ts < 0.0
    phi = f"(- radians({lat}))" if south else f"radians({lat})"
    lam = f"(radians({lon}) - {_d(math.radians(lon0))})"
    s = f"sin({phi})"
    t = (
        f"(tan(pi() / 4.0 - ({phi}) / 2.0) * exp({_d(e / 2.0)} * "
        f"ln((1.0 + {_d(e)} * ({s})) / (1.0 - {_d(e)} * ({s})))))"
    )
    rho = f"({_d(2.0 * a * k0)} * {t} / {_d(_ps_tc(e))})"
    x = f"({_d(fe)} + {rho} * sin({lam}))"
    if south:
        y = f"({_d(fn)} + {rho} * cos({lam}))"
    else:
        y = f"({_d(fn)} - {rho} * cos({lam}))"
    return x, y


def sql_polar_stereo_inverse(x: str, y: str, datum: str, lat_ts: float,
                             lon0: float, fe: float = 0.0,
                             fn: float = 0.0) -> tuple[str, str]:
    """-> (lon_deg, lat_deg) expressions; mirrors polar_stereo_inverse
    (closed form — the conformal-latitude series, no iteration)."""
    a, e, e2 = ell_consts(datum)
    k0 = polar_stereo_consts(datum, lat_ts)
    south = lat_ts < 0.0
    xp = f"(({x}) - {_d(fe)})"
    yp = f"(({y}) - {_d(fn)})"
    rho = f"sqrt({xp} * {xp} + {yp} * {yp})"
    t = f"({rho} * {_d(_ps_tc(e))} / {_d(2.0 * a * k0)})"
    chi = f"(pi() / 2.0 - 2.0 * atan({t}))"
    A = e2 / 2.0 + 5.0 * e2**2 / 24.0 + e2**3 / 12.0 + 13.0 * e2**4 / 360.0
    B = 7.0 * e2**2 / 48.0 + 29.0 * e2**3 / 240.0 + 811.0 * e2**4 / 11520.0
    Cc = 7.0 * e2**3 / 120.0 + 81.0 * e2**4 / 1120.0
    Dd = 4279.0 * e2**4 / 161280.0
    phi = (
        f"(({chi}) + {_d(A)} * sin(2 * ({chi})) + {_d(B)} * sin(4 * ({chi}))"
        f" + {_d(Cc)} * sin(6 * ({chi})) + {_d(Dd)} * sin(8 * ({chi})))"
    )
    if south:
        lam = f"atan2({xp}, {yp})"
        lat_out = f"(- degrees({phi}))"
    else:
        lam = f"atan2({xp}, - ({yp}))"
        lat_out = f"degrees({phi})"
    return f"degrees(({lam}) + {_d(math.radians(lon0))})", lat_out


# ---------------------------------------------------------------------------
# Polar Stereographic variant A (EPSG 9810 — k0 given directly; UPS)
# and Mercator 1SP ellipsoidal (EPSG 9804; World Mercator)
# ---------------------------------------------------------------------------

def polar_stereo_a_forward(lon, lat, datum: str, k0: float, south: bool,
                           lon0: float = 0.0, fe: float = 2000000.0,
                           fn: float = 2000000.0):
    """Variant A = variant B's math with the scale given at the pole
    (UPS: k0 = 0.994, FE = FN = 2,000,000)."""
    a, e, e2 = ell_consts(datum)
    phi = np.radians(np.asarray(lat, dtype=np.float64))
    lam = np.radians(np.asarray(lon, dtype=np.float64)) - math.radians(lon0)
    if south:
        phi = -phi
    s = np.sin(phi)
    t = np.tan(np.pi / 4.0 - phi / 2.0) * np.exp(
        (e / 2.0) * np.log((1.0 + e * s) / (1.0 - e * s))
    )
    rho = 2.0 * a * k0 * t / _ps_tc(e)
    x = fe + rho * np.sin(lam)
    y = fn + rho * np.cos(lam) if south else fn - rho * np.cos(lam)
    return x, y


def polar_stereo_a_inverse(x, y, datum: str, k0: float, south: bool,
                           lon0: float = 0.0, fe: float = 2000000.0,
                           fn: float = 2000000.0):
    a, e, e2 = ell_consts(datum)
    xp = np.asarray(x, dtype=np.float64) - fe
    yp = np.asarray(y, dtype=np.float64) - fn
    rho = np.sqrt(xp * xp + yp * yp)
    t = rho * _ps_tc(e) / (2.0 * a * k0)
    chi = np.pi / 2.0 - 2.0 * np.arctan(t)
    phi = _conformal_to_geodetic(chi, e2)
    if south:
        lam = np.arctan2(xp, yp)
        phi = -phi
    else:
        lam = np.arctan2(xp, -yp)
    return np.degrees(lam + math.radians(lon0)), np.degrees(phi)


def _conformal_to_geodetic(chi, e2: float):
    A = e2 / 2.0 + 5.0 * e2**2 / 24.0 + e2**3 / 12.0 + 13.0 * e2**4 / 360.0
    B = 7.0 * e2**2 / 48.0 + 29.0 * e2**3 / 240.0 + 811.0 * e2**4 / 11520.0
    Cc = 7.0 * e2**3 / 120.0 + 81.0 * e2**4 / 1120.0
    Dd = 4279.0 * e2**4 / 161280.0
    return (
        chi + A * np.sin(2 * chi) + B * np.sin(4 * chi)
        + Cc * np.sin(6 * chi) + Dd * np.sin(8 * chi)
    )


def sql_polar_stereo_a_forward(lon: str, lat: str, datum: str, k0: float,
                               south: bool, lon0: float = 0.0,
                               fe: float = 2000000.0,
                               fn: float = 2000000.0) -> tuple[str, str]:
    a, e, e2 = ell_consts(datum)
    phi = f"(- radians({lat}))" if south else f"radians({lat})"
    lam = f"(radians({lon}) - {_d(math.radians(lon0))})"
    s = f"sin({phi})"
    t = (
        f"(tan(pi() / 4.0 - ({phi}) / 2.0) * exp({_d(e / 2.0)} * "
        f"ln((1.0 + {_d(e)} * ({s})) / (1.0 - {_d(e)} * ({s})))))"
    )
    rho = f"({_d(2.0 * a * k0)} * {t} / {_d(_ps_tc(e))})"
    x = f"({_d(fe)} + {rho} * sin({lam}))"
    y = (
        f"({_d(fn)} + {rho} * cos({lam}))"
        if south
        else f"({_d(fn)} - {rho} * cos({lam}))"
    )
    return x, y


def mercator_forward(lon, lat, datum: str, k0: float = 1.0,
                     lon0: float = 0.0, fe: float = 0.0, fn: float = 0.0):
    """Ellipsoidal Mercator 1SP (EPSG 9804; 3395 World Mercator —
    unlike 3857's spherical formulas)."""
    a, e, e2 = ell_consts(datum)
    phi = np.radians(np.asarray(lat, dtype=np.float64))
    lam = np.radians(np.asarray(lon, dtype=np.float64)) - math.radians(lon0)
    s = np.sin(phi)
    x = fe + a * k0 * lam
    y = fn + a * k0 * (
        np.log(np.tan(np.pi / 4.0 + phi / 2.0))
        + (e / 2.0) * np.log((1.0 - e * s) / (1.0 + e * s))
    )
    return x, y


def mercator_inverse(x, y, datum: str, k0: float = 1.0, lon0: float = 0.0,
                     fe: float = 0.0, fn: float = 0.0):
    a, e, e2 = ell_consts(datum)
    lam = (np.asarray(x, dtype=np.float64) - fe) / (a * k0)
    chi = 2.0 * np.arctan(
        np.exp((np.asarray(y, dtype=np.float64) - fn) / (a * k0))
    ) - np.pi / 2.0
    phi = _conformal_to_geodetic(chi, e2)
    return np.degrees(lam + math.radians(lon0)), np.degrees(phi)


def sql_mercator_forward(lon: str, lat: str, datum: str, k0: float = 1.0,
                         lon0: float = 0.0, fe: float = 0.0,
                         fn: float = 0.0) -> tuple[str, str]:
    a, e, e2 = ell_consts(datum)
    phi = f"radians({lat})"
    s = f"sin({phi})"
    x = f"({_d(fe)} + {_d(a * k0)} * (radians({lon}) - {_d(math.radians(lon0))}))"
    y = (
        f"({_d(fn)} + {_d(a * k0)} * (ln(tan(pi() / 4.0 + ({phi}) / 2.0)) "
        f"+ {_d(e / 2.0)} * ln((1.0 - {_d(e)} * ({s})) / "
        f"(1.0 + {_d(e)} * ({s})))))"
    )
    return x, y


# ---------------------------------------------------------------------------
# Oblique Stereographic (EPSG 9809 — double projection via the
# conformal sphere; the RD New / Amersfoort method)
# ---------------------------------------------------------------------------

def oblique_stereo_consts(datum: str, lat0: float, lon0: float):
    """(R, n, c, chi0, lam0) of the conformal sphere at the origin."""
    a, e, e2 = ell_consts(datum)
    p0 = math.radians(lat0)
    s0 = math.sin(p0)
    rho0 = a * (1.0 - e2) / (1.0 - e2 * s0 * s0) ** 1.5
    nu0 = a / math.sqrt(1.0 - e2 * s0 * s0)
    R = math.sqrt(rho0 * nu0)
    n = math.sqrt(1.0 + e2 * math.cos(p0) ** 4 / (1.0 - e2))
    S1 = (1.0 + s0) / (1.0 - s0)
    S2 = (1.0 - e * s0) / (1.0 + e * s0)
    w1 = (S1 * S2**e) ** n
    sin_chi00 = (w1 - 1.0) / (w1 + 1.0)
    c = (n + s0) * (1.0 - sin_chi00) / ((n - s0) * (1.0 + sin_chi00))
    w2 = c * w1
    chi0 = math.asin((w2 - 1.0) / (w2 + 1.0))
    return R, n, c, chi0, math.radians(lon0)


def oblique_stereo_forward(lon, lat, datum: str, lat0: float,
                           lon0: float, k0: float, fe: float = 0.0,
                           fn: float = 0.0):
    a, e, e2 = ell_consts(datum)
    R, n, c, chi0, lam0 = oblique_stereo_consts(datum, lat0, lon0)
    phi = np.radians(np.asarray(lat, dtype=np.float64))
    lam = np.radians(np.asarray(lon, dtype=np.float64))
    Lml = n * (lam - lam0)  # Lam - lam0 directly (SQL-twin staging)
    s = np.sin(phi)
    # exp(n * (ln Sa + e ln Sb)) staging mirrors the SQL twin exactly
    w = c * np.exp(
        n * (
            np.log((1.0 + s) / (1.0 - s))
            + e * np.log((1.0 - e * s) / (1.0 + e * s))
        )
    )
    chi = np.arcsin((w - 1.0) / (w + 1.0))
    B = (
        1.0
        + np.sin(chi) * math.sin(chi0)
        + np.cos(chi) * math.cos(chi0) * np.cos(Lml)
    )
    x = fe + 2.0 * R * k0 * np.cos(chi) * np.sin(Lml) / B
    y = fn + 2.0 * R * k0 * (
        np.sin(chi) * math.cos(chi0)
        - np.cos(chi) * math.sin(chi0) * np.cos(Lml)
    ) / B
    return x, y


def oblique_stereo_inverse(x, y, datum: str, lat0: float, lon0: float,
                           k0: float, fe: float = 0.0, fn: float = 0.0,
                           iters: int = 8):
    """EPSG 9809 inverse: conformal sphere back-projection, then the
    isometric-latitude iteration back to the ellipsoid."""
    a, e, e2 = ell_consts(datum)
    R, n, c, chi0, lam0 = oblique_stereo_consts(datum, lat0, lon0)
    xp = np.asarray(x, dtype=np.float64) - fe
    yp = np.asarray(y, dtype=np.float64) - fn
    g = 2.0 * R * k0 * math.tan(math.pi / 4.0 - chi0 / 2.0)
    hh = 4.0 * R * k0 * math.tan(chi0) + g
    i = np.arctan2(xp, hh + yp)
    j = np.arctan2(xp, g - yp) - i
    chi = chi0 + 2.0 * np.arctan((yp - xp * np.tan(j / 2.0)) / (2.0 * R * k0))
    Lam = j + 2.0 * i + lam0
    lam = (Lam - lam0) / n + lam0
    # isometric latitude on the sphere -> ellipsoid iteration
    psi = 0.5 * np.log((1.0 + np.sin(chi)) / (c * (1.0 - np.sin(chi)))) / n
    phi = 2.0 * np.arctan(np.exp(psi)) - np.pi / 2.0
    for _ in range(iters):
        s = np.sin(phi)
        psi_i = np.log(
            np.tan(phi / 2.0 + np.pi / 4.0)
            * ((1.0 - e * s) / (1.0 + e * s)) ** (e / 2.0)
        )
        nu = a / np.sqrt(1.0 - e2 * s * s)
        rho = a * (1.0 - e2) / (1.0 - e2 * s * s) ** 1.5
        phi = phi - (psi_i - psi) * np.cos(phi) * (1.0 - e2 * s * s) / (1.0 - e2)
        del nu, rho
    return np.degrees(lam), np.degrees(phi)


def sql_oblique_stereo_forward(lon: str, lat: str, datum: str,
                               lat0: float, lon0: float, k0: float,
                               fe: float = 0.0, fn: float = 0.0
                               ) -> tuple[str, str]:
    a, e, e2 = ell_consts(datum)
    R, n, c, chi0, lam0 = oblique_stereo_consts(datum, lat0, lon0)
    phi = f"radians({lat})"
    s = f"sin({phi})"
    Lml = f"({_d(n)} * (radians({lon}) - {_d(lam0)}))"  # Lam - lam0
    w = (
        f"({_d(c)} * exp({_d(n)} * (ln((1.0 + ({s})) / (1.0 - ({s}))) + "
        f"{_d(e)} * ln((1.0 - {_d(e)} * ({s})) / (1.0 + {_d(e)} * ({s}))))))"
    )
    chi = f"asin((({w}) - 1.0) / (({w}) + 1.0))"
    B = (
        f"(1.0 + sin({chi}) * {_d(math.sin(chi0))} + cos({chi}) * "
        f"{_d(math.cos(chi0))} * cos({Lml}))"
    )
    x = f"({_d(fe)} + {_d(2.0 * R * k0)} * cos({chi}) * sin({Lml}) / ({B}))"
    y = (
        f"({_d(fn)} + {_d(2.0 * R * k0)} * (sin({chi}) * "
        f"{_d(math.cos(chi0))} - cos({chi}) * {_d(math.sin(chi0))} * "
        f"cos({Lml})) / ({B}))"
    )
    return x, y


# ---------------------------------------------------------------------------
# Sinusoidal (Snyder 30, ellipsoidal) and Equidistant Cylindrical
# (EPSG 1028)
# ---------------------------------------------------------------------------

def sinusoidal_forward(lon, lat, datum: str, lon0: float = 0.0,
                       fe: float = 0.0, fn: float = 0.0):
    a, e, e2 = ell_consts(datum)
    phi = np.radians(np.asarray(lat, dtype=np.float64))
    lam = np.radians(np.asarray(lon, dtype=np.float64)) - math.radians(lon0)
    s = np.sin(phi)
    x = fe + a * lam * np.cos(phi) / np.sqrt(1.0 - e2 * s * s)
    y = fn + merid_arc(phi, a, e2)
    return x, y


def sinusoidal_inverse(x, y, datum: str, lon0: float = 0.0,
                       fe: float = 0.0, fn: float = 0.0):
    a, e, e2 = ell_consts(datum)
    phi = inv_merid_arc(np.asarray(y, dtype=np.float64) - fn, a, e2)
    s = np.sin(phi)
    lam = (np.asarray(x, dtype=np.float64) - fe) * np.sqrt(
        1.0 - e2 * s * s
    ) / (a * np.cos(phi))
    return np.degrees(lam + math.radians(lon0)), np.degrees(phi)


def sql_sinusoidal_forward(lon: str, lat: str, datum: str,
                           lon0: float = 0.0, fe: float = 0.0,
                           fn: float = 0.0) -> tuple[str, str]:
    a, e, e2 = ell_consts(datum)
    phi = f"radians({lat})"
    s = f"sin({phi})"
    lam = f"(radians({lon}) - {_d(math.radians(lon0))})"
    x = (
        f"({_d(fe)} + {_d(a)} * ({lam}) * cos({phi}) / "
        f"sqrt(1.0 - {_d(e2)} * ({s}) * ({s})))"
    )
    y = f"({_d(fn)} + {sql_merid_arc(phi, a, e2)})"
    return x, y


def sql_sinusoidal_inverse(x: str, y: str, datum: str,
                           lon0: float = 0.0, fe: float = 0.0,
                           fn: float = 0.0) -> tuple[str, str]:
    a, e, e2 = ell_consts(datum)
    phi = sql_inv_merid_arc(f"(({y}) - {_d(fn)})", a, e2)
    s = f"sin({phi})"
    lam = (
        f"((({x}) - {_d(fe)}) * sqrt(1.0 - {_d(e2)} * ({s}) * ({s})) / "
        f"({_d(a)} * cos({phi})))"
    )
    return f"degrees(({lam}) + {_d(math.radians(lon0))})", f"degrees({phi})"


def eqc_forward(lon, lat, datum: str, lat1: float = 0.0,
                lon0: float = 0.0, fe: float = 0.0, fn: float = 0.0):
    a, e, e2 = ell_consts(datum)
    p1 = math.radians(lat1)
    s1 = math.sin(p1)
    nu1c = a * math.cos(p1) / math.sqrt(1.0 - e2 * s1 * s1)
    lam = np.radians(np.asarray(lon, dtype=np.float64)) - math.radians(lon0)
    phi = np.radians(np.asarray(lat, dtype=np.float64))
    return fe + nu1c * lam, fn + merid_arc(phi, a, e2)


def eqc_inverse(x, y, datum: str, lat1: float = 0.0, lon0: float = 0.0,
                fe: float = 0.0, fn: float = 0.0):
    a, e, e2 = ell_consts(datum)
    p1 = math.radians(lat1)
    s1 = math.sin(p1)
    nu1c = a * math.cos(p1) / math.sqrt(1.0 - e2 * s1 * s1)
    lam = (np.asarray(x, dtype=np.float64) - fe) / nu1c
    phi = inv_merid_arc(np.asarray(y, dtype=np.float64) - fn, a, e2)
    return np.degrees(lam + math.radians(lon0)), np.degrees(phi)


def sql_eqc_forward(lon: str, lat: str, datum: str, lat1: float = 0.0,
                    lon0: float = 0.0, fe: float = 0.0, fn: float = 0.0
                    ) -> tuple[str, str]:
    a, e, e2 = ell_consts(datum)
    p1 = math.radians(lat1)
    s1 = math.sin(p1)
    nu1c = a * math.cos(p1) / math.sqrt(1.0 - e2 * s1 * s1)
    x = f"({_d(fe)} + {_d(nu1c)} * (radians({lon}) - {_d(math.radians(lon0))}))"
    y = f"({_d(fn)} + {sql_merid_arc(f'radians({lat})', a, e2)})"
    return x, y


def sql_eqc_inverse(x: str, y: str, datum: str, lat1: float = 0.0,
                    lon0: float = 0.0, fe: float = 0.0, fn: float = 0.0
                    ) -> tuple[str, str]:
    a, e, e2 = ell_consts(datum)
    p1 = math.radians(lat1)
    s1 = math.sin(p1)
    nu1c = a * math.cos(p1) / math.sqrt(1.0 - e2 * s1 * s1)
    lam = f"((({x}) - {_d(fe)}) / {_d(nu1c)})"
    phi = sql_inv_merid_arc(f"(({y}) - {_d(fn)})", a, e2)
    return f"degrees(({lam}) + {_d(math.radians(lon0))})", f"degrees({phi})"


# ---------------------------------------------------------------------------
# Cassini-Soldner (EPSG method 9806; Snyder p.95, EPSG Guidance 7-2
# §3.2.2 — the Trinidad 1903 worked example pins the series).
# Reference driver surface: SRS_PT_CASSINI_SOLDNER
# (ogr/ogr_srs_api.h:80), proj4 '+proj=cass'
# (autotest/osr/osr_proj4.py:239).
# ---------------------------------------------------------------------------

def cassini_forward(lon, lat, datum: str, lat0: float, lon0: float,
                    fe: float = 0.0, fn: float = 0.0):
    a, e, e2 = ell_consts(datum)
    phi = np.radians(np.asarray(lat, dtype=np.float64))
    lam = np.radians(np.asarray(lon, dtype=np.float64)) - math.radians(lon0)
    s, c = np.sin(phi), np.cos(phi)
    t = np.tan(phi)
    A = lam * c
    T = t * t
    C = e2 * c * c / (1.0 - e2)
    nu = a / np.sqrt(1.0 - e2 * s * s)
    M = merid_arc(phi, a, e2)
    M0 = merid_arc(np.float64(math.radians(lat0)), a, e2)
    A2 = A * A
    x = fe + nu * (A - T * A * A2 / 6.0
                   - (8.0 - T + 8.0 * C) * T * A * A2 * A2 / 120.0)
    y = fn + M - M0 + nu * t * (A2 / 2.0
                                + (5.0 - T + 6.0 * C) * A2 * A2 / 24.0)
    return x, y


def cassini_inverse(x, y, datum: str, lat0: float, lon0: float,
                    fe: float = 0.0, fn: float = 0.0):
    a, e, e2 = ell_consts(datum)
    M0 = merid_arc(np.float64(math.radians(lat0)), a, e2)
    M1 = M0 + (np.asarray(y, dtype=np.float64) - fn)
    phi1 = inv_merid_arc(M1, a, e2)
    s1 = np.sin(phi1)
    t1 = np.tan(phi1)
    T1 = t1 * t1
    den = 1.0 - e2 * s1 * s1
    nu1 = a / np.sqrt(den)
    rho1 = a * (1.0 - e2) / (den * np.sqrt(den))
    D = (np.asarray(x, dtype=np.float64) - fe) / nu1
    D2 = D * D
    phi = phi1 - (nu1 * t1 / rho1) * (
        D2 / 2.0 - (1.0 + 3.0 * T1) * D2 * D2 / 24.0
    )
    lam = (D - T1 * D * D2 / 3.0
           + (1.0 + 3.0 * T1) * T1 * D * D2 * D2 / 15.0) / np.cos(phi1)
    return np.degrees(lam + math.radians(lon0)), np.degrees(phi)


def sql_cassini_forward(lon: str, lat: str, datum: str, lat0: float,
                        lon0: float, fe: float = 0.0, fn: float = 0.0
                        ) -> tuple[str, str]:
    a, e, e2 = ell_consts(datum)
    phi = f"radians({lat})"
    lam = f"(radians({lon}) - {_d(math.radians(lon0))})"
    A = f"(({lam}) * cos({phi}))"
    T = f"(tan({phi}) * tan({phi}))"
    C = f"({_d(e2)} * cos({phi}) * cos({phi}) / {_d(1.0 - e2)})"
    nu = f"({_d(a)} / sqrt(1.0 - {_d(e2)} * sin({phi}) * sin({phi})))"
    M0 = float(merid_arc(np.float64(math.radians(lat0)), a, e2))
    A2 = f"({A} * {A})"
    x = (
        f"({_d(fe)} + {nu} * ({A} - {T} * {A} * {A2} / 6.0 "
        f"- (8.0 - {T} + 8.0 * {C}) * {T} * {A} * {A2} * {A2} / 120.0))"
    )
    y = (
        f"({_d(fn)} + {sql_merid_arc(phi, a, e2)} - {_d(M0)} "
        f"+ {nu} * tan({phi}) * ({A2} / 2.0 "
        f"+ (5.0 - {T} + 6.0 * {C}) * {A2} * {A2} / 24.0))"
    )
    return x, y


# ---------------------------------------------------------------------------
# Authalic latitude: q(phi), qp, and the beta -> phi series
# (Snyder 3-11/3-12/3-18) — shared by the equal-area methods
# (LAEA 9820, Cylindrical Equal Area 9835).
# ---------------------------------------------------------------------------

def _auth_series(e2: float) -> tuple[float, float, float]:
    e4 = e2 * e2
    e6 = e4 * e2
    return (
        e2 / 3.0 + 31.0 * e4 / 180.0 + 517.0 * e6 / 5040.0,
        23.0 * e4 / 360.0 + 251.0 * e6 / 3780.0,
        761.0 * e6 / 45360.0,
    )


def _beta_to_phi(beta, e2: float):
    c2, c4, c6 = _auth_series(e2)
    return (
        beta
        + c2 * np.sin(2.0 * beta)
        + c4 * np.sin(4.0 * beta)
        + c6 * np.sin(6.0 * beta)
    )


def _sql_beta_to_phi(beta: str, e2: float) -> str:
    c2, c4, c6 = _auth_series(e2)
    return (
        f"(({beta}) + {_d(c2)} * sin(2.0 * ({beta})) + "
        f"{_d(c4)} * sin(4.0 * ({beta})) + "
        f"{_d(c6)} * sin(6.0 * ({beta})))"
    )


def _qp(e: float, e2: float) -> float:
    return float(_alb_q(np.float64(1.0), e, e2))


# ---------------------------------------------------------------------------
# Lambert Azimuthal Equal Area, oblique ellipsoidal (EPSG method 9820,
# Snyder 24 / EPSG Guidance 7-2 §3.5.2) — EPSG:3035 LAEA Europe.
# ---------------------------------------------------------------------------

def laea_consts(datum: str, lat0: float):
    """(qp, beta1, Rq, D) folded to plain floats so the SQL twin
    embeds the SAME numpy-computed literals."""
    a, e, e2 = ell_consts(datum)
    p0 = math.radians(lat0)
    s0 = math.sin(p0)
    qp = _qp(e, e2)
    q1 = float(_alb_q(np.float64(s0), e, e2))
    beta1 = math.asin(q1 / qp)
    Rq = a * math.sqrt(qp / 2.0)
    m1 = math.cos(p0) / math.sqrt(1.0 - e2 * s0 * s0)
    D = a * m1 / (Rq * math.cos(beta1))
    return qp, beta1, Rq, D


def laea_forward(lon, lat, datum: str, lat0: float, lon0: float,
                 fe: float = 0.0, fn: float = 0.0):
    a, e, e2 = ell_consts(datum)
    qp, beta1, Rq, D = laea_consts(datum, lat0)
    phi = np.radians(np.asarray(lat, dtype=np.float64))
    dlam = np.radians(np.asarray(lon, dtype=np.float64)) - math.radians(lon0)
    q = _alb_q(np.sin(phi), e, e2)
    beta = np.arcsin(np.clip(q / qp, -1.0, 1.0))
    sb, cb = np.sin(beta), np.cos(beta)
    B = Rq * np.sqrt(
        2.0 / (1.0 + math.sin(beta1) * sb
               + math.cos(beta1) * cb * np.cos(dlam))
    )
    x = fe + B * D * cb * np.sin(dlam)
    y = fn + (B / D) * (math.cos(beta1) * sb
                        - math.sin(beta1) * cb * np.cos(dlam))
    return x, y


def laea_inverse(x, y, datum: str, lat0: float, lon0: float,
                 fe: float = 0.0, fn: float = 0.0):
    a, e, e2 = ell_consts(datum)
    qp, beta1, Rq, D = laea_consts(datum, lat0)
    xp = (np.asarray(x, dtype=np.float64) - fe) / D
    yp = D * (np.asarray(y, dtype=np.float64) - fn)
    rho = np.sqrt(xp * xp + yp * yp)
    ce = 2.0 * np.arcsin(np.clip(rho / (2.0 * Rq), -1.0, 1.0))
    sc, cc = np.sin(ce), np.cos(ce)
    # rho == 0 (the projection centre) -> beta = beta1, dlam = 0
    safe = np.where(rho == 0.0, 1.0, rho)
    beta = np.arcsin(np.clip(
        cc * math.sin(beta1) + yp * sc * math.cos(beta1) / safe,
        -1.0, 1.0))
    beta = np.where(rho == 0.0, beta1, beta)
    dlam = np.arctan2(
        xp * sc,
        safe * math.cos(beta1) * cc - yp * math.sin(beta1) * sc,
    )
    dlam = np.where(rho == 0.0, 0.0, dlam)
    phi = _beta_to_phi(beta, e2)
    return np.degrees(dlam + math.radians(lon0)), np.degrees(phi)


def sql_laea_forward(lon: str, lat: str, datum: str, lat0: float,
                     lon0: float, fe: float = 0.0, fn: float = 0.0
                     ) -> tuple[str, str]:
    a, e, e2 = ell_consts(datum)
    qp, beta1, Rq, D = laea_consts(datum, lat0)
    phi = f"radians({lat})"
    s = f"sin({phi})"
    q = (
        f"({_d(1.0 - e2)} * (({s}) / (1.0 - {_d(e2)} * ({s}) * ({s})) - "
        f"{_d(1.0 / (2.0 * e))} * ln((1.0 - {_d(e)} * ({s})) / "
        f"(1.0 + {_d(e)} * ({s})))))"
    )
    beta = f"asin(greatest(-1.0, least(1.0, {q} / {_d(qp)})))"
    dlam = f"(radians({lon}) - {_d(math.radians(lon0))})"
    B = (
        f"({_d(Rq)} * sqrt(2.0 / (1.0 + {_d(math.sin(beta1))} * "
        f"sin({beta}) + {_d(math.cos(beta1))} * cos({beta}) * "
        f"cos({dlam}))))"
    )
    x = f"({_d(fe)} + {B} * {_d(D)} * cos({beta}) * sin({dlam}))"
    y = (
        f"({_d(fn)} + ({B} / {_d(D)}) * ({_d(math.cos(beta1))} * "
        f"sin({beta}) - {_d(math.sin(beta1))} * cos({beta}) * "
        f"cos({dlam})))"
    )
    return x, y


# ---------------------------------------------------------------------------
# (Lambert) Cylindrical Equal Area, ellipsoidal (EPSG method 9835,
# Snyder 10) — EPSG:6933 WGS 84 / NSIDC EASE-Grid 2.0 Global.
# ---------------------------------------------------------------------------

def cea_consts(datum: str, lat_ts: float) -> float:
    """k0 implied by the standard parallel."""
    _a, _e, e2 = ell_consts(datum)
    p1 = math.radians(lat_ts)
    s1 = math.sin(p1)
    return math.cos(p1) / math.sqrt(1.0 - e2 * s1 * s1)


def cea_forward(lon, lat, datum: str, lat_ts: float, lon0: float = 0.0,
                fe: float = 0.0, fn: float = 0.0):
    a, e, e2 = ell_consts(datum)
    k0 = cea_consts(datum, lat_ts)
    phi = np.radians(np.asarray(lat, dtype=np.float64))
    dlam = np.radians(np.asarray(lon, dtype=np.float64)) - math.radians(lon0)
    q = _alb_q(np.sin(phi), e, e2)
    return fe + a * k0 * dlam, fn + a * q / (2.0 * k0)


def cea_inverse(x, y, datum: str, lat_ts: float, lon0: float = 0.0,
                fe: float = 0.0, fn: float = 0.0):
    a, e, e2 = ell_consts(datum)
    k0 = cea_consts(datum, lat_ts)
    qp = _qp(e, e2)
    dlam = (np.asarray(x, dtype=np.float64) - fe) / (a * k0)
    q = 2.0 * (np.asarray(y, dtype=np.float64) - fn) * k0 / a
    beta = np.arcsin(np.clip(q / qp, -1.0, 1.0))
    phi = _beta_to_phi(beta, e2)
    return np.degrees(dlam + math.radians(lon0)), np.degrees(phi)


def sql_cea_forward(lon: str, lat: str, datum: str, lat_ts: float,
                    lon0: float = 0.0, fe: float = 0.0, fn: float = 0.0
                    ) -> tuple[str, str]:
    a, e, e2 = ell_consts(datum)
    k0 = cea_consts(datum, lat_ts)
    phi = f"radians({lat})"
    s = f"sin({phi})"
    q = (
        f"({_d(1.0 - e2)} * (({s}) / (1.0 - {_d(e2)} * ({s}) * ({s})) - "
        f"{_d(1.0 / (2.0 * e))} * ln((1.0 - {_d(e)} * ({s})) / "
        f"(1.0 + {_d(e)} * ({s})))))"
    )
    x = (
        f"({_d(fe)} + {_d(a * k0)} * (radians({lon}) - "
        f"{_d(math.radians(lon0))}))"
    )
    y = f"({_d(fn)} + {_d(a)} * {q} / {_d(2.0 * k0)})"
    return x, y


def sql_cea_inverse(x: str, y: str, datum: str, lat_ts: float,
                    lon0: float = 0.0, fe: float = 0.0, fn: float = 0.0
                    ) -> tuple[str, str]:
    a, e, e2 = ell_consts(datum)
    k0 = cea_consts(datum, lat_ts)
    qp = _qp(e, e2)
    dlam = f"((({x}) - {_d(fe)}) / {_d(a * k0)})"
    q = f"(2.0 * (({y}) - {_d(fn)}) * {_d(k0)} / {_d(a)})"
    beta = f"asin(greatest(-1.0, least(1.0, {q} / {_d(qp)})))"
    phi = _sql_beta_to_phi(beta, e2)
    return (
        f"degrees(({dlam}) + {_d(math.radians(lon0))})",
        f"degrees({phi})",
    )


# ---------------------------------------------------------------------------
# Mollweide, spherical on the ellipsoid's semi-major axis — the
# PROJ/ESRI convention for ESRI:54009 World Mollweide (Snyder 31).
# Forward solves 2t + sin(2t) = pi*sin(phi) with a FIXED count of
# Newton steps from t0 = phi; the SQL twin (sql_mollweide_stages)
# unrolls the same count through staged CTEs so both engines walk the
# identical expression tree (nesting the iterate inline would blow up
# combinatorially — see the contributor guide's staged-CTE rule).
# ---------------------------------------------------------------------------

MOLL_ITERS = 8


def mollweide_forward(lon, lat, datum: str, lon0: float = 0.0,
                      fe: float = 0.0, fn: float = 0.0):
    a, _e, _e2 = ell_consts(datum)
    phi = np.radians(np.asarray(lat, dtype=np.float64))
    dlam = np.radians(np.asarray(lon, dtype=np.float64)) - math.radians(lon0)
    c = np.pi * np.sin(phi)
    t = phi.copy()
    for _ in range(MOLL_ITERS):
        den = 2.0 + 2.0 * np.cos(2.0 * t)
        # at the exact poles the iterate is 0/0; t = phi is already the
        # solution there (no-op everywhere the SQL twin's domain reaches)
        t = np.where(
            den < 1e-12, t,
            t - (2.0 * t + np.sin(2.0 * t) - c) / np.where(
                den < 1e-12, 1.0, den),
        )
    cx = 2.0 * math.sqrt(2.0) / math.pi * a
    cy = math.sqrt(2.0) * a
    return fe + cx * dlam * np.cos(t), fn + cy * np.sin(t)


def mollweide_inverse(x, y, datum: str, lon0: float = 0.0,
                      fe: float = 0.0, fn: float = 0.0):
    a, _e, _e2 = ell_consts(datum)
    cx = 2.0 * math.sqrt(2.0) / math.pi * a
    cy = math.sqrt(2.0) * a
    t = np.arcsin(np.clip((np.asarray(y, dtype=np.float64) - fn) / cy,
                          -1.0, 1.0))
    phi = np.arcsin(np.clip((2.0 * t + np.sin(2.0 * t)) / np.pi, -1.0, 1.0))
    dlam = (np.asarray(x, dtype=np.float64) - fe) / (cx * np.cos(t))
    return np.degrees(dlam + math.radians(lon0)), np.degrees(phi)


def sql_mollweide_stages(lon: str, lat: str, datum: str, src: str,
                         lon0: float = 0.0, fe: float = 0.0,
                         fn: float = 0.0, keep: str = "i"
                         ) -> tuple[str, str, str, str]:
    """Staged-CTE SQL twin of mollweide_forward: returns
    (stages_sql, x_expr, y_expr, final_src).  `src` must expose
    columns {keep}, {lon}, {lat}; each Newton step sees simple column
    names from the previous stage."""
    a, _e, _e2 = ell_consts(datum)
    cx = 2.0 * math.sqrt(2.0) / math.pi * a
    cy = math.sqrt(2.0) * a
    stages = [
        f"_m0 AS (SELECT {keep}, radians({lon}) - "
        f"{_d(math.radians(lon0))} AS dlam, "
        f"pi() * sin(radians({lat})) AS c, radians({lat}) AS t FROM {src})"
    ]
    for k in range(MOLL_ITERS):
        stages.append(
            f"_m{k + 1} AS (SELECT {keep}, dlam, c, "
            f"t - (2.0 * t + sin(2.0 * t) - c) / "
            f"(2.0 + 2.0 * cos(2.0 * t)) AS t FROM _m{k})"
        )
    x = f"({_d(fe)} + {_d(cx)} * dlam * cos(t))"
    y = f"({_d(fn)} + {_d(cy)} * sin(t))"
    return ",\n".join(stages), x, y, f"_m{MOLL_ITERS}"


# ---------------------------------------------------------------------------
# Hotine Oblique Mercator variant B (EPSG 9815; Snyder 9; PROJ omerc
# semantics — continuous atan2 form, u_0 offset). Covers Swiss LV95
# (αc = 90°) and the Borneo/Malaysia RSO grids.
# ---------------------------------------------------------------------------

def homerc_consts(datum: str, latc: float, lonc: float, alpha: float,
                  gamma: float, k0: float):
    """Folded constants (A, B, H, gamma0, lam0, u0) of the oblique
    aposphere — plain floats so the SQL twin embeds the SAME values."""
    a, e, e2 = ell_consts(datum)
    pc = math.radians(latc)
    sc, cc = math.sin(pc), math.cos(pc)
    B = math.sqrt(1.0 + e2 * cc ** 4 / (1.0 - e2))
    A = a * B * k0 * math.sqrt(1.0 - e2) / (1.0 - e2 * sc * sc)
    t0 = math.tan(math.pi / 4.0 - pc / 2.0) / (
        (1.0 - e * sc) / (1.0 + e * sc)) ** (e / 2.0)
    D = B * math.sqrt(1.0 - e2) / (cc * math.sqrt(1.0 - e2 * sc * sc))
    D2 = max(D * D, 1.0)
    F = D + math.sqrt(D2 - 1.0) * (1.0 if latc >= 0.0 else -1.0)
    H = F * t0 ** B
    G = (F - 1.0 / F) / 2.0
    gamma0 = math.asin(math.sin(math.radians(alpha)) / D)
    lam0 = math.radians(lonc) - math.asin(G * math.tan(gamma0)) / B
    # variant B offset: u evaluated AT the projection centre, so
    # (latc, lonc) -> (FE, FN) exactly.  Equal to the EPSG analytic
    # (A/B)·atan(sqrt(D²-1)/cos αc)·SIGN(latc) away from αc = 90°
    # (bit-identical on the Timbalai worked example); at αc = 90°
    # (Swiss LV95) the analytic forms drift 4-13 cm at the centre.
    dlam_c = math.radians(lonc) - lam0
    Qc = H / t0 ** B
    Sc = (Qc - 1.0 / Qc) / 2.0
    u0 = A / B * math.atan2(
        Sc * math.cos(gamma0) + math.sin(B * dlam_c) * math.sin(gamma0),
        math.cos(B * dlam_c),
    )
    return A, B, H, gamma0, lam0, u0


def homerc_forward(lon, lat, datum: str, latc: float, lonc: float,
                   alpha: float, gamma: float, k0: float,
                   fe: float = 0.0, fn: float = 0.0):
    a, e, e2 = ell_consts(datum)
    A, B, H, g0, lam0, u0 = homerc_consts(datum, latc, lonc, alpha,
                                          gamma, k0)
    phi = np.radians(np.asarray(lat, dtype=np.float64))
    dlam = np.radians(np.asarray(lon, dtype=np.float64)) - lam0
    s = np.sin(phi)
    # exp/ln powers mirror the SQL twin term-for-term
    t = np.tan(np.pi / 4.0 - phi / 2.0) / np.exp(
        (e / 2.0) * np.log((1.0 - e * s) / (1.0 + e * s)))
    Q = H / np.exp(B * np.log(t))
    S = (Q - 1.0 / Q) / 2.0
    T = (Q + 1.0 / Q) / 2.0
    V = np.sin(B * dlam)
    Cc = np.cos(B * dlam)
    U = (S * math.sin(g0) - V * math.cos(g0)) / T
    v = A * np.log((1.0 - U) / (1.0 + U)) / (2.0 * B)
    u = (A / B) * np.arctan2(S * math.cos(g0) + V * math.sin(g0), Cc) - u0
    gr = math.radians(gamma)
    x = fe + v * math.cos(gr) + u * math.sin(gr)
    y = fn + u * math.cos(gr) - v * math.sin(gr)
    return x, y


def homerc_inverse(x, y, datum: str, latc: float, lonc: float,
                   alpha: float, gamma: float, k0: float,
                   fe: float = 0.0, fn: float = 0.0, iters: int = 15):
    a, e, e2 = ell_consts(datum)
    A, B, H, g0, lam0, u0 = homerc_consts(datum, latc, lonc, alpha,
                                          gamma, k0)
    gr = math.radians(gamma)
    xp = np.asarray(x, dtype=np.float64) - fe
    yp = np.asarray(y, dtype=np.float64) - fn
    u = yp * math.cos(gr) + xp * math.sin(gr) + u0
    v = xp * math.cos(gr) - yp * math.sin(gr)
    Qp = np.exp(-(B / A) * v)
    Sp = (Qp - 1.0 / Qp) / 2.0
    Tp = (Qp + 1.0 / Qp) / 2.0
    Vp = np.sin((B / A) * u)
    Up = (Vp * math.cos(g0) + Sp * math.sin(g0)) / Tp
    ts = np.exp((1.0 / B) * np.log(H / np.sqrt((1.0 + Up) / (1.0 - Up))))
    # Mercator inverse latitude (pj_phi2 fixed-point)
    phi = np.pi / 2.0 - 2.0 * np.arctan(ts)
    for _ in range(iters):
        sp = np.sin(phi)
        phi = np.pi / 2.0 - 2.0 * np.arctan(
            ts * np.exp((e / 2.0) * np.log((1.0 - e * sp) / (1.0 + e * sp)))
        )
    lam = -np.arctan2(Sp * math.cos(g0) - Vp * math.sin(g0),
                      np.cos((B / A) * u)) / B
    return np.degrees(lam + lam0), np.degrees(phi)


def sql_homerc_stages(lon: str, lat: str, datum: str, src: str,
                      latc: float, lonc: float, alpha: float,
                      gamma: float, k0: float, fe: float = 0.0,
                      fn: float = 0.0, keep: str = "i"
                      ) -> tuple[str, str, str, str]:
    """Staged-CTE SQL twin of homerc_forward (the S/T/U/v/u tree must
    not nest inline — each stage sees simple column names)."""
    a, e, e2 = ell_consts(datum)
    A, B, H, g0, lam0, u0 = homerc_consts(datum, latc, lonc, alpha,
                                          gamma, k0)
    sg0, cg0 = math.sin(g0), math.cos(g0)
    gr = math.radians(gamma)
    phi = f"radians({lat})"
    s = f"sin({phi})"
    t = (
        f"(tan(pi() / 4.0 - ({phi}) / 2.0) / exp({_d(e / 2.0)} * "
        f"ln((1.0 - {_d(e)} * ({s})) / (1.0 + {_d(e)} * ({s})))))"
    )
    stages = [
        f"_ho0 AS (SELECT {keep}, radians({lon}) - {_d(lam0)} AS dlam, "
        f"{t} AS t FROM {src})",
        f"_ho1 AS (SELECT {keep}, dlam, {_d(H)} / exp({_d(B)} * ln(t)) "
        f"AS q FROM _ho0)",
        f"_ho2 AS (SELECT {keep}, (q - 1.0 / q) / 2.0 AS s2, "
        f"(q + 1.0 / q) / 2.0 AS t2, sin({_d(B)} * dlam) AS vv, "
        f"cos({_d(B)} * dlam) AS cc FROM _ho1)",
        f"_ho3 AS (SELECT {keep}, "
        f"(s2 * {_d(sg0)} - vv * {_d(cg0)}) / t2 AS uu, "
        f"atan2(s2 * {_d(cg0)} + vv * {_d(sg0)}, cc) AS at FROM _ho2)",
        f"_ho4 AS (SELECT {keep}, "
        f"{_d(A)} * ln((1.0 - uu) / (1.0 + uu)) / {_d(2.0 * B)} AS pv, "
        f"{_d(A / B)} * at - {_d(u0)} AS pu FROM _ho3)",
    ]
    x = f"({_d(fe)} + pv * {_d(math.cos(gr))} + pu * {_d(math.sin(gr))})"
    y = f"({_d(fn)} + pu * {_d(math.cos(gr))} - pv * {_d(math.sin(gr))})"
    return ",\n".join(stages), x, y, "_ho4"


# ---------------------------------------------------------------------------
# Krovak (EPSG 9819 — S-JTSK, the Czech/Slovak oblique conformal
# conic; PROJ krovak semantics with the method's fixed Czech
# constants).  East-North variant (EPSG:5514): both axes negated,
# Czech territory lands at negative coordinates.
# ---------------------------------------------------------------------------

_KROVAK_UQ = 1.04216856380474     # cartographic-pole colat seed (59°42'42.69689")
_KROVAK_S0 = 1.37008346281555     # pseudo standard parallel (78°30')


def krovak_consts(datum: str, lat0: float, k0: float):
    a, e, e2 = ell_consts(datum)
    p0 = math.radians(lat0)
    s0v = math.sin(p0)
    B = math.sqrt(1.0 + e2 * math.cos(p0) ** 4 / (1.0 - e2))
    u0 = math.asin(s0v / B)
    g = ((1.0 + e * s0v) / (1.0 - e * s0v)) ** (B * e / 2.0)
    K = math.tan(u0 / 2.0 + math.pi / 4.0) / math.tan(
        p0 / 2.0 + math.pi / 4.0) ** B * g
    n0 = math.sqrt(1.0 - e2) / (1.0 - e2 * s0v * s0v)
    n = math.sin(_KROVAK_S0)
    rho0 = k0 * n0 / math.tan(_KROVAK_S0)
    ad = math.pi / 2.0 - _KROVAK_UQ
    return B, K, n, rho0, ad


def krovak_forward(lon, lat, datum: str, lat0: float, lonc: float,
                   k0: float, fe: float = 0.0, fn: float = 0.0):
    a, e, e2 = ell_consts(datum)
    B, K, n, rho0, ad = krovak_consts(datum, lat0, k0)
    phi = np.radians(np.asarray(lat, dtype=np.float64))
    dlam = np.radians(np.asarray(lon, dtype=np.float64)) - math.radians(lonc)
    s = np.sin(phi)
    gfi = np.exp((e * B / 2.0) * np.log((1.0 + e * s) / (1.0 - e * s)))
    u = 2.0 * (np.arctan(
        K * np.exp(B * np.log(np.tan(phi / 2.0 + np.pi / 4.0))) / gfi
    ) - np.pi / 4.0)
    deltav = -dlam * B
    sv = np.arcsin(np.cos(ad) * np.sin(u)
                   + np.sin(ad) * np.cos(u) * np.cos(deltav))
    d = np.arcsin(np.cos(u) * np.sin(deltav) / np.cos(sv))
    eps = n * d
    rho = rho0 * np.exp(n * np.log(
        math.tan(_KROVAK_S0 / 2.0 + math.pi / 4.0)
        / np.tan(sv / 2.0 + np.pi / 4.0)))
    # a (dimensionless rho) × a scales to meters; East-North axes
    x = fe - a * rho * np.sin(eps)
    y = fn - a * rho * np.cos(eps)
    return x, y


def krovak_inverse(x, y, datum: str, lat0: float, lonc: float,
                   k0: float, fe: float = 0.0, fn: float = 0.0,
                   iters: int = 10):
    a, e, e2 = ell_consts(datum)
    B, K, n, rho0, ad = krovak_consts(datum, lat0, k0)
    xs = -(np.asarray(x, dtype=np.float64) - fe) / a
    ys = -(np.asarray(y, dtype=np.float64) - fn) / a
    rho = np.sqrt(xs * xs + ys * ys)
    eps = np.arctan2(xs, ys)
    d = eps / n
    sv = 2.0 * (np.arctan(
        np.exp((1.0 / n) * np.log(rho0 / rho))
        * math.tan(_KROVAK_S0 / 2.0 + math.pi / 4.0)) - np.pi / 4.0)
    u = np.arcsin(np.cos(ad) * np.sin(sv)
                  - np.sin(ad) * np.cos(sv) * np.cos(d))
    deltav = np.arcsin(np.cos(sv) * np.sin(d) / np.cos(u))
    phi = u
    base = np.exp((1.0 / B) * np.log(
        np.tan(u / 2.0 + np.pi / 4.0) / K))
    for _ in range(iters):
        sp = np.sin(phi)
        phi = 2.0 * (np.arctan(
            base * np.exp((e / 2.0) * np.log((1.0 + e * sp) / (1.0 - e * sp)))
        ) - np.pi / 4.0)
    return (
        np.degrees(math.radians(lonc) - deltav / B),
        np.degrees(phi),
    )


def sql_krovak_stages(lon: str, lat: str, datum: str, src: str,
                      lat0: float, lonc: float, k0: float,
                      fe: float = 0.0, fn: float = 0.0, keep: str = "i"
                      ) -> tuple[str, str, str, str]:
    """Staged-CTE SQL twin of krovak_forward."""
    a, e, e2 = ell_consts(datum)
    B, K, n, rho0, ad = krovak_consts(datum, lat0, k0)
    phi = f"radians({lat})"
    s = f"sin({phi})"
    gfi = (
        f"exp({_d(e * B / 2.0)} * ln((1.0 + {_d(e)} * ({s})) / "
        f"(1.0 - {_d(e)} * ({s}))))"
    )
    u = (
        f"(2.0 * (atan({_d(K)} * exp({_d(B)} * "
        f"ln(tan(({phi}) / 2.0 + pi() / 4.0))) / {gfi}) - pi() / 4.0))"
    )
    stages = [
        f"_k0 AS (SELECT {keep}, {u} AS u, "
        f"-(radians({lon}) - {_d(math.radians(lonc))}) * {_d(B)} AS dv "
        f"FROM {src})",
        f"_k1 AS (SELECT {keep}, u, dv, "
        f"asin({_d(math.cos(ad))} * sin(u) + {_d(math.sin(ad))} * "
        f"cos(u) * cos(dv)) AS sv FROM _k0)",
        f"_k2 AS (SELECT {keep}, "
        f"{_d(n)} * asin(cos(u) * sin(dv) / cos(sv)) AS eps, "
        f"{_d(rho0)} * exp({_d(n)} * ln("
        f"{_d(math.tan(_KROVAK_S0 / 2.0 + math.pi / 4.0))} / "
        f"tan(sv / 2.0 + pi() / 4.0))) AS rho FROM _k1)",
    ]
    x = f"({_d(fe)} - {_d(a)} * rho * sin(eps))"
    y = f"({_d(fn)} - {_d(a)} * rho * cos(eps))"
    return ",\n".join(stages), x, y, "_k2"


# ---------------------------------------------------------------------------
# EPSG parameter registry + reproject dispatch
# (the engine's stand-in for PROJ's database-driven pipeline
# selection, ogr/ogrct.cpp:1091)
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class CrsDef:
    method: str
    datum: str
    params: dict = field(default_factory=dict)


def _utm_def(zone: int, south: bool) -> CrsDef:
    return CrsDef("utm", "WGS84", {"zone": zone, "south": south})


REGISTRY: dict[int | str, CrsDef] = {
    4326: CrsDef("geographic", "WGS84"),
    4269: CrsDef("geographic", "NAD83"),
    4277: CrsDef("geographic", "OSGB36"),
    4289: CrsDef("geographic", "AMERSFOORT"),
    3857: CrsDef("webmerc", "WGS84"),
    # NAD83 / Conus Albers
    5070: CrsDef("albers", "NAD83", dict(
        lat1=29.5, lat2=45.5, lat0=23.0, lon0=-96.0, fe=0.0, fn=0.0)),
    # WGS 84 / Antarctic Polar Stereographic
    3031: CrsDef("polar_stereo", "WGS84", dict(
        lat_ts=-71.0, lon0=0.0, fe=0.0, fn=0.0)),
    # WGS 84 / NSIDC Sea Ice Polar Stereographic North
    3413: CrsDef("polar_stereo", "WGS84", dict(
        lat_ts=70.0, lon0=-45.0, fe=0.0, fn=0.0)),
    # OSGB36 / British National Grid (Airy TM + Helmert via datum.py)
    27700: CrsDef("tm", "OSGB36", dict(
        k0=0.9996012717, lon0=-2.0, lat0=49.0, fe=400000.0,
        fn=-100000.0)),
    # Amersfoort / RD New (oblique stereographic, Bessel)
    28992: CrsDef("oblique_stereo", "AMERSFOORT", dict(
        lat0=52.15616055555555, lon0=5.38763888888889,
        k0=0.9999079, fe=155000.0, fn=463000.0)),
    # WGS 84 / World Equidistant Cylindrical (EPSG 1028)
    4087: CrsDef("eqc", "WGS84", dict(lat1=0.0, lon0=0.0, fe=0.0, fn=0.0)),
    # Trinidad 1903 / Trinidad Grid (Cassini-Soldner, EPSG 9806) —
    # axis + ellipsoid unit is CLARKE'S LINKS; lat0 = 10d26'30"N,
    # lon0 = 61d20'00"W (the EPSG Guidance worked example CRS)
    30200: CrsDef("cassini", "TRINIDAD1903", dict(
        lat0=10.0 + 26.0 / 60.0 + 30.0 / 3600.0,
        lon0=-(61.0 + 20.0 / 60.0),
        fe=430000.0, fn=325000.0)),
    # WGS 84 / World Mercator (ellipsoidal 1SP)
    3395: CrsDef("mercator", "WGS84", dict(k0=1.0, lon0=0.0, fe=0.0, fn=0.0)),
    # Universal Polar Stereographic (variant A, k0 = 0.994)
    5041: CrsDef("polar_stereo_a", "WGS84", dict(
        k0=0.994, south=False, lon0=0.0, fe=2000000.0, fn=2000000.0)),
    5042: CrsDef("polar_stereo_a", "WGS84", dict(
        k0=0.994, south=True, lon0=0.0, fe=2000000.0, fn=2000000.0)),
    # World Sinusoidal (ESRI:54008; no EPSG twin)
    "ESRI:54008": CrsDef("sinusoidal", "WGS84", dict(
        lon0=0.0, fe=0.0, fn=0.0)),
    4258: CrsDef("geographic", "ETRS89"),
    # ETRS89-extended / LAEA Europe (EPSG method 9820)
    3035: CrsDef("laea", "ETRS89", dict(
        lat0=52.0, lon0=10.0, fe=4321000.0, fn=3210000.0)),
    # WGS 84 / NSIDC EASE-Grid 2.0 Global (EPSG method 9835)
    6933: CrsDef("cea", "WGS84", dict(
        lat_ts=30.0, lon0=0.0, fe=0.0, fn=0.0)),
    # World Mollweide (ESRI:54009; spherical on a, the PROJ convention)
    "ESRI:54009": CrsDef("mollweide", "WGS84", dict(
        lon0=0.0, fe=0.0, fn=0.0)),
    # CH1903+ / LV95 (Hotine Oblique Mercator variant B, αc = 90°)
    2056: CrsDef("homerc", "CH1903PLUS", dict(
        latc=46.952405555555565, lonc=7.439583333333333,
        alpha=90.0, gamma=90.0, k0=1.0, fe=2600000.0, fn=1200000.0)),
    # Timbalai 1948 / RSO Borneo (m) — the EPSG 9815 worked example
    29873: CrsDef("homerc", "TIMBALAI", dict(
        latc=4.0, lonc=115.0, alpha=53.31582047222222,
        gamma=53.13010236111111, k0=0.99984,
        fe=590476.87, fn=442857.65)),
    # S-JTSK / Krovak East North (EPSG 9819; lonc is 42°30' E of
    # Ferro expressed on Greenwich)
    5514: CrsDef("krovak", "SJTSK", dict(
        lat0=49.5, lonc=24.833333333333332, k0=0.9999,
        fe=0.0, fn=0.0)),
}
# WGS84 UTM zones 326xx (N) / 327xx (S)
for _z in range(1, 61):
    REGISTRY[32600 + _z] = _utm_def(_z, south=False)
    REGISTRY[32700 + _z] = _utm_def(_z, south=True)
# NAD83 UTM zones 269xx (1N-23N) and ETRS89 UTM 258xx (28N-38N):
# the generic TM method on the zone parameters (datum via Helmert,
# both GRS80-coincident at the engine's accuracy contract)
for _z in range(1, 24):
    REGISTRY[26900 + _z] = CrsDef("tm", "NAD83", dict(
        k0=0.9996, lon0=float(_z * 6 - 183), lat0=0.0,
        fe=500000.0, fn=0.0))
for _z in range(28, 39):
    REGISTRY[25800 + _z] = CrsDef("tm", "ETRS89", dict(
        k0=0.9996, lon0=float(_z * 6 - 183), lat0=0.0,
        fe=500000.0, fn=0.0))


def crs_datum(code: int | str) -> str:
    return REGISTRY[code].datum


def forward(code: int | str, lon, lat):
    """lon/lat degrees (on the CRS's own datum) -> projected x, y."""
    d = REGISTRY[code]
    p = d.params
    if d.method == "geographic":
        return np.asarray(lon, dtype=np.float64), np.asarray(lat, dtype=np.float64)
    if d.method == "webmerc":
        R = 6378137.0
        return (
            R * np.radians(np.asarray(lon, dtype=np.float64)),
            R * np.log(np.tan(np.pi / 4.0 + np.radians(
                np.asarray(lat, dtype=np.float64)) / 2.0)),
        )
    if d.method == "utm":
        from gdal_spark.geo import crs as _crs

        x, y = _crs.utm_forward(lon, lat, p["zone"])
        if p["south"]:
            y = y + _crs.FALSE_NORTHING_SOUTH
        return x, y
    if d.method == "tm":
        from gdal_spark.geo.datum import tm_forward as _tmf

        return _tmf(lon, lat, d.datum, p["k0"], p["lon0"], p["lat0"],
                    p["fe"], p["fn"])
    if d.method == "albers":
        return albers_forward(lon, lat, d.datum, **p)
    if d.method == "polar_stereo":
        return polar_stereo_forward(lon, lat, d.datum, **p)
    if d.method == "polar_stereo_a":
        return polar_stereo_a_forward(lon, lat, d.datum, **p)
    if d.method == "mercator":
        return mercator_forward(lon, lat, d.datum, **p)
    if d.method == "oblique_stereo":
        return oblique_stereo_forward(lon, lat, d.datum, **p)
    if d.method == "sinusoidal":
        return sinusoidal_forward(lon, lat, d.datum, **p)
    if d.method == "eqc":
        return eqc_forward(lon, lat, d.datum, **p)
    if d.method == "cassini":
        return cassini_forward(lon, lat, d.datum, **p)
    if d.method == "laea":
        return laea_forward(lon, lat, d.datum, **p)
    if d.method == "cea":
        return cea_forward(lon, lat, d.datum, **p)
    if d.method == "mollweide":
        return mollweide_forward(lon, lat, d.datum, **p)
    if d.method == "homerc":
        return homerc_forward(lon, lat, d.datum, **p)
    if d.method == "krovak":
        return krovak_forward(lon, lat, d.datum, **p)
    raise KeyError(f"unsupported method {d.method!r}")


def inverse(code: int | str, x, y):
    """projected x, y -> lon/lat degrees on the CRS's own datum."""
    d = REGISTRY[code]
    p = d.params
    if d.method == "geographic":
        return np.asarray(x, dtype=np.float64), np.asarray(y, dtype=np.float64)
    if d.method == "webmerc":
        R = 6378137.0
        return (
            np.degrees(np.asarray(x, dtype=np.float64) / R),
            np.degrees(2.0 * np.arctan(np.exp(
                np.asarray(y, dtype=np.float64) / R)) - np.pi / 2.0),
        )
    if d.method == "utm":
        from gdal_spark.geo import crs as _crs

        return _crs.utm_inverse(x, y, p["zone"], northern=not p["south"])
    if d.method == "tm":
        from gdal_spark.geo.datum import tm_inverse as _tmi

        return _tmi(x, y, d.datum, p["k0"], p["lon0"], p["lat0"],
                    p["fe"], p["fn"])
    if d.method == "albers":
        return albers_inverse(x, y, d.datum, **p)
    if d.method == "polar_stereo":
        return polar_stereo_inverse(x, y, d.datum, **p)
    if d.method == "polar_stereo_a":
        return polar_stereo_a_inverse(x, y, d.datum, **p)
    if d.method == "mercator":
        return mercator_inverse(x, y, d.datum, **p)
    if d.method == "oblique_stereo":
        return oblique_stereo_inverse(x, y, d.datum, **p)
    if d.method == "sinusoidal":
        return sinusoidal_inverse(x, y, d.datum, **p)
    if d.method == "eqc":
        return eqc_inverse(x, y, d.datum, **p)
    if d.method == "cassini":
        return cassini_inverse(x, y, d.datum, **p)
    if d.method == "laea":
        return laea_inverse(x, y, d.datum, **p)
    if d.method == "cea":
        return cea_inverse(x, y, d.datum, **p)
    if d.method == "mollweide":
        return mollweide_inverse(x, y, d.datum, **p)
    if d.method == "homerc":
        return homerc_inverse(x, y, d.datum, **p)
    if d.method == "krovak":
        return krovak_inverse(x, y, d.datum, **p)
    raise KeyError(f"unsupported method {d.method!r}")


def reproject(x, y, src: int | str, dst: int | str):
    """Any supported pair: inverse(src) -> Helmert datum crossing
    (through WGS84, gdal_spark.geo.datum) -> forward(dst).
    src/dst accept anything resolve_crs takes ('EPSG:n', proj4, …)."""
    if src not in REGISTRY:
        src = resolve_crs(src)
    if dst not in REGISTRY:
        dst = resolve_crs(dst)
    lon, lat = inverse(src, x, y)
    sd, dd = crs_datum(src), crs_datum(dst)
    if sd != dd:
        lon, lat, _h = datum_shift(lon, lat, sd, dd)
    return forward(dst, lon, lat)


def sql_forward(code: int | str, lon: str, lat: str) -> tuple[str, str]:
    """DuckDB SQL twins of forward() (oracle side)."""
    d = REGISTRY[code]
    p = d.params
    if d.method == "albers":
        return sql_albers_forward(lon, lat, d.datum, **p)
    if d.method == "polar_stereo":
        return sql_polar_stereo_forward(lon, lat, d.datum, **p)
    if d.method == "polar_stereo_a":
        return sql_polar_stereo_a_forward(lon, lat, d.datum, **p)
    if d.method == "mercator":
        return sql_mercator_forward(lon, lat, d.datum, **p)
    if d.method == "oblique_stereo":
        return sql_oblique_stereo_forward(lon, lat, d.datum, **p)
    if d.method == "sinusoidal":
        return sql_sinusoidal_forward(lon, lat, d.datum, **p)
    if d.method == "eqc":
        return sql_eqc_forward(lon, lat, d.datum, **p)
    if d.method == "cassini":
        return sql_cassini_forward(lon, lat, d.datum, **p)
    if d.method == "laea":
        return sql_laea_forward(lon, lat, d.datum, **p)
    if d.method == "cea":
        return sql_cea_forward(lon, lat, d.datum, **p)
    raise KeyError(f"no SQL twin for method {d.method!r}")


def sql_forward_stages(code: int | str, lon: str, lat: str, src: str,
                       keep: str = "i") -> tuple[str, str, str, str]:
    """Staged-CTE SQL twin of forward() for methods whose expression
    tree must not be nested inline (fixed-iteration Mollweide).
    Returns (stages_sql, x_expr, y_expr, final_src); stages_sql is ''
    for methods whose sql_forward is a plain expression pair."""
    d = REGISTRY[code]
    if d.method == "mollweide":
        return sql_mollweide_stages(lon, lat, d.datum, src,
                                    keep=keep, **d.params)
    if d.method == "homerc":
        return sql_homerc_stages(lon, lat, d.datum, src,
                                 keep=keep, **d.params)
    if d.method == "krovak":
        return sql_krovak_stages(lon, lat, d.datum, src,
                                 keep=keep, **d.params)
    x, y = sql_forward(code, lon, lat)
    return "", x, y, src


def sql_inverse(code: int | str, x: str, y: str) -> tuple[str, str]:
    """DuckDB SQL twins of inverse() for the closed-form inverses
    (polar stereographic, sinusoidal, equidistant cylindrical)."""
    d = REGISTRY[code]
    p = d.params
    if d.method == "polar_stereo":
        return sql_polar_stereo_inverse(x, y, d.datum, **p)
    if d.method == "sinusoidal":
        return sql_sinusoidal_inverse(x, y, d.datum, **p)
    if d.method == "eqc":
        return sql_eqc_inverse(x, y, d.datum, **p)
    if d.method == "cea":
        return sql_cea_inverse(x, y, d.datum, **p)
    raise KeyError(f"no closed-form SQL inverse for {d.method!r}")


# ---------------------------------------------------------------------------
# user-input CRS resolution (OGRSpatialReference::SetFromUserInput,
# ogr/ogrspatialreference.cpp — "EPSG:n", bare codes, and the
# high-frequency proj4 strings map onto the registry)
# ---------------------------------------------------------------------------

# registry geographic codes per datum (shared with geo/wktcrs.py)
GEOGRAPHIC_CODES = {
    "WGS84": 4326,
    "NAD83": 4269,
    "OSGB36": 4277,
    "AMERSFOORT": 4289,
    "ETRS89": 4258,
}


def _datum_from_proj4(kv: dict) -> str:
    """Infer the datum from +datum/+ellps/+towgs84 (NAD83 and ETRS89
    are indistinguishable in proj4 terms; NAD83 wins by order)."""
    if str(kv.get("datum", "")).upper() == "WGS84":
        return "WGS84"
    ell = str(kv.get("ellps", "WGS84"))
    tw = tuple(float(v) for v in str(kv.get("towgs84", "0,0,0")).split(","))
    tw = tw + (0.0,) * (7 - len(tw))
    for name, (e, towgs84) in DATUMS.items():
        if e != ell:
            continue
        if all(abs(x - y) <= 1e-9 for x, y in zip(tw, towgs84)):
            return name
    raise KeyError(f"proj4 datum not in the registry: "
                   f"ellps={ell} towgs84={kv.get('towgs84')}")


def to_proj4(code) -> str:
    """Registry key -> proj4 string (exportToProj4,
    ogr/ogrspatialreference.cpp).  resolve_crs(to_proj4(k)) == k for
    every registry entry whose method has a proj4 name."""
    key = code if code in REGISTRY else resolve_crs(code)
    d = REGISTRY[key]
    ell = DATUMS[d.datum][0]
    ell_p4 = {"WGS84": "WGS84", "GRS80": "GRS80", "intl": "intl",
              "airy": "airy", "bessel": "bessel", "krass": "krass",
              "clrk66": "clrk66", "evrst30": "evrst30"}.get(ell)
    tw = DATUMS[d.datum][1]
    if ell_p4 is None:
        # no proj4 alias (e.g. Clarke 1858 in links): explicit +a/+rf
        a_, rf_ = ELLIPSOIDS[ell]
        ell_part = f"+a={a_!r} +rf={rf_!r}"
    else:
        ell_part = f"+ellps={ell_p4}"
    datum_part = f"{ell_part} +towgs84=" + ",".join(
        repr(v) if v != int(v) else str(int(v)) for v in tw)
    p = d.params
    if d.method == "geographic":
        return f"+proj=longlat {datum_part} +no_defs"
    if d.method == "webmerc":
        return ("+proj=merc +a=6378137 +b=6378137 +lat_ts=0 +lon_0=0 "
                "+x_0=0 +y_0=0 +k=1 +units=m +nadgrids=@null +no_defs")
    if d.method == "utm":
        s = " +south" if p["south"] else ""
        return f"+proj=utm +zone={p['zone']}{s} {datum_part} +no_defs"
    name_of = {"tm": "tmerc", "mercator": "merc", "albers": "aea",
               "polar_stereo_a": "stere", "oblique_stereo": "sterea",
               "sinusoidal": "sinu", "eqc": "eqc", "laea": "laea",
               "cea": "cea", "mollweide": "moll", "homerc": "omerc",
               "krovak": "krovak", "cassini": "cass"}
    p4_key = {"k0": "k_0", "lon0": "lon_0", "lat0": "lat_0",
              "lat1": "lat_1" if d.method == "albers" else "lat_ts",
              "lat2": "lat_2", "lat_ts": "lat_ts",
              "fe": "x_0", "fn": "y_0",
              # omerc spells the centre lonc; krovak uses lon_0
              "latc": "lat_0", "alpha": "alpha", "gamma": "gamma",
              "lonc": "lonc" if d.method == "homerc" else "lon_0"}
    if d.method == "polar_stereo":
        # variant B: proj spells it stere with lat_0=+/-90 + lat_ts
        lat0 = -90 if p["lat_ts"] < 0 else 90
        return (f"+proj=stere +lat_0={lat0} +lat_ts={p['lat_ts']!r} "
                f"+lon_0={p['lon0']!r} +x_0={p['fe']!r} +y_0={p['fn']!r} "
                f"{datum_part} +no_defs")
    if d.method not in name_of:
        raise KeyError(f"no proj4 name for method {d.method!r}")
    parts = [f"+proj={name_of[d.method]}"]
    if d.method == "polar_stereo_a":
        parts.append(f"+lat_0={-90 if p['south'] else 90}")
    for k, v in p.items():
        if k == "south":
            continue
        parts.append(f"+{p4_key[k]}={v!r}")
    parts.append(datum_part)
    parts.append("+no_defs")
    return " ".join(parts)


_PROJ4_METHODS = {
    "longlat": "geographic",
    "merc": "mercator",
    "tmerc": "tm",
    "utm": "utm",
    "aea": "albers",
    "stere": "polar_stereo_a",
    "sterea": "oblique_stereo",
    "sinu": "sinusoidal",
    "eqc": "eqc",
    "laea": "laea",
    "cea": "cea",
    "moll": "mollweide",
    "omerc": "homerc",
    "krovak": "krovak",
    "cass": "cassini",
}


def resolve_crs(user_input) -> int | str:
    """Resolve a user CRS spec to a registry key.  Accepts an int
    EPSG code, 'EPSG:n' / 'ESRI:n', a bare numeric string, or a
    '+proj=' proj4 string matching one of the supported methods with
    registry-identical parameters.  Raises KeyError with the
    supported-method list when unresolvable."""
    if isinstance(user_input, int):
        if user_input not in REGISTRY:
            raise KeyError(f"EPSG:{user_input} not in the registry")
        return user_input
    s = str(user_input).strip()
    up = s.upper()
    if up.startswith("EPSG:"):
        return resolve_crs(int(up[5:]))
    if up.startswith("ESRI:"):
        key = f"ESRI:{int(up[5:])}"
        if key not in REGISTRY:
            raise KeyError(f"{key} not in the registry")
        return key
    if s.isdigit():
        return resolve_crs(int(s))
    if up.startswith(("PROJCS", "GEOGCS", "PROJCRS", "GEOGCRS",
                      "GEODCRS")):
        from gdal_spark.geo.wktcrs import wkt_to_crs

        return wkt_to_crs(s)
    if s.startswith("+"):
        kv = {}
        for part in s.split():
            if "=" in part:
                k, v = part[1:].split("=", 1)
                kv[k] = v
            else:
                kv[part[1:]] = True
        method = _PROJ4_METHODS.get(kv.get("proj", ""))
        # spherical-Mercator spelling (+a=+b or +nadgrids=@null) is
        # web mercator, never the ellipsoidal 1SP method
        if kv.get("proj") == "merc" and (
                kv.get("nadgrids") == "@null"
                or ("a" in kv and kv.get("a") == kv.get("b"))):
            return 3857
        # stere with a standard parallel is EPSG's variant B
        if method == "polar_stereo_a" and "lat_ts" in kv:
            method = "polar_stereo"
        if method == "utm" and "zone" in kv:
            zone = int(kv["zone"])
            return (32700 if kv.get("south") else 32600) + zone
        if method == "geographic":
            datum = _datum_from_proj4(kv)
            code = GEOGRAPHIC_CODES.get(datum)
            if code is None:
                raise KeyError(
                    f"no geographic registry code for datum {datum}")
            return code
        # match a registry entry by method + parameter values
        def close(a: float, b: float) -> bool:
            return abs(a - b) <= 1e-9 * max(1.0, abs(a), abs(b))

        p4_of = {
            "mercator": {"k0": "k_0", "lon0": "lon_0",
                         "fe": "x_0", "fn": "y_0"},
            "tm": {"k0": "k_0", "lon0": "lon_0", "lat0": "lat_0",
                   "fe": "x_0", "fn": "y_0"},
            "albers": {"lat1": "lat_1", "lat2": "lat_2",
                       "lat0": "lat_0", "lon0": "lon_0",
                       "fe": "x_0", "fn": "y_0"},
            "polar_stereo_a": {"k0": "k_0", "lon0": "lon_0",
                               "fe": "x_0", "fn": "y_0"},
            "polar_stereo": {"lat_ts": "lat_ts", "lon0": "lon_0",
                             "fe": "x_0", "fn": "y_0"},
            "oblique_stereo": {"k0": "k_0", "lon0": "lon_0",
                               "lat0": "lat_0", "fe": "x_0",
                               "fn": "y_0"},
            "sinusoidal": {"lon0": "lon_0", "fe": "x_0", "fn": "y_0"},
            "eqc": {"lat1": "lat_ts", "lon0": "lon_0",
                    "fe": "x_0", "fn": "y_0"},
            "laea": {"lat0": "lat_0", "lon0": "lon_0",
                     "fe": "x_0", "fn": "y_0"},
            "cea": {"lat_ts": "lat_ts", "lon0": "lon_0",
                    "fe": "x_0", "fn": "y_0"},
            "mollweide": {"lon0": "lon_0", "fe": "x_0", "fn": "y_0"},
            "homerc": {"latc": "lat_0", "lonc": "lonc",
                       "alpha": "alpha", "gamma": "gamma",
                       "k0": "k_0", "fe": "x_0", "fn": "y_0"},
            "krovak": {"lat0": "lat_0", "lonc": "lon_0",
                       "k0": "k_0", "fe": "x_0", "fn": "y_0"},
            "cassini": {"lat0": "lat_0", "lon0": "lon_0",
                        "fe": "x_0", "fn": "y_0"},
        }
        defaults = {"k_0": 1.0, "lon_0": 0.0, "lat_0": 0.0,
                    "lat_ts": 0.0, "x_0": 0.0, "y_0": 0.0,
                    "lat_1": 0.0, "lat_2": 0.0}
        if method in p4_of:
            for key, d in REGISTRY.items():
                if d.method != method:
                    continue
                ok = True
                for pk, p4k in p4_of[method].items():
                    if pk == "south":
                        continue
                    want = d.params.get(pk)
                    got = float(kv.get(p4k, defaults.get(p4k, 0.0)))
                    if want is None or not close(float(want), got):
                        ok = False
                        break
                if ok and method == "polar_stereo_a":
                    south = d.params.get("south", False)
                    lat0 = float(kv.get("lat_0", 90.0))
                    if south != (lat0 < 0):
                        ok = False
                if ok:
                    return key
    raise KeyError(
        f"cannot resolve CRS {user_input!r}; registry methods: "
        f"{sorted({d.method for d in REGISTRY.values()})}"
    )
