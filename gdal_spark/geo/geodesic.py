"""Ellipsoidal geodesic inverse problem + polygon area (WGS84).

Re-derives the semantics of the reference's PROJ-backed
get_GeodesicArea / get_GeodesicLength:

- /root/reference/ogr/ogrlinestring.cpp:3230 (get_GeodesicArea:
  ``geod_polygonarea`` then ``fabs``) and :3251 (get_GeodesicLength:
  per-edge ``geod_inverse`` s12 summed);
- /root/reference/ogr/ogrsurface.cpp:39,111 (polygon = |outer| minus
  |holes|; lengths include inner rings);
- conformance anchors: /root/reference/autotest/ogr/ogr_geom.py
  test_ogr_geom_GeodesicArea / test_ogr_geom_GeodesicLength (PROJ
  outputs pinned to 1e-6 relative, reproduced in tests/test_geodesic.py).

The ALGORITHM is not a GeographicLib/PROJ port.  PROJ evaluates
Karney's order-6 series; here the three geodesic integrals are
evaluated by fixed 20-point Gauss-Legendre quadrature on the exact
integrands, inside a fixed-count Newton iteration on the departure
azimuth over Bessel's auxiliary sphere (all public theory: Bessel
1825, Karney, J. Geodesy 87:43-55 (2013) eqs. 5-11 for the variable
relations).  Every step is elementary sin/cos/atan2/sqrt math, so the
whole pipeline exists in two token-mirrored forms:

- vectorized numpy over edge arrays (the pandas-UDF path used by
  ST_GeodesicArea / ST_GeodesicLength);
- a DuckDB SQL text generator (sql_* below) staged through CTEs with
  one CTE per Newton step, used by the driver oracles.

Fixed iteration/node counts (no data-dependent breaks) keep the two
engines on identical operation trees; residual float differences are
libm-ulp sized (~1e-14 relative), far below the 1e4 m^2 / 10 m output
quanta (CLAUDE.md float-parity rules).

Variable relations used (auxiliary sphere; Karney 2013 eqs. 5-11):
    sin(alpha0) = sin(alpha) cos(beta)
    sin(beta)   = cos(alpha0) sin(sigma)
    tan(sigma)  = tan(beta) / cos(alpha)
    omega       = atan2(sin(alpha0) sin(sigma), cos(sigma))
    lambda      = omega - f sin(alpha0) I3(sigma)
    s           = b I1(sigma)
with the exact integrands
    I1' = sqrt(1 + k2 sin^2 sigma),           k2 = ep2 cos^2(alpha0)
    I3' = (2-f) / (1 + (1-f) sqrt(1 + k2 sin^2 sigma))
    J'  = k2 sin^2 sigma / sqrt(1 + k2 sin^2 sigma)
and the reduced length (for Newton's d(lambda12)/d(alpha1))
    m12/b = w2 cos(s1) sin(s2) - w1 sin(s1) cos(s2)
            - cos(s1) cos(s2) (J(s2) - J(s1)),  w_i = I1'(sigma_i).

Area is Green's theorem about the equator: the ellipsoidal zone
function (exact closed form, derived by integrating the area element
M N cos(phi) dphi)
    Fz(phi) = (a^2 (1-e2) / 2) (sin(phi)/(1 - e2 sin^2 phi)
              + atanh(e sin(phi)) / e)
gives the enclosed area of a CCW ring as the sum over edges of
    S_edge = integral_{sigma1}^{sigma2} Fz(phi(sigma))
             (dlambda/dsigma) dsigma,
    dlambda/dsigma = sin(alpha0) u / (1 - cos^2(alpha0) sin^2 sigma),
    u = sqrt(1 - e2 cos^2 beta) = (1-f) I1'(sigma)
(an exact identity, provable from Clairaut r sin(alpha) = a sin(alpha0)
with r = a cos(beta) and ds = b I1' dsigma).  The integrand's
1/(1 - ca0^2 sin^2 sigma) factor peaks near the geodesic vertex with
width ~sin(alpha0), so the spherical part is integrated in CLOSED FORM
    integral a^2 sin(beta) sa0/(1-c) dsigma
        = a^2 [atan2(ca0 cos s1, sa0) - atan2(ca0 cos s2, sa0)]
(= a^2 (alpha2 - alpha1), the Girard gauge) and only the O(e2) smooth
remainder (Fz u - a^2 sin beta) sa0/(1-c) goes through quadrature.

Scope bounds (loud errors, documented): nearly-antipodal edges
(sigma span > ~179 deg, where the naive Newton start degenerates; the
reference handles these via Karney's astroid start) and
pole-enclosing rings.  Neither occurs in the zone fixtures nor the
reference's geodesic conformance tests.
"""

from __future__ import annotations

import numpy as np
from numpy.polynomial.legendre import leggauss

from gdal_spark.tiles.tilemath import sql_double as _d

__all__ = [
    "WGS84_A", "WGS84_F", "inverse", "line_length", "ring_area",
    "sql_edge_measures_cte",
]

WGS84_A = 6378137.0
WGS84_F = 1.0 / 298.257223563

_E2 = WGS84_F * (2.0 - WGS84_F)
_EP2 = _E2 / (1.0 - _E2)
_B = WGS84_A * (1.0 - WGS84_F)
_E = float(np.sqrt(_E2))

N_GL = 20          # Gauss-Legendre nodes (exact to ~1e-30 here)
N_NEWTON = 5       # fixed Newton steps (start is O(f)-accurate)

_GL_X, _GL_W = leggauss(N_GL)
_GL_X = [float(x) for x in _GL_X]
_GL_W = [float(w) for w in _GL_W]


# ---------------------------------------------------------------------------
# numpy implementation (vectorized over edges)
# ---------------------------------------------------------------------------

def _norm_lam(dlon_deg):
    """Longitude difference wrapped to (-180, 180], in radians."""
    d = np.remainder(np.asarray(dlon_deg, dtype=np.float64), 360.0)
    d = np.where(d > 180.0, d - 360.0, d)
    return np.radians(d)


def _beta(phi):
    """Reduced latitude: tan(beta) = (1-f) tan(phi), via sin/cos."""
    s, c = np.sin(phi), np.cos(phi)
    h = np.hypot((1.0 - WGS84_F) * s, c)
    return (1.0 - WGS84_F) * s / h, c / h


def _quad(f, s1, s2):
    """Fixed 20-point GL of f over [s1, s2] (vectorized, s1 > s2 ok)."""
    mid = 0.5 * (s1 + s2)
    half = 0.5 * (s2 - s1)
    tot = 0.0
    for x, w in zip(_GL_X, _GL_W):
        tot = tot + w * f(mid + half * x)
    return tot * half


def _zone_f(sphi):
    """Fz as a function of sin(phi) — area equator->phi per radian lon."""
    return (WGS84_A * WGS84_A * (1.0 - _E2) / 2.0) * (
        sphi / (1.0 - _E2 * sphi * sphi)
        + 0.5 * np.log((1.0 + _E * sphi) / (1.0 - _E * sphi)) / _E
    )


def inverse(lat1, lon1, lat2, lon2):
    """Vectorized geodesic inverse on WGS84.

    Returns (s12, S12): distance in metres and the signed Green-gauge
    area term (integral of Fz dlambda along the geodesic, positive for
    eastward travel) in m^2.  Summing S12 around a closed CCW ring
    gives the enclosed area.  Raises on nearly-antipodal input.
    """
    lat1 = np.atleast_1d(np.asarray(lat1, dtype=np.float64))
    lon1 = np.atleast_1d(np.asarray(lon1, dtype=np.float64))
    lat2 = np.atleast_1d(np.asarray(lat2, dtype=np.float64))
    lon2 = np.atleast_1d(np.asarray(lon2, dtype=np.float64))
    phi1, phi2 = np.radians(lat1), np.radians(lat2)
    lam12 = _norm_lam(lon2 - lon1)
    lonsign = np.where(lam12 < 0.0, -1.0, 1.0)
    lam = np.abs(lam12)

    sb1, cb1 = _beta(phi1)
    sb2, cb2 = _beta(phi2)

    # canonical arrangement: |beta1| >= |beta2| (point swap = path
    # reversal + lambda mirror = two S12 sign flips that CANCEL), then
    # beta1 <= 0 (equator mirror: S12 flips once, Fz is odd).
    swap = np.abs(sb1) * cb2 < np.abs(sb2) * cb1
    sb1, sb2 = np.where(swap, sb2, sb1), np.where(swap, sb1, sb2)
    cb1, cb2 = np.where(swap, cb2, cb1), np.where(swap, cb1, cb2)
    latsign = np.where(sb1 > 0.0, -1.0, 1.0)
    sb1, sb2 = latsign * sb1, latsign * sb2
    sign = lonsign * latsign

    coincident = (lam == 0.0) & (sb1 == sb2)
    equatorial = (sb1 == 0.0) & (sb2 == 0.0)
    if np.any(equatorial & (lam > (1.0 - WGS84_F) * np.pi)):
        raise ValueError(
            "geodesic: equatorial nearly-antipodal edge unsupported "
            "(scope bound; see module docstring)")

    s12, S12 = _solve_general(sb1, cb1, sb2, cb2, lam)

    s12 = np.where(equatorial, WGS84_A * lam, s12)
    S12 = np.where(equatorial, 0.0, S12)
    s12 = np.where(coincident, 0.0, s12)
    S12 = np.where(coincident, 0.0, S12)
    return s12, sign * S12


def _solve_general(sb1, cb1, sb2, cb2, lam):
    """Newton on alpha1 for canonical edges (beta1 <= 0, |b2| <= |b1|,
    0 <= lam <= pi).  Fixed N_NEWTON steps; loud on non-convergence."""
    # start: spherical inverse with omega ~ lam / wbar (Karney eq. 48)
    betm = 0.5 * (np.arcsin(np.clip(sb1, -1, 1))
                  + np.arcsin(np.clip(sb2, -1, 1)))
    wbar = np.sqrt(np.maximum(0.0, 1.0 - _E2 * np.cos(betm) ** 2))
    om = lam / np.where(wbar > 0, wbar, 1.0)
    alp1 = np.arctan2(cb2 * np.sin(om),
                      cb1 * sb2 - sb1 * cb2 * np.cos(om))
    # [0, pi] exactly: every formula below is non-degenerate at the
    # meridional boundary (alpha1 = 0 gives sin(alpha0) = 0 and an
    # EXACTLY zero area term; an epsilon clamp would fabricate a
    # R^2*eps sliver, ~40 m^2 at eps = 1e-12).
    alp1 = np.clip(alp1, 0.0, np.pi)

    def hybrid(alp1):
        sa1, ca1 = np.sin(alp1), np.cos(alp1)
        sa0 = sa1 * cb1
        ca0 = np.hypot(ca1, sa1 * sb1)
        k2 = _EP2 * ca0 * ca0
        # sigma_1: (sin, cos) ~ (sb1, ca1*cb1), normalized
        h1 = np.hypot(sb1, ca1 * cb1)
        ss1, cs1 = sb1 / h1, ca1 * cb1 / h1
        sig1 = np.arctan2(ss1, cs1)
        # alpha_2 >= 0 branch (first crossing of beta2)
        ca2 = np.sqrt(np.maximum(
            0.0, ca1 * ca1 * cb1 * cb1 + (cb2 * cb2 - cb1 * cb1))
        ) / np.where(cb2 > 0, cb2, 1.0)
        h2 = np.hypot(sb2, ca2 * cb2)
        ss2, cs2 = sb2 / h2, ca2 * cb2 / h2
        sig2 = np.arctan2(ss2, cs2)
        om1 = np.arctan2(sa0 * ss1, cs1)
        om2 = np.arctan2(sa0 * ss2, cs2)

        def i3p(s):
            t = k2 * np.sin(s) ** 2
            return (2.0 - WGS84_F) / (
                1.0 + (1.0 - WGS84_F) * np.sqrt(1.0 + t))

        lam_t = om2 - om1 - WGS84_F * sa0 * _quad(i3p, sig1, sig2)
        return lam_t, sa0, ca0, k2, sig1, sig2, ss1, cs1, ss2, cs2, ca2

    for _ in range(N_NEWTON):
        lam_t, sa0, ca0, k2, sig1, sig2, ss1, cs1, ss2, cs2, ca2 = \
            hybrid(alp1)

        def jp(s):
            t = k2 * np.sin(s) ** 2
            return t / np.sqrt(1.0 + t)

        w1 = np.sqrt(1.0 + k2 * ss1 * ss1)
        w2 = np.sqrt(1.0 + k2 * ss2 * ss2)
        m12b = (w2 * cs1 * ss2 - w1 * ss1 * cs2
                - cs1 * cs2 * _quad(jp, sig1, sig2))
        dlam = m12b / np.where(ca2 * cb2 > 0, ca2 * cb2, 1.0)
        step = (lam - lam_t) / np.where(np.abs(dlam) > 1e-300, dlam, 1.0)
        alp1 = np.clip(alp1 + step, 0.0, np.pi)

    lam_t, sa0, ca0, k2, sig1, sig2, ss1, cs1, ss2, cs2, ca2 = hybrid(alp1)
    resid = np.abs(lam_t - lam)
    live = ~((lam == 0.0) & (sb1 == sb2)) & ~((sb1 == 0.0) & (sb2 == 0.0))
    if np.any(resid[live] > 1e-9):
        raise ValueError(
            "geodesic: Newton failed to converge (nearly-antipodal "
            "edge?) max residual %.3e rad" % float(resid[live].max()))

    def i1p(s):
        return np.sqrt(1.0 + k2 * np.sin(s) ** 2)

    s12 = _B * _quad(i1p, sig1, sig2)

    a2 = WGS84_A * WGS84_A

    def area_rem(s):
        sb = ca0 * np.sin(s)
        sphi = sb / np.sqrt(1.0 - _E2 * (1.0 - sb * sb))
        u = np.sqrt(1.0 - _E2 * (1.0 - sb * sb))
        return ((_zone_f(sphi) * u - a2 * sb) * sa0
                / (1.0 - ca0 * ca0 * np.sin(s) ** 2))

    S12 = (a2 * (np.arctan2(ca0 * cs1, sa0) - np.arctan2(ca0 * cs2, sa0))
           + _quad(area_rem, sig1, sig2))
    return s12, S12


def line_length(coords: np.ndarray) -> float:
    """get_GeodesicLength of one (N,2) lon/lat ring or linestring:
    per-edge geod_inverse s12 summed (ogrlinestring.cpp:3251)."""
    c = np.asarray(coords, dtype=np.float64)
    if len(c) < 2:
        return 0.0
    s12, _ = inverse(c[:-1, 1], c[:-1, 0], c[1:, 1], c[1:, 0])
    return float(s12.sum())


def ring_area(ring: np.ndarray) -> float:
    """|geod_polygonarea| of one closed (N,2) lon/lat ring
    (ogrlinestring.cpp:3230 + fabs).  Pole-enclosing rings raise."""
    r = np.asarray(ring, dtype=np.float64)
    if len(r) < 4:
        return 0.0
    _, S12 = inverse(r[:-1, 1], r[:-1, 0], r[1:, 1], r[1:, 0])
    winding = _norm_lam(r[1:, 0] - r[:-1, 0]).sum()
    if abs(winding) > np.pi:
        raise ValueError("geodesic: pole-enclosing ring unsupported "
                         "(scope bound; see module docstring)")
    return abs(float(S12.sum()))


# ---------------------------------------------------------------------------
# DuckDB SQL twin — identical operation tree, staged through CTEs
# ---------------------------------------------------------------------------

def _sql_quad(body_of, s1: str, s2: str) -> str:
    """GL sum text: body_of(sigma_expr) -> integrand text."""
    terms = []
    for x, w in zip(_GL_X, _GL_W):
        sig = f"(0.5 * (({s1}) + ({s2})) + 0.5 * (({s2}) - ({s1})) * {_d(x)})"
        terms.append(f"{_d(w)} * {body_of(sig)}")
    return f"(({' + '.join(terms)}) * 0.5 * (({s2}) - ({s1})))"


def _sql_i3p(sig: str, k2: str = "k2") -> str:
    f = WGS84_F
    return (f"({_d(2.0 - f)} / (1.0 + {_d(1.0 - f)} * "
            f"sqrt(1.0 + {k2} * sin({sig}) * sin({sig}))))")


def _sql_jp(sig: str, k2: str = "k2") -> str:
    return (f"(({k2} * sin({sig}) * sin({sig})) / "
            f"sqrt(1.0 + {k2} * sin({sig}) * sin({sig})))")


def _sql_hybrid_cols(alp1: str) -> str:
    """Column list deriving the per-trial quantities from alp1 —
    mirrors hybrid() in _solve_general token-for-token."""
    f = WGS84_F
    return f"""
    sin({alp1}) * cb1 AS sa0,
    sqrt(cos({alp1}) * cos({alp1})
         + sin({alp1}) * sin({alp1}) * sb1 * sb1) AS ca0,
    {_d(_EP2)} * (cos({alp1}) * cos({alp1})
         + sin({alp1}) * sin({alp1}) * sb1 * sb1) AS k2,
    sb1 / sqrt(sb1 * sb1 + cos({alp1}) * cb1 * cos({alp1}) * cb1) AS ss1,
    cos({alp1}) * cb1
      / sqrt(sb1 * sb1 + cos({alp1}) * cb1 * cos({alp1}) * cb1) AS cs1,
    sqrt(greatest(0.0, cos({alp1}) * cos({alp1}) * cb1 * cb1
                       + (cb2 * cb2 - cb1 * cb1)))
      / (CASE WHEN cb2 > 0 THEN cb2 ELSE 1.0 END) AS ca2"""


def _sql_newton_stage(prev: str, cur: str) -> str:
    """One Newton step: reads {prev}(edge_id, sb1, cb1, sb2, cb2, lam,
    alp1), emits {cur} with the updated alp1."""
    hyb = _sql_hybrid_cols("alp1")
    i3 = _sql_quad(_sql_i3p, "sig1", "sig2")
    j12 = _sql_quad(_sql_jp, "sig1", "sig2")
    f = WGS84_F
    return f"""
{cur}_h AS (
  SELECT *, {hyb}
  FROM {prev}
),
{cur}_s AS (
  SELECT *,
    atan2(ss1, cs1) AS sig1,
    atan2(sb2 / sqrt(sb2 * sb2 + ca2 * cb2 * ca2 * cb2),
          ca2 * cb2 / sqrt(sb2 * sb2 + ca2 * cb2 * ca2 * cb2)) AS sig2,
    sb2 / sqrt(sb2 * sb2 + ca2 * cb2 * ca2 * cb2) AS ss2,
    ca2 * cb2 / sqrt(sb2 * sb2 + ca2 * cb2 * ca2 * cb2) AS cs2
  FROM {cur}_h
),
{cur}_l AS (
  SELECT *,
    atan2(sa0 * ss2, cs2) - atan2(sa0 * ss1, cs1)
      - {_d(f)} * sa0 * {i3} AS lam_t,
    (sqrt(1.0 + k2 * ss2 * ss2) * cs1 * ss2
     - sqrt(1.0 + k2 * ss1 * ss1) * ss1 * cs2
     - cs1 * cs2 * {j12})
    / (CASE WHEN ca2 * cb2 > 0 THEN ca2 * cb2 ELSE 1.0 END) AS dlam
  FROM {cur}_s
),
{cur} AS (
  SELECT edge_id, sb1, cb1, sb2, cb2, lam, sgn,
    least(pi(), greatest(0.0,
      alp1 + (lam - lam_t)
        / (CASE WHEN abs(dlam) > 1e-300 THEN dlam ELSE 1.0 END))) AS alp1
  FROM {cur}_l
)"""


def _sql_zone_f(sphi: str) -> str:
    a2 = WGS84_A * WGS84_A
    return (f"({_d(a2 * (1.0 - _E2) / 2.0)} * "
            f"(({sphi}) / (1.0 - {_d(_E2)} * ({sphi}) * ({sphi}))"
            f" + 0.5 * ln((1.0 + {_d(_E)} * ({sphi}))"
            f" / (1.0 - {_d(_E)} * ({sphi}))) / {_d(_E)}))")


def sql_edge_measures_cte(edges_cte: str) -> str:
    """DuckDB CTE chain mirroring inverse() over an edge relation.

    `edges_cte` must expose (edge_id, x1, y1, x2, y2) in lon/lat
    degrees.  Ends in `geod` with (edge_id, s12, s12_area) — s12 in
    metres, s12_area the signed Green-gauge area term in m^2 (sum
    around a CCW ring = enclosed area).  Token-mirrors the numpy path:
    same Newton count, same GL nodes, same clamps.
    """
    f = WGS84_F
    stages = "".join(
        "," + _sql_newton_stage(f"n{i}" if i else "g2", f"n{i + 1}")
        for i in range(N_NEWTON)
    )
    last = f"n{N_NEWTON}"
    hyb = _sql_hybrid_cols("alp1")
    i1 = _sql_quad(
        lambda s: f"sqrt(1.0 + k2 * sin({s}) * sin({s}))", "sig1", "sig2")

    a2 = WGS84_A * WGS84_A

    def area_body(s):
        sb = f"(ca0 * sin({s}))"
        u = f"sqrt(1.0 - {_d(_E2)} * (1.0 - {sb} * {sb}))"
        sphi = f"({sb} / {u})"
        return (f"((({_sql_zone_f(sphi)}) * {u} - {_d(a2)} * {sb}) * sa0"
                f" / (1.0 - ca0 * ca0 * sin({s}) * sin({s})))")

    srem = _sql_quad(area_body, "sig1", "sig2")
    sarea = (f"({_d(a2)} * (atan2(ca0 * cs1, sa0)"
             f" - atan2(ca0 * cs2n, sa0)) + {srem})")
    return f"""
edges_in AS ({edges_cte}),
g0 AS (
  SELECT edge_id,
    radians(CASE WHEN ((x2 - x1) - 360.0 * floor((x2 - x1) / 360.0)) > 180.0
            THEN ((x2 - x1) - 360.0 * floor((x2 - x1) / 360.0)) - 360.0
            ELSE ((x2 - x1) - 360.0 * floor((x2 - x1) / 360.0)) END) AS lam12,
    {_d(1.0 - f)} * sin(radians(y1))
      / sqrt({_d(1.0 - f)} * sin(radians(y1)) * {_d(1.0 - f)} * sin(radians(y1))
             + cos(radians(y1)) * cos(radians(y1))) AS rb1,
    cos(radians(y1))
      / sqrt({_d(1.0 - f)} * sin(radians(y1)) * {_d(1.0 - f)} * sin(radians(y1))
             + cos(radians(y1)) * cos(radians(y1))) AS rc1,
    {_d(1.0 - f)} * sin(radians(y2))
      / sqrt({_d(1.0 - f)} * sin(radians(y2)) * {_d(1.0 - f)} * sin(radians(y2))
             + cos(radians(y2)) * cos(radians(y2))) AS rb2,
    cos(radians(y2))
      / sqrt({_d(1.0 - f)} * sin(radians(y2)) * {_d(1.0 - f)} * sin(radians(y2))
             + cos(radians(y2)) * cos(radians(y2))) AS rc2
  FROM edges_in
),
g1 AS (
  SELECT edge_id, abs(lam12) AS lam,
    CASE WHEN abs(rb1) * rc2 < abs(rb2) * rc1 THEN rb2 ELSE rb1 END AS tb1,
    CASE WHEN abs(rb1) * rc2 < abs(rb2) * rc1 THEN rc2 ELSE rc1 END AS cb1,
    CASE WHEN abs(rb1) * rc2 < abs(rb2) * rc1 THEN rb1 ELSE rb2 END AS tb2,
    CASE WHEN abs(rb1) * rc2 < abs(rb2) * rc1 THEN rc1 ELSE rc2 END AS cb2,
    (CASE WHEN lam12 < 0 THEN -1.0 ELSE 1.0 END)
      * (CASE WHEN (CASE WHEN abs(rb1) * rc2 < abs(rb2) * rc1
                    THEN rb2 ELSE rb1 END) > 0 THEN -1.0 ELSE 1.0 END) AS sgn,
    (CASE WHEN (CASE WHEN abs(rb1) * rc2 < abs(rb2) * rc1
                THEN rb2 ELSE rb1 END) > 0 THEN -1.0 ELSE 1.0 END) AS latsgn
  FROM g0
),
g1c AS (
  SELECT edge_id, lam, sgn,
    latsgn * tb1 AS sb1, cb1, latsgn * tb2 AS sb2, cb2
  FROM g1
),
g2 AS (
  SELECT edge_id, sb1, cb1, sb2, cb2, lam, sgn,
    least(pi(), greatest(0.0,
      atan2(cb2 * sin(lam / (CASE WHEN sqrt(greatest(0.0,
              1.0 - {_d(_E2)} * cos(0.5 * (asin(least(1.0, greatest(-1.0, sb1)))
                + asin(least(1.0, greatest(-1.0, sb2)))))
                * cos(0.5 * (asin(least(1.0, greatest(-1.0, sb1)))
                + asin(least(1.0, greatest(-1.0, sb2))))))) > 0
            THEN sqrt(greatest(0.0,
              1.0 - {_d(_E2)} * cos(0.5 * (asin(least(1.0, greatest(-1.0, sb1)))
                + asin(least(1.0, greatest(-1.0, sb2)))))
                * cos(0.5 * (asin(least(1.0, greatest(-1.0, sb1)))
                + asin(least(1.0, greatest(-1.0, sb2))))))) ELSE 1.0 END)),
            cb1 * sb2 - sb1 * cb2 * cos(lam / (CASE WHEN sqrt(greatest(0.0,
              1.0 - {_d(_E2)} * cos(0.5 * (asin(least(1.0, greatest(-1.0, sb1)))
                + asin(least(1.0, greatest(-1.0, sb2)))))
                * cos(0.5 * (asin(least(1.0, greatest(-1.0, sb1)))
                + asin(least(1.0, greatest(-1.0, sb2))))))) > 0
            THEN sqrt(greatest(0.0,
              1.0 - {_d(_E2)} * cos(0.5 * (asin(least(1.0, greatest(-1.0, sb1)))
                + asin(least(1.0, greatest(-1.0, sb2)))))
                * cos(0.5 * (asin(least(1.0, greatest(-1.0, sb1)))
                + asin(least(1.0, greatest(-1.0, sb2))))))) ELSE 1.0 END))))) AS alp1
  FROM g1c
){stages},
fin_h AS (
  SELECT *, {hyb}
  FROM {last}
),
fin_s AS (
  SELECT *,
    atan2(ss1, cs1) AS sig1,
    atan2(sb2 / sqrt(sb2 * sb2 + ca2 * cb2 * ca2 * cb2),
          ca2 * cb2 / sqrt(sb2 * sb2 + ca2 * cb2 * ca2 * cb2)) AS sig2,
    ca2 * cb2 / sqrt(sb2 * sb2 + ca2 * cb2 * ca2 * cb2) AS cs2n
  FROM fin_h
),
geod AS (
  SELECT edge_id,
    CASE WHEN sb1 = 0 AND sb2 = 0 AND lam > 0
         THEN {_d(WGS84_A)} * lam
         WHEN lam = 0 AND sb1 = sb2 THEN 0.0
         ELSE {_d(_B)} * {i1} END AS s12,
    CASE WHEN (sb1 = 0 AND sb2 = 0) OR (lam = 0 AND sb1 = sb2) THEN 0.0
         ELSE sgn * {sarea} END AS s12_area
  FROM fin_s
)"""
