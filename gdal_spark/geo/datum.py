"""Datum pipelines: the general CRS transformation chain the
reference delegates to PROJ (ogr/ogrct.cpp:1018
OGRCreateCoordinateTransformation -> proj_create_crs_to_crs).

Implements the Helmert class of that pipeline from scratch:

    geographic(src datum) -> geocentric XYZ (src ellipsoid)
      -> 3/7-parameter Helmert (towgs84 convention) -> WGS84 XYZ
      -> geographic WGS84 (Bowring one-step inverse)
    (and the reverse with negated parameters), composed with the
    engine's projection kernels — including a GENERALIZED Krüger
    transverse Mercator over arbitrary ellipsoids, so classic
    "needs PROJ" targets like EPSG:27700 (OSGB36 / British National
    Grid on Airy 1830) run end-to-end from WGS84.

Conventions (PROJ +towgs84=tx,ty,tz,rx,ry,rz,s, position vector):
    X_wgs = T + (1 + s*1e-6) * R @ X_local,
    R = [[1, -rz, ry], [rz, 1, -rx], [-ry, rx, 1]], r* in radians
    (input arcseconds), and the reverse direction negates the
    parameters (the standard linearized inverse; second-order error
    s^2*R — millimetres at OSGB36-sized parameters).
Geocentric inverse is Bowring's one-step formula (micrometre-exact
at Earth-surface heights) — used identically in the numpy kernels
and the DuckDB SQL twins, so cross-engine differences stay at the
last-ulp level.

Grid-based datum shifts (NTv2 etc.) remain out of scope: they need
the PROJ grid files themselves; documented limitation.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "ELLIPSOIDS",
    "DATUMS",
    "geodetic_to_geocentric",
    "geocentric_to_geodetic",
    "helmert",
    "datum_shift",
    "tm_forward",
    "bng_forward",
    "sql_datum_shift",
    "sql_bng_forward",
]

# name -> (a, 1/f)
ELLIPSOIDS = {
    "WGS84": (6378137.0, 298.257223563),
    "GRS80": (6378137.0, 298.257222101),
    "intl": (6378388.0, 297.0),          # International 1924 (Hayford)
    "airy": (6377563.396, 299.3249646),  # Airy 1830
    "bessel": (6377397.155, 299.1528128),
    "krass": (6378245.0, 298.3),         # Krassowsky 1940
    "clrk66": (6378206.4, 294.978698214),  # Clarke 1866
    "evrst30": (6377298.556, 300.8017),    # Everest 1830 (1967 def)
    # Clarke 1858 in CLARKE'S LINKS (EPSG 7007: a = 20926348 ft,
    # b = 20855233 ft; 1 chain = 100 links = 66 ft) — the native
    # axis/ellipsoid unit of Trinidad 1903 / Cassini (EPSG 30200)
    "clrk58_links": (20926348.0 * 100.0 / 66.0,
                     20926348.0 / (20926348.0 - 20855233.0)),
}

# name -> (ellipsoid, towgs84 (tx, ty, tz, rx", ry", rz", s_ppm))
DATUMS = {
    "WGS84": ("WGS84", (0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0)),
    "NAD83": ("GRS80", (0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0)),
    # ETRS89 is WGS84-coincident at the engine's accuracy contract
    "ETRS89": ("GRS80", (0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0)),
    "ED50": ("intl", (-87.0, -98.0, -121.0, 0.0, 0.0, 0.0, 0.0)),
    "OSGB36": (
        "airy",
        (446.448, -125.157, 542.060, 0.1502, 0.2470, 0.8421, -20.4894),
    ),
    "GGRS87": ("GRS80", (-199.87, 74.79, 246.62, 0.0, 0.0, 0.0, 0.0)),
    "PULKOVO42": ("krass", (28.0, -130.0, -95.0, 0.0, 0.0, 0.0, 0.0)),
    # Amersfoort (RD New) — published 7-param towgs84
    "AMERSFOORT": (
        "bessel",
        (565.2369, 50.0087, 465.658, -0.406857, 0.350733, -1.87035, 4.0812),
    ),
    # NAD27 mean-CONUS 3-param (grid shifts are the real method; this
    # entry mainly registers the Clarke 1866 ellipsoid for projections)
    "NAD27": ("clrk66", (-8.0, 160.0, 176.0, 0.0, 0.0, 0.0, 0.0)),
    # CH1903+ (LV95) — published swisstopo 3-param towgs84
    "CH1903PLUS": ("bessel", (674.374, 15.056, 405.346, 0.0, 0.0, 0.0, 0.0)),
    # Timbalai 1948 (Borneo RSO) — EPSG transformation 1236
    "TIMBALAI": ("evrst30", (-679.0, 669.0, -48.0, 0.0, 0.0, 0.0, 0.0)),
    # S-JTSK (Krovak) — published 3-param towgs84 (EPSG 1623 rounded)
    "SJTSK": ("bessel", (589.0, 76.0, 480.0, 0.0, 0.0, 0.0, 0.0)),
    # Trinidad 1903 — ellipsoid unit is LINKS, so a Helmert crossing
    # (meter offsets) is NOT registered: zeros mark "projection math
    # only"; coordinates stay on the datum's own geographic CRS
    "TRINIDAD1903": ("clrk58_links", (0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0)),
}

_AS2RAD = np.pi / (180.0 * 3600.0)


def _ell(datum: str):
    a, inv_f = ELLIPSOIDS[DATUMS[datum][0]]
    f = 1.0 / inv_f
    e2 = f * (2.0 - f)
    return a, f, e2


def geodetic_to_geocentric(lon_deg, lat_deg, h, datum: str):
    a, _f, e2 = _ell(datum)
    lam = np.radians(np.asarray(lon_deg, dtype=np.float64))
    phi = np.radians(np.asarray(lat_deg, dtype=np.float64))
    h = np.asarray(h, dtype=np.float64)
    sphi = np.sin(phi)
    n = a / np.sqrt(1.0 - e2 * sphi * sphi)
    x = (n + h) * np.cos(phi) * np.cos(lam)
    y = (n + h) * np.cos(phi) * np.sin(lam)
    z = (n * (1.0 - e2) + h) * sphi
    return x, y, z


def geocentric_to_geodetic(x, y, z, datum: str):
    """Bowring's one-step inverse -> (lon_deg, lat_deg, h)."""
    a, f, e2 = _ell(datum)
    b = a * (1.0 - f)
    ep2 = e2 / (1.0 - e2)
    p = np.sqrt(x * x + y * y)
    theta = np.arctan2(z * a, p * b)
    st = np.sin(theta)
    ct = np.cos(theta)
    phi = np.arctan2(
        z + ep2 * b * st * st * st, p - e2 * a * ct * ct * ct
    )
    lam = np.arctan2(y, x)
    sphi = np.sin(phi)
    n = a / np.sqrt(1.0 - e2 * sphi * sphi)
    h = p / np.cos(phi) - n
    return np.degrees(lam), np.degrees(phi), h


def helmert(x, y, z, params, inverse: bool = False):
    tx, ty, tz, rx, ry, rz, s_ppm = params
    if inverse:
        tx, ty, tz, rx, ry, rz, s_ppm = (
            -tx, -ty, -tz, -rx, -ry, -rz, -s_ppm
        )
    rx *= _AS2RAD
    ry *= _AS2RAD
    rz *= _AS2RAD
    m = 1.0 + s_ppm * 1e-6
    xo = tx + m * (x - rz * y + ry * z)
    yo = ty + m * (rz * x + y - rx * z)
    zo = tz + m * (-ry * x + rx * y + z)
    return xo, yo, zo


def datum_shift(lon_deg, lat_deg, src: str, dst: str, h=0.0):
    """Geographic coords on `src` datum -> geographic on `dst`
    (through geocentric WGS84). -> (lon_deg, lat_deg, h)."""
    x, y, z = geodetic_to_geocentric(lon_deg, lat_deg, h, src)
    if src != "WGS84":
        x, y, z = helmert(x, y, z, DATUMS[src][1])
    if dst != "WGS84":
        x, y, z = helmert(x, y, z, DATUMS[dst][1], inverse=True)
    return geocentric_to_geodetic(x, y, z, dst)


# ---------------------------------------------------------------------------
# generalized Krüger transverse Mercator (arbitrary ellipsoid)
# ---------------------------------------------------------------------------

def _tm_coeffs(a: float, f: float):
    n = f / (2.0 - f)
    A = a / (1.0 + n) * (1.0 + n**2 / 4.0 + n**4 / 64.0)
    alpha = (
        n / 2.0 - 2.0 * n**2 / 3.0 + 5.0 * n**3 / 16.0,
        13.0 * n**2 / 48.0 - 3.0 * n**3 / 5.0,
        61.0 * n**3 / 240.0,
    )
    return A, alpha


def tm_forward(
    lon_deg, lat_deg, datum: str, k0: float,
    lon0_deg: float, lat0_deg: float, fe: float, fn: float,
):
    """Transverse Mercator (Krüger series, same structure as
    crs.utm_forward but over the datum's ellipsoid, with a true
    origin latitude and false origin)."""
    a, f, e2 = _ell(datum)
    A, alpha = _tm_coeffs(a, f)
    e = np.sqrt(e2)

    def _xs_es(lon, lat):
        lam = np.radians(np.asarray(lon, dtype=np.float64)) - np.radians(
            lon0_deg
        )
        phi = np.radians(np.asarray(lat, dtype=np.float64))
        t = np.sinh(
            np.arctanh(np.sin(phi)) - e * np.arctanh(e * np.sin(phi))
        )
        xi = np.arctan2(t, np.cos(lam))
        eta = np.arctanh(np.sin(lam) / np.sqrt(1.0 + t * t))
        xs = xi.copy()
        es = eta.copy()
        for j, al in enumerate(alpha, start=1):
            xs = xs + al * np.sin(2 * j * xi) * np.cosh(2 * j * eta)
            es = es + al * np.cos(2 * j * xi) * np.sinh(2 * j * eta)
        return xs, es

    xs, es = _xs_es(lon_deg, lat_deg)
    xs0, _es0 = _xs_es(np.asarray([lon0_deg]), np.asarray([lat0_deg]))
    easting = fe + k0 * A * es
    northing = fn + k0 * A * (xs - xs0[0])
    return easting, northing


# EPSG:27700 British National Grid projection constants
BNG = dict(k0=0.9996012717, lon0=-2.0, lat0=49.0, fe=400000.0, fn=-100000.0)


def bng_forward(lon_deg, lat_deg):
    """WGS84 geographic -> EPSG:27700 (OSGB36 British National Grid):
    the full Helmert + Airy-TM pipeline."""
    lon2, lat2, _h = datum_shift(lon_deg, lat_deg, "WGS84", "OSGB36")
    return tm_forward(
        lon2, lat2, "OSGB36", BNG["k0"], BNG["lon0"], BNG["lat0"],
        BNG["fe"], BNG["fn"],
    )


# ---------------------------------------------------------------------------
# DuckDB SQL twins (term-for-term mirrors)
# ---------------------------------------------------------------------------

def _d(v: float) -> str:
    return f"cast('{v!r}' as double)"  # quoted: see tilemath.sql_double


def _sql_geocentric(lon: str, lat: str, datum: str):
    a, _f, e2 = _ell(datum)
    lam = f"radians({lon})"
    phi = f"radians({lat})"
    sphi = f"sin({phi})"
    n = f"({_d(a)} / sqrt(1.0 - {_d(e2)} * {sphi} * {sphi}))"
    x = f"({n} * cos({phi}) * cos({lam}))"
    y = f"({n} * cos({phi}) * sin({lam}))"
    z = f"({n} * (1.0 - {_d(e2)}) * {sphi})"
    return x, y, z


def _sql_helmert(x: str, y: str, z: str, params, inverse: bool):
    tx, ty, tz, rx, ry, rz, s_ppm = params
    if inverse:
        tx, ty, tz, rx, ry, rz, s_ppm = (
            -tx, -ty, -tz, -rx, -ry, -rz, -s_ppm
        )
    rx = rx * _AS2RAD
    ry = ry * _AS2RAD
    rz = rz * _AS2RAD
    m = 1.0 + s_ppm * 1e-6
    xo = f"({_d(tx)} + {_d(m)} * ({x} - {_d(rz)} * {y} + {_d(ry)} * {z}))"
    yo = f"({_d(ty)} + {_d(m)} * ({_d(rz)} * {x} + {y} - {_d(rx)} * {z}))"
    zo = f"({_d(tz)} + {_d(m)} * (-{_d(ry)} * {x} + {_d(rx)} * {y} + {z}))"
    return xo, yo, zo


def _sql_geodetic(x: str, y: str, z: str, datum: str):
    a, f, e2 = _ell(datum)
    b = a * (1.0 - f)
    ep2 = e2 / (1.0 - e2)
    p = f"sqrt({x} * {x} + {y} * {y})"
    theta = f"atan2({z} * {_d(a)}, {p} * {_d(b)})"
    st = f"sin({theta})"
    ct = f"cos({theta})"
    phi = (
        f"atan2({z} + {_d(ep2 * b)} * {st} * {st} * {st}, "
        f"{p} - {_d(e2 * a)} * {ct} * {ct} * {ct})"
    )
    lam = f"atan2({y}, {x})"
    return f"degrees({lam})", f"degrees({phi})"


def sql_datum_shift(lon: str, lat: str, src: str, dst: str):
    """(lon', lat') SQL expressions mirroring datum_shift at h=0."""
    x, y, z = _sql_geocentric(lon, lat, src)
    if src != "WGS84":
        x, y, z = _sql_helmert(x, y, z, DATUMS[src][1], inverse=False)
    if dst != "WGS84":
        x, y, z = _sql_helmert(x, y, z, DATUMS[dst][1], inverse=True)
    return _sql_geodetic(x, y, z, dst)


def _sql_sinh(x: str) -> str:
    return f"((exp({x}) - exp(-({x}))) / 2.0)"


def _sql_cosh(x: str) -> str:
    return f"((exp({x}) + exp(-({x}))) / 2.0)"


def _sql_atanh(x: str) -> str:
    return f"(ln((1.0 + ({x})) / (1.0 - ({x}))) / 2.0)"


def sql_tm_forward(
    lon: str, lat: str, datum: str, k0: float,
    lon0_deg: float, lat0_deg: float, fe: float, fn: float,
):
    a, f, e2 = _ell(datum)
    A, alpha = _tm_coeffs(a, f)
    e = float(np.sqrt(e2))

    def xs_es(lon_e: str, lat_e: str):
        lam = f"(radians({lon_e}) - {_d(float(np.radians(lon0_deg)))})"
        phi = f"radians({lat_e})"
        sphi = f"sin({phi})"
        t = _sql_sinh(
            f"{_sql_atanh(sphi)} - {_d(e)} * {_sql_atanh(f'{_d(e)} * {sphi}')}"
        )
        xi = f"atan2({t}, cos({lam}))"
        eta = _sql_atanh(f"sin({lam}) / sqrt(1.0 + ({t}) * ({t}))")
        xs = f"({xi})"
        es = f"({eta})"
        for j, al in enumerate(alpha, start=1):
            xs = (
                f"({xs} + {_d(al)} * sin({2*j} * ({xi})) * "
                f"{_sql_cosh(f'{2*j} * ({eta})')})"
            )
            es = (
                f"({es} + {_d(al)} * cos({2*j} * ({xi})) * "
                f"{_sql_sinh(f'{2*j} * ({eta})')})"
            )
        return xs, es

    xs, es = xs_es(lon, lat)
    # xs at the true origin is a scalar: precompute with the SAME
    # numpy ops tm_forward uses (lam = 0, eta = 0), so both engines
    # share the identical literal
    phi0 = np.radians(lat0_deg)
    t0 = np.sinh(
        np.arctanh(np.sin(phi0)) - e * np.arctanh(e * np.sin(phi0))
    )
    xi0 = np.arctan2(t0, np.cos(0.0))
    eta0 = np.arctanh(np.sin(0.0) / np.sqrt(1.0 + t0 * t0))
    xs0_val = xi0
    for j, al in enumerate(alpha, start=1):
        xs0_val = xs0_val + al * np.sin(2 * j * xi0) * np.cosh(2 * j * eta0)
    xs0_val = float(xs0_val)
    easting = f"({_d(fe)} + {_d(k0 * A)} * {es})"
    northing = f"({_d(fn)} + {_d(k0 * A)} * (({xs}) - {_d(xs0_val)}))"
    return easting, northing


def sql_bng_forward(lon: str, lat: str):
    lon2, lat2 = sql_datum_shift(lon, lat, "WGS84", "OSGB36")
    return sql_tm_forward(
        lon2, lat2, "OSGB36", BNG["k0"], BNG["lon0"], BNG["lat0"],
        BNG["fe"], BNG["fn"],
    )


def _tm_inv_coeffs(a: float, f: float):
    n = f / (2.0 - f)
    beta = (
        n / 2.0 - 2.0 * n**2 / 3.0 + 37.0 * n**3 / 96.0,
        n**2 / 48.0 + n**3 / 15.0,
        17.0 * n**3 / 480.0,
    )
    delta = (
        2.0 * n - 2.0 * n**2 / 3.0 - 2.0 * n**3,
        7.0 * n**2 / 3.0 - 8.0 * n**3 / 5.0,
        56.0 * n**3 / 15.0,
    )
    return beta, delta


def tm_inverse(
    easting, northing, datum: str, k0: float,
    lon0_deg: float, lat0_deg: float, fe: float, fn: float,
):
    """Inverse of tm_forward (Krüger inverse series over the datum's
    ellipsoid, honoring the true-origin northing offset)."""
    a, f, e2 = _ell(datum)
    A, alpha = _tm_coeffs(a, f)
    beta, delta = _tm_inv_coeffs(a, f)
    e = np.sqrt(e2)
    # xi of the true origin (same series as the forward)
    phi0 = np.radians(lat0_deg)
    t0 = np.sinh(np.arctanh(np.sin(phi0)) - e * np.arctanh(e * np.sin(phi0)))
    xi00 = np.arctan2(t0, 1.0)  # lam = 0 at the origin
    xs0 = xi00
    for j, al in enumerate(alpha, start=1):
        xs0 = xs0 + al * np.sin(2 * j * xi00)  # eta = 0 -> cosh = 1
    xi = (np.asarray(northing, dtype=np.float64) - fn) / (k0 * A) + xs0
    eta = (np.asarray(easting, dtype=np.float64) - fe) / (k0 * A)
    xs = xi.copy()
    es = eta.copy()
    for j, b in enumerate(beta, start=1):
        xs = xs - b * np.sin(2 * j * xi) * np.cosh(2 * j * eta)
        es = es - b * np.cos(2 * j * xi) * np.sinh(2 * j * eta)
    chi = np.arcsin(np.sin(xs) / np.cosh(es))
    lat = chi.copy()
    for j, d in enumerate(delta, start=1):
        lat = lat + d * np.sin(2 * j * chi)
    lon = lon0_deg + np.degrees(np.arctan2(np.sinh(es), np.cos(xs)))
    return lon, np.degrees(lat)
