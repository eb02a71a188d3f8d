"""Coordinate transforms (pure numpy; public Krüger/Karney series).

The reference delegates CRS transforms to PROJ
(ogr/ogrct.cpp:1018,1091). This engine needs exactly two families:

- EPSG:4326 <-> EPSG:3857 (closed form; also in tiles.tilemath as
  Column math) — the only transform the tiling path uses.
- Transverse Mercator (UTM) forward/inverse — used to ingest
  UTM-georeferenced sources (e.g. the reference's canonical
  autotest fixture byte.tif, EPSG:26711) into the WebMercator world.

Series coefficients to n^3 (≈ 0.1 mm accuracy) from the standard
Krüger expansion as presented by Karney (2011), public literature.
"""

from __future__ import annotations

import numpy as np

WGS84_A = 6378137.0
WGS84_F = 1.0 / 298.257223563

K0 = 0.9996
FALSE_EASTING = 500000.0
FALSE_NORTHING_SOUTH = 10000000.0


def _coeffs():
    n = WGS84_F / (2.0 - WGS84_F)
    A = WGS84_A / (1.0 + n) * (1.0 + n**2 / 4.0 + n**4 / 64.0)
    alpha = (
        n / 2.0 - 2.0 * n**2 / 3.0 + 5.0 * n**3 / 16.0,
        13.0 * n**2 / 48.0 - 3.0 * n**3 / 5.0,
        61.0 * n**3 / 240.0,
    )
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
    return n, A, alpha, beta, delta


_N, _A, _ALPHA, _BETA, _DELTA = _coeffs()


def utm_forward(lon, lat, zone: int):
    """(lon, lat) degrees -> UTM (easting, northing) on WGS84."""
    lon = np.radians(np.asarray(lon, dtype=np.float64))
    lat = np.radians(np.asarray(lat, dtype=np.float64))
    lon0 = np.radians(zone * 6.0 - 183.0)
    e = np.sqrt(WGS84_F * (2.0 - WGS84_F))
    t = np.sinh(
        np.arctanh(np.sin(lat)) - e * np.arctanh(e * np.sin(lat))
    )
    xi = np.arctan2(t, np.cos(lon - lon0))
    eta = np.arctanh(np.sin(lon - lon0) / np.sqrt(1.0 + t * t))
    xs = xi.copy()
    es = eta.copy()
    for j, a in enumerate(_ALPHA, start=1):
        xs = xs + a * np.sin(2 * j * xi) * np.cosh(2 * j * eta)
        es = es + a * np.cos(2 * j * xi) * np.sinh(2 * j * eta)
    easting = FALSE_EASTING + K0 * _A * es
    northing = K0 * _A * xs
    return easting, northing


# ---------------------------------------------------------------------------
# SQL twins (DuckDB oracles) — hyperbolics via exp/ln
# ---------------------------------------------------------------------------

def _d(x: float) -> str:
    return f"cast({x!r} as double)"


def _sinh(x: str) -> str:
    return f"((exp({x}) - exp(-({x}))) / 2.0)"


def _cosh(x: str) -> str:
    return f"((exp({x}) + exp(-({x}))) / 2.0)"


def _atanh(x: str) -> str:
    return f"(ln((1.0 + ({x})) / (1.0 - ({x}))) / 2.0)"


def sql_utm_forward(lon_deg: str, lat_deg: str, zone: int) -> tuple[str, str]:
    """(easting, northing) SQL expressions from degree expressions.
    Mirrors utm_forward term for term."""
    e = float(np.sqrt(WGS84_F * (2.0 - WGS84_F)))
    lon0 = float(np.radians(zone * 6.0 - 183.0))
    lam = f"(radians({lon_deg}) - {_d(lon0)})"
    phi = f"radians({lat_deg})"
    sphi = f"sin({phi})"
    t = _sinh(f"{_atanh(sphi)} - {_d(e)} * {_atanh(f'{_d(e)} * {sphi}')}")
    xi = f"atan2({t}, cos({lam}))"
    eta = _atanh(f"sin({lam}) / sqrt(1.0 + ({t}) * ({t}))")
    xs = f"({xi})"
    es = f"({eta})"
    for j, a in enumerate(_ALPHA, start=1):
        xs = f"({xs} + {_d(a)} * sin({2*j} * ({xi})) * {_cosh(f'{2*j} * ({eta})')})"
        es = f"({es} + {_d(a)} * cos({2*j} * ({xi})) * {_sinh(f'{2*j} * ({eta})')})"
    easting = f"({_d(FALSE_EASTING)} + {_d(K0 * _A)} * {es})"
    northing = f"({_d(K0 * _A)} * {xs})"
    return easting, northing


def sql_utm_inverse(easting: str, northing: str, zone: int) -> tuple[str, str]:
    """(lon_deg, lat_deg) SQL expressions; mirrors utm_inverse."""
    xi = f"(({northing}) / {_d(K0 * _A)})"
    eta = f"((({easting}) - {_d(FALSE_EASTING)}) / {_d(K0 * _A)})"
    xs = xi
    es = eta
    for j, b in enumerate(_BETA, start=1):
        xs = f"({xs} - {_d(b)} * sin({2*j} * {xi}) * {_cosh(f'{2*j} * {eta}')})"
        es = f"({es} - {_d(b)} * cos({2*j} * {xi}) * {_sinh(f'{2*j} * {eta}')})"
    chi = f"asin(sin({xs}) / {_cosh(es)})"
    lat = chi
    for j, d in enumerate(_DELTA, start=1):
        lat = f"({lat} + {_d(d)} * sin({2*j} * {chi}))"
    lon0 = zone * 6.0 - 183.0
    lon = f"({_d(lon0)} + degrees(atan2({_sinh(es)}, cos({xs}))))"
    return lon, f"degrees({lat})"


def utm_inverse(easting, northing, zone: int, northern: bool = True):
    """UTM (easting, northing) -> (lon, lat) degrees on WGS84."""
    easting = np.asarray(easting, dtype=np.float64)
    northing = np.asarray(northing, dtype=np.float64)
    if not northern:
        northing = northing - FALSE_NORTHING_SOUTH
    xi = northing / (K0 * _A)
    eta = (easting - FALSE_EASTING) / (K0 * _A)
    xs = xi.copy()
    es = eta.copy()
    for j, b in enumerate(_BETA, start=1):
        xs = xs - b * np.sin(2 * j * xi) * np.cosh(2 * j * eta)
        es = es - b * np.cos(2 * j * xi) * np.sinh(2 * j * eta)
    chi = np.arcsin(np.sin(xs) / np.cosh(es))
    lat = chi.copy()
    for j, d in enumerate(_DELTA, start=1):
        lat = lat + d * np.sin(2 * j * chi)
    lon0 = zone * 6.0 - 183.0
    lon = lon0 + np.degrees(np.arctan2(np.sinh(es), np.cos(xs)))
    return lon, np.degrees(lat)
