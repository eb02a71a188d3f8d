"""Aperture-7 icosahedral hexagonal cell index — the H3 architecture
from scratch.

The north rule asks for "H3/S2 cell encodes".  S2 is implemented
bit-compatibly (tiles/s2.py).  H3 bit-compatibility is NOT possible
from first principles: the public h3lib fixes its cell numbering with
hand-assigned tables (baseCellData's 122 entries and the
faceIjkBaseCells[20][3][3][3] lookup) that are data, not geometry —
and this container has no h3 package to source them from.  What IS
the H3 architecture — and what this module implements faithfully —
is:

- a gnomonic projection onto the 20 faces of a regular icosahedron
  (face = argmax of the face-center dot product),
- a hexagonal lattice per face whose resolution r is scaled by
  sqrt(7)^-r and rotated by r * atan(sqrt(3)/5) ~ 19.1066 deg — the
  aperture-7 sequence (each hex splits into 7),
- nearest-hex assignment by cube-coordinate rounding,
- a 64-bit cell id packing (res | face | axial i | axial j),
- parent / children / k-ring neighbors, with face crossings handled
  GEOMETRICALLY (neighbor center -> unproject -> re-encode) instead
  of adjacency tables.

Cell ids are self-consistent and stable but NOT h3lib-compatible;
where bit parity with the public library is required, `h3.latlng_to_cell`
drops into the same (lat, lon, res) -> int64 column contract.

Boundary contract: a cell is DEFINED by encode() — the argmax face
plus lattice rounding — so cell membership is total and
deterministic everywhere.  For cells straddling a face boundary the
cell CENTER can project to the neighboring face, so
encode(cell_center(c)) == c holds exactly in face interiors but not
for boundary-sliver cells; k_ring/parent use center re-encode and
inherit the same caveat (h3lib resolves this with its hand-assigned
base-cell ownership tables — the data we deliberately do not copy).

Every step of `encode` has an exact SQL twin (`sql_hex_cell`) — the
trig constants are computed once in Python and embedded by repr on
both sides, so the only libm dependency shared with DuckDB is
sin/cos of the input coordinates themselves.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

# ---------------------------------------------------------------------------
# Icosahedron geometry (derived, not tabulated)
# ---------------------------------------------------------------------------

_PHI = (1.0 + math.sqrt(5.0)) / 2.0


def _vertices() -> np.ndarray:
    v = []
    for a in (-1.0, 1.0):
        for b in (-_PHI, _PHI):
            v += [(0.0, a, b), (a, b, 0.0), (b, 0.0, a)]
    v = np.array(v)
    return v / np.linalg.norm(v[0])


def _faces() -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Returns (centers[20,3], u[20,3], v[20,3]): orthonormal tangent
    bases per face, canonically ordered (sorted by center tuple)."""
    verts = _vertices()
    n = len(verts)
    d = verts @ verts.T
    edge = np.max(d[d < 0.999])  # adjacent-vertex dot product
    tris = []
    for i in range(n):
        for j in range(i + 1, n):
            if abs(d[i, j] - edge) > 1e-9:
                continue
            for k in range(j + 1, n):
                if (abs(d[i, k] - edge) < 1e-9
                        and abs(d[j, k] - edge) < 1e-9):
                    tris.append((i, j, k))
    assert len(tris) == 20
    centers = np.array([
        (verts[i] + verts[j] + verts[k]) / 3.0 for i, j, k in tris
    ])
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    order = np.lexsort((centers[:, 0], centers[:, 1], centers[:, 2]))
    centers = centers[order]
    tris = [tris[o] for o in order]
    us, vs = [], []
    for c, (i, j, k) in zip(centers, tris):
        a = verts[min(i, j, k)]
        u = a - np.dot(a, c) * c
        u /= np.linalg.norm(u)
        us.append(u)
        vs.append(np.cross(c, u))
    return centers, np.array(us), np.array(vs)


FACE_CENTER, FACE_U, FACE_V = _faces()

# aperture-7: scale sqrt(7) per res, rotate atan(sqrt(3)/5)
ROT = math.atan(math.sqrt(3.0) / 5.0)
S0 = 0.25          # res-0 hex size in gnomonic tangent units
MAX_RES = 15
OFF = 1 << 25      # axial-coordinate bias in the packed id
DEG = 0.017453292519943295  # pi/180, embedded identically in SQL

_SQ3_3 = math.sqrt(3.0) / 3.0
_SQ3 = math.sqrt(3.0)


def _res_params(res: int) -> tuple[float, float, float]:
    """(hex size, cos rot, sin rot) — plain python floats so their
    reprs embed exactly into the SQL twin."""
    s = S0 / (7.0 ** (res / 2.0))
    rho = res * ROT
    return s, math.cos(rho), math.sin(rho)


# ---------------------------------------------------------------------------
# encode (vectorized; op-for-op mirrored by sql_hex_cell)
# ---------------------------------------------------------------------------

def encode(lat: np.ndarray, lon: np.ndarray, res: int) -> np.ndarray:
    if not (0 <= res <= MAX_RES):
        raise ValueError(f"res must be 0..{MAX_RES}")
    lat = np.asarray(lat, dtype=np.float64)
    lon = np.asarray(lon, dtype=np.float64)
    cl = np.cos(lat * DEG)
    px = cl * np.cos(lon * DEG)
    py = cl * np.sin(lon * DEG)
    pz = np.sin(lat * DEG)
    dots = (
        FACE_CENTER[:, 0][:, None] * px
        + FACE_CENTER[:, 1][:, None] * py
        + FACE_CENTER[:, 2][:, None] * pz
    )
    face = np.argmax(dots, axis=0)
    dot = dots[face, np.arange(dots.shape[1])] if dots.ndim == 2 else dots
    u, v = FACE_U[face], FACE_V[face]
    a = (px * u[:, 0] + py * u[:, 1] + pz * u[:, 2]) / dot
    b = (px * v[:, 0] + py * v[:, 1] + pz * v[:, 2]) / dot
    s, c_r, s_r = _res_params(res)
    ar = a * c_r + b * s_r
    br = -a * s_r + b * c_r
    qa = (_SQ3_3 * ar - (1.0 / 3.0) * br) / s
    ra = ((2.0 / 3.0) * br) / s
    q, r = _cube_round(qa, ra)
    return (
        np.int64(res) * (1 << 57)
        + face.astype(np.int64) * (1 << 52)
        + (q + OFF) * (1 << 26)
        + (r + OFF)
    )


def _cube_round(qa: np.ndarray, ra: np.ndarray):
    """Nearest hex center in cube coords; floor(x+0.5) rounding on
    BOTH engines (numpy round() is half-to-even — never use it in an
    oracle-mirrored kernel)."""
    x, z = qa, ra
    y = -x - z
    rx = np.floor(x + 0.5)
    ry = np.floor(y + 0.5)
    rz = np.floor(z + 0.5)
    dx, dy, dz = np.abs(rx - x), np.abs(ry - y), np.abs(rz - z)
    fix_x = (dx > dy) & (dx > dz)
    fix_y = ~fix_x & (dy > dz)
    rx = np.where(fix_x, -ry - rz, rx)
    rz = np.where(~fix_x & ~fix_y, -rx - ry, rz)
    return rx.astype(np.int64), rz.astype(np.int64)


def unpack(cell: np.ndarray):
    cell = np.asarray(cell, dtype=np.int64)
    res = cell >> 57
    face = (cell >> 52) & 0x1F
    q = ((cell >> 26) & ((1 << 26) - 1)) - OFF
    r = (cell & ((1 << 26) - 1)) - OFF
    return res, face, q, r


def cell_center(cell: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """-> (lat, lon) degrees of the cell center."""
    res, face, q, r = unpack(cell)
    res_i = int(res[0]) if res.ndim else int(res)
    if res.ndim and not (res == res_i).all():
        raise ValueError("mixed resolutions in one batch")
    s, c_r, s_r = _res_params(res_i)
    x = s * _SQ3 * (q + r / 2.0)
    y = s * 1.5 * r
    a = x * c_r - y * s_r
    b = x * s_r + y * c_r
    c, u, v = FACE_CENTER[face], FACE_U[face], FACE_V[face]
    p = c + a[..., None] * u + b[..., None] * v
    p /= np.linalg.norm(p, axis=-1, keepdims=True)
    lat = np.degrees(np.arcsin(np.clip(p[..., 2], -1, 1)))
    lon = np.degrees(np.arctan2(p[..., 1], p[..., 0]))
    return lat, lon


def parent(cell: np.ndarray, parent_res: int) -> np.ndarray:
    """Geometric reparenting: the coarser hex whose center is nearest
    the cell center (aperture-7 nearest-center assignment)."""
    lat, lon = cell_center(cell)
    return encode(lat, lon, parent_res)


def k_ring(cell: int, k: int = 1) -> list[int]:
    """All cells within hex distance k.  Neighbors are taken on the
    cell's own face lattice, then re-encoded through the sphere so
    face crossings resolve geometrically (no adjacency tables)."""
    res, face, q, r = unpack(np.array([cell]))
    res_i = int(res[0])
    qs, rs = [], []
    for dq in range(-k, k + 1):
        for dr in range(max(-k, -dq - k), min(k, -dq + k) + 1):
            qs.append(int(q[0]) + dq)
            rs.append(int(r[0]) + dr)
    n = len(qs)
    packed = (
        np.int64(res_i) * (1 << 57)
        + np.full(n, int(face[0]), dtype=np.int64) * (1 << 52)
        + (np.array(qs, dtype=np.int64) + OFF) * (1 << 26)
        + (np.array(rs, dtype=np.int64) + OFF)
    )
    lat, lon = cell_center(packed)
    out = encode(lat, lon, res_i)
    seen: list[int] = []
    for c in out.tolist():
        if c not in seen:
            seen.append(c)
    return seen


# ---------------------------------------------------------------------------
# Column API
# ---------------------------------------------------------------------------

def h3_encode(lat: np.ndarray, lon: np.ndarray, res: int) -> np.ndarray:
    """Encode through the PUBLIC `h3` package (h3lib bit-compatible
    ids — joinable against externally-produced H3 columns).  Supports
    both the v4 (latlng_to_cell) and v3 (geo_to_h3) APIs.  Raises
    ImportError with guidance when the package is absent (it is not
    vendored in this container)."""
    try:
        import h3
    except ImportError as exc:  # pragma: no cover - env dependent
        raise ImportError(
            "method='h3' needs the public `h3` package (pip install "
            "h3); the self-consistent native encoder (method='native') "
            "needs no dependency but its ids are NOT h3-compatible"
        ) from exc
    if hasattr(h3, "latlng_to_cell"):  # v4
        to_cell = h3.latlng_to_cell
        to_int = h3.str_to_int if hasattr(h3, "str_to_int") else (
            lambda s: int(s, 16)
        )
    else:  # v3
        to_cell = h3.geo_to_h3
        to_int = lambda s: int(s, 16)  # noqa: E731
    out = np.empty(len(lat), dtype=np.int64)
    for k in range(len(lat)):
        c = to_cell(float(lat[k]), float(lon[k]), res)
        out[k] = int(c) if isinstance(c, int) else to_int(c)
    return out


def with_hex_cell(
    df,
    lat_col,
    lon_col,
    res: int,
    out_col: str = "hex_cell",
    method: str = "native",
):
    """Append a hex cell id as a BIGINT column — Arrow-batched
    vectorized encode, narrow map, no shuffle.  The bigint key then
    drives the same equi-join/groupBy discipline as the quadkey and
    S2 cell columns.

    method='native' (default): this module's aperture-7 encoder —
    self-consistent id domain, no dependency, NOT h3lib-compatible.
    method='h3': h3lib-bit-compatible ids via the public `h3`
    package (required importable on the executors) — use this when
    the column must join against externally-produced H3 keys.
    The two id domains must never be mixed in one join."""
    from pyspark.sql.functions import pandas_udf

    if method not in ("native", "h3"):
        raise ValueError(f"unknown hex method {method!r}")
    if method == "h3":
        h3_encode(np.zeros(0), np.zeros(0), res)  # fail fast if absent

    @pandas_udf("long")
    def _enc(lat: pd.Series, lon: pd.Series) -> pd.Series:
        la = lat.to_numpy(np.float64)
        lo = lon.to_numpy(np.float64)
        if method == "h3":
            return pd.Series(h3_encode(la, lo, res))
        return pd.Series(encode(la, lo, res))

    return df.withColumn(out_col, _enc(lat_col, lon_col))


# ---------------------------------------------------------------------------
# SQL twin of encode() — staged CTEs, constants embedded by repr
# ---------------------------------------------------------------------------

def sql_hex_cell(src: str, lat_expr: str, lon_expr: str, res: int,
                 key_cols: str = "i") -> str:
    """CTE chain computing the packed cell id as `hex_cell` for each
    row of `src` (which must provide {key_cols}, lat_expr, lon_expr).
    Final CTE name: hcell."""
    from gdal_spark.tiles.tilemath import sql_double

    def D(v) -> str:
        return sql_double(float(v))  # numpy scalars repr as np.float64(...)

    s, c_r, s_r = _res_params(res)
    faces_rows = ",\n    ".join(
        f"({f}, {D(FACE_CENTER[f,0])}, {D(FACE_CENTER[f,1])}, "
        f"{D(FACE_CENTER[f,2])}, {D(FACE_U[f,0])}, {D(FACE_U[f,1])}, "
        f"{D(FACE_U[f,2])}, {D(FACE_V[f,0])}, {D(FACE_V[f,1])}, "
        f"{D(FACE_V[f,2])})"
        for f in range(20)
    )
    deg = D(DEG)
    return f"""
hpts AS (
  SELECT {key_cols}, ({lat_expr}) AS hlat, ({lon_expr}) AS hlon,
         cos(({lat_expr}) * {deg}) * cos(({lon_expr}) * {deg}) AS px,
         cos(({lat_expr}) * {deg}) * sin(({lon_expr}) * {deg}) AS py,
         sin(({lat_expr}) * {deg}) AS pz
  FROM {src}),
hfaces (f, cx, cy, cz, ux, uy, uz, vx, vy, vz) AS (
  VALUES
    {faces_rows}),
hbest AS (
  SELECT p.*, hf.f, hf.ux, hf.uy, hf.uz, hf.vx, hf.vy, hf.vz,
         hf.cx * p.px + hf.cy * p.py + hf.cz * p.pz AS dot,
         row_number() OVER (
           PARTITION BY p.{key_cols}
           ORDER BY hf.cx * p.px + hf.cy * p.py + hf.cz * p.pz DESC, hf.f
         ) AS rn
  FROM hpts p, hfaces hf),
hproj AS (
  SELECT {key_cols}, f,
    (px * ux + py * uy + pz * uz) / dot AS a,
    (px * vx + py * vy + pz * vz) / dot AS b
  FROM hbest WHERE rn = 1),
hax AS (
  SELECT {key_cols}, f,
    ({D(_SQ3_3)} * (a * {D(c_r)} + b * {D(s_r)})
     - {D(1.0 / 3.0)} * (-a * {D(s_r)} + b * {D(c_r)})) / {D(s)} AS qa,
    ({D(2.0 / 3.0)} * (-a * {D(s_r)} + b * {D(c_r)})) / {D(s)} AS ra
  FROM hproj),
hrnd AS (
  SELECT {key_cols}, f, qa, ra, (- qa - ra) AS ya,
    floor(qa + 0.5) AS rx, floor((- qa - ra) + 0.5) AS ry,
    floor(ra + 0.5) AS rz
  FROM hax),
hfix AS (
  SELECT {key_cols}, f,
    CASE WHEN abs(rx - qa) > abs(ry - ya) AND abs(rx - qa) > abs(rz - ra)
         THEN - ry - rz ELSE rx END AS q,
    CASE WHEN NOT (abs(rx - qa) > abs(ry - ya)
                   AND abs(rx - qa) > abs(rz - ra))
              AND NOT (abs(ry - ya) > abs(rz - ra))
         THEN - (CASE WHEN abs(rx - qa) > abs(ry - ya)
                           AND abs(rx - qa) > abs(rz - ra)
                      THEN - ry - rz ELSE rx END) - ry
         ELSE rz END AS r
  FROM hrnd),
hcell AS (
  SELECT {key_cols},
    cast({res} as bigint) * {1 << 57} + cast(f as bigint) * {1 << 52}
    + (cast(q as bigint) + {OFF}) * {1 << 26}
    + (cast(r as bigint) + {OFF}) AS hex_cell
  FROM hfix)"""
