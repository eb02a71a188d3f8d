"""Synthetic NTv2 shift-grid fixtures with exact SQL twins.

Two nested subgrids (child refines parent over a sub-window) whose
node values are closed-form dyadics, so bilinear interpolation is
bit-reproducible between the numpy kernel (geo/gridshift.py) and a
DuckDB SQL expression written with the SAME operation order:

    parent SYNTHPAR: lat 40..44 deg, lon -4..0 deg, inc 450 sec
        dlat(a,b)      = ((7a + 13b + 5)  % 40) / 16   arc-sec
        dlon_west(a,b) = ((11a + 3b + 2)  % 40) / 16
    child  SYNTHCHD: lat 41..42 deg, lon -3..-2 deg, inc 225 sec
        dlat(a,b)      = ((7a + 13b + 21) % 40) / 16
        dlon_west(a,b) = ((11a + 3b + 9)  % 40) / 16

(a = south->north node index, b = west->east; all values are exact in
float32, so the .gsb write/read roundtrip is lossless.)
"""

from __future__ import annotations

import numpy as np

from gdal_spark.raster.ntv2 import SubGrid

# (name, parent, s_lat, n_lat, w_long, e_long, inc, lat_phase, lon_phase)
PARENT = ("SYNTHPAR", "NONE", 144000.0, 158400.0, -14400.0, 0.0, 450.0, 5, 2)
CHILD = ("SYNTHCHD", "SYNTHPAR", 147600.0, 151200.0, -10800.0, -7200.0,
         225.0, 21, 9)

NTV2_OFFSET = 4100011  # LCG decorrelation offset for the probe points


def _values(ny: int, nx: int, ph_lat: int, ph_lon: int):
    a, b = np.meshgrid(np.arange(ny), np.arange(nx), indexing="ij")
    dlat = ((7 * a + 13 * b + ph_lat) % 40) / 16.0
    dlon = ((11 * a + 3 * b + ph_lon) % 40) / 16.0
    return dlat.astype(np.float32), dlon.astype(np.float32)


def make_grids() -> list[SubGrid]:
    out = []
    for name, parent, s, n, w, e, inc, ph_lat, ph_lon in (PARENT, CHILD):
        ny = int(round((n - s) / inc)) + 1
        nx = int(round((e - w) / inc)) + 1
        dlat, dlon = _values(ny, nx, ph_lat, ph_lon)
        out.append(
            SubGrid(
                name=name, parent=parent, s_lat=s, n_lat=n,
                w_long=w, e_long=e, lat_inc=inc, long_inc=inc,
                lat_shift=dlat, lon_shift=dlon,
                lat_acc=np.zeros_like(dlat), lon_acc=np.zeros_like(dlon),
            )
        )
    return out


def sql_shift_cte(i_expr: str, src: str) -> str:
    """CTE chain: probe points + the forward-shifted result, matching
    geo/gridshift.py operation-for-operation.  Emits columns
    (i, lat, lon, shifted, lat_out, lon_out)."""
    from gdal_spark.fixtures.georef import LCG_A, LCG_C, LCG_M
    from gdal_spark.tiles.tilemath import sql_double

    u1 = f"(((({i_expr}) + {NTV2_OFFSET}) * {LCG_A} + {LCG_C}) % {LCG_M})"
    u2 = f"(({u1} * {LCG_A} + {LCG_C}) % {LCG_M})"
    m = sql_double(float(LCG_M))
    pts = f"""
  SELECT ({i_expr}) AS i,
         {sql_double(39.5)} + {sql_double(5.0)} * {u1} / {m} AS lat,
         {sql_double(-4.5)} + {sql_double(5.0)} * {u2} / {m} AS lon
  FROM {src}
"""

    def grid_terms(tag, s, n, w, e, inc, ny, nx, ph_lat, ph_lon):
        incs = sql_double(inc)
        fy = f"(lat * 3600.0 - {sql_double(s)}) / {incs}"
        fx = f"(lon * 3600.0 - {sql_double(w)}) / {incs}"
        return f"""
    (lat * 3600.0 >= {sql_double(s)} AND lat * 3600.0 <= {sql_double(n)}
     AND lon * 3600.0 >= {sql_double(w)} AND lon * 3600.0 <= {sql_double(e)})
      AS {tag}_in,
    least(greatest(cast(floor({fy}) as bigint), 0), {ny - 2}) AS {tag}_a0,
    least(greatest(cast(floor({fx}) as bigint), 0), {nx - 2}) AS {tag}_b0,
    {fy} AS {tag}_fy, {fx} AS {tag}_fx,
    {ph_lat} AS {tag}_pl, {ph_lon} AS {tag}_po
"""

    def grid_shift(tag):
        # node value at (a, b) for phase column {tag}_p*
        def v(comp, da, db):
            mul = "7" if comp == "l" else "11"
            mul2 = "13" if comp == "l" else "3"
            ph = f"{tag}_pl" if comp == "l" else f"{tag}_po"
            return (
                f"(({mul} * ({tag}_a0 + {da}) + {mul2} * ({tag}_b0 + {db})"
                f" + {ph}) % 40) / 16.0"
            )

        wy = f"({tag}_fy - {tag}_a0)"
        wx = f"({tag}_fx - {tag}_b0)"
        bil_l = (
            f"(({v('l',0,0)} * (1.0 - {wx}) + {v('l',0,1)} * {wx})"
            f" * (1.0 - {wy})"
            f" + ({v('l',1,0)} * (1.0 - {wx}) + {v('l',1,1)} * {wx}) * {wy})"
        )
        bil_o = (
            f"(({v('o',0,0)} * (1.0 - {wx}) + {v('o',0,1)} * {wx})"
            f" * (1.0 - {wy})"
            f" + ({v('o',1,0)} * (1.0 - {wx}) + {v('o',1,1)} * {wx}) * {wy})"
        )
        return bil_l, bil_o

    p = PARENT
    c = CHILD
    p_ny = int(round((p[3] - p[2]) / p[6])) + 1
    p_nx = int(round((p[5] - p[4]) / p[6])) + 1
    c_ny = int(round((c[3] - c[2]) / c[6])) + 1
    c_nx = int(round((c[5] - c[4]) / c[6])) + 1
    terms = f"""
  SELECT i, lat, lon,
    {grid_terms('p', p[2], p[3], p[4], p[5], p[6], p_ny, p_nx, p[7], p[8])},
    {grid_terms('c', c[2], c[3], c[4], c[5], c[6], c_ny, c_nx, c[7], c[8])}
  FROM npts
"""
    p_l, p_o = grid_shift("p")
    c_l, c_o = grid_shift("c")
    shifted = f"""
  SELECT i, lat, lon, (p_in OR c_in) AS shifted,
    CASE WHEN c_in THEN lat + {c_l} / 3600.0
         WHEN p_in THEN lat + {p_l} / 3600.0
         ELSE lat END AS lat_out,
    CASE WHEN c_in THEN lon - {c_o} / 3600.0
         WHEN p_in THEN lon - {p_o} / 3600.0
         ELSE lon END AS lon_out
  FROM nterms
"""
    return f"npts AS ({pts}),\nnterms AS ({terms}),\nnshift AS ({shifted})"
