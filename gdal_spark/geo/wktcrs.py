"""WKT1 CRS import/export over the projection-zoo registry.

Mirrors OGRSpatialReference::importFromWkt / exportToWkt /
SetFromUserInput's WKT branch (/root/reference/ogr/
ogrspatialreference.cpp — the reference parses WKT into an OGC node
tree and maps PROJECTION/PARAMETER nodes onto PROJ methods;
/root/reference/ogr/ogr_srs_api.h).  This engine maps the same WKT1
surface onto gdal_spark.geo.projzoo.REGISTRY keys:

- `parse_wkt` — the OGC WKT1 node grammar (NAME["str", child, ...]).
- `wkt_to_crs` — PROJCS/GEOGCS tree -> registry key: AUTHORITY
  fast-path, else PROJECTION-name + PARAMETER + datum matching.
- `to_wkt` — registry key -> GDAL-style WKT1 with AUTHORITY.

Every registry entry round-trips: wkt_to_crs(to_wkt(k)) == k, with or
without the AUTHORITY fast-path (tests/test_wktcrs.py).
"""

from __future__ import annotations

import math

from gdal_spark.geo.datum import DATUMS, ELLIPSOIDS
from gdal_spark.geo import projzoo as pz


# ---------------------------------------------------------------------------
# WKT1 node grammar
# ---------------------------------------------------------------------------

class WktNode:
    __slots__ = ("name", "children")

    def __init__(self, name: str, children: list):
        self.name = name
        self.children = children

    def find(self, name: str):
        for c in self.children:
            if isinstance(c, WktNode) and c.name.upper() == name.upper():
                return c
        return None

    def find_all(self, name: str):
        return [c for c in self.children
                if isinstance(c, WktNode) and c.name.upper() == name.upper()]

    @property
    def str0(self) -> str:
        for c in self.children:
            if isinstance(c, str):
                return c
        return ""

    def numbers(self) -> list[float]:
        return [c for c in self.children if isinstance(c, float)]


def parse_wkt(s: str) -> WktNode:
    """Parse one WKT1 node tree.  Accepts [] or () brackets, quoted
    strings, and bare numeric tokens."""
    pos = 0
    n = len(s)

    def skip_ws():
        nonlocal pos
        while pos < n and s[pos] in " \t\r\n":
            pos += 1

    def parse_node() -> WktNode:
        nonlocal pos
        skip_ws()
        start = pos
        while pos < n and (s[pos].isalnum() or s[pos] in "_"):
            pos += 1
        name = s[start:pos]
        if not name:
            raise ValueError(f"WKT: expected node name at {pos}")
        skip_ws()
        if pos >= n or s[pos] not in "[(":
            raise ValueError(f"WKT: expected '[' after {name!r}")
        close = "]" if s[pos] == "[" else ")"
        pos += 1
        children: list = []
        while True:
            skip_ws()
            if pos >= n:
                raise ValueError("WKT: unterminated node")
            ch = s[pos]
            if ch == close:
                pos += 1
                return WktNode(name, children)
            if ch == ",":
                pos += 1
                continue
            if ch == '"':
                pos += 1
                st = pos
                while pos < n and s[pos] != '"':
                    pos += 1
                children.append(s[st:pos])
                pos += 1
                continue
            if ch.isalpha():
                # a nested node — or a WKT2 bare keyword (CS[Cartesian,2],
                # AXIS[..., east], ORDER, LENGTHUNIT values…)
                mark = pos
                while pos < n and (s[pos].isalnum() or s[pos] in "_"):
                    pos += 1
                word_end = pos
                skip_ws()
                if pos < n and s[pos] in "[(":
                    pos = mark
                    children.append(parse_node())
                else:
                    children.append(s[mark:word_end])
                continue
            st = pos
            while pos < n and s[pos] not in ",])":
                pos += 1
            tok = s[st:pos].strip()
            children.append(float(tok))

    node = parse_node()
    skip_ws()
    return node


# ---------------------------------------------------------------------------
# method <-> WKT1 PROJECTION mapping
# ---------------------------------------------------------------------------

# method -> (PROJECTION name, {registry param -> WKT1 PARAMETER name})
_METHOD_WKT: dict[str, tuple[str, dict[str, str]]] = {
    "tm": ("Transverse_Mercator", {
        "lat0": "latitude_of_origin", "lon0": "central_meridian",
        "k0": "scale_factor", "fe": "false_easting",
        "fn": "false_northing"}),
    "mercator": ("Mercator_1SP", {
        "lon0": "central_meridian", "k0": "scale_factor",
        "fe": "false_easting", "fn": "false_northing"}),
    "albers": ("Albers_Conic_Equal_Area", {
        "lat1": "standard_parallel_1", "lat2": "standard_parallel_2",
        "lat0": "latitude_of_center", "lon0": "longitude_of_center",
        "fe": "false_easting", "fn": "false_northing"}),
    "polar_stereo": ("Polar_Stereographic", {
        "lat_ts": "latitude_of_origin", "lon0": "central_meridian",
        "fe": "false_easting", "fn": "false_northing"}),
    "oblique_stereo": ("Oblique_Stereographic", {
        "lat0": "latitude_of_origin", "lon0": "central_meridian",
        "k0": "scale_factor", "fe": "false_easting",
        "fn": "false_northing"}),
    "sinusoidal": ("Sinusoidal", {
        "lon0": "longitude_of_center",
        "fe": "false_easting", "fn": "false_northing"}),
    "eqc": ("Equirectangular", {
        "lat1": "standard_parallel_1", "lon0": "central_meridian",
        "fe": "false_easting", "fn": "false_northing"}),
    "laea": ("Lambert_Azimuthal_Equal_Area", {
        "lat0": "latitude_of_center", "lon0": "longitude_of_center",
        "fe": "false_easting", "fn": "false_northing"}),
    "cea": ("Cylindrical_Equal_Area", {
        "lat_ts": "standard_parallel_1", "lon0": "central_meridian",
        "fe": "false_easting", "fn": "false_northing"}),
    "mollweide": ("Mollweide", {
        "lon0": "central_meridian",
        "fe": "false_easting", "fn": "false_northing"}),
    "cassini": ("Cassini_Soldner", {
        "lat0": "latitude_of_origin", "lon0": "central_meridian",
        "fe": "false_easting", "fn": "false_northing"}),
    # variant B (EPSG 9815) — the reference's _Azimuth_Center spelling
    "homerc": ("Hotine_Oblique_Mercator_Azimuth_Center", {
        "latc": "latitude_of_center", "lonc": "longitude_of_center",
        "alpha": "azimuth", "gamma": "rectified_grid_angle",
        "k0": "scale_factor", "fe": "false_easting",
        "fn": "false_northing"}),
    # azimuth/pseudo_standard_parallel_1 are method constants here —
    # ignored on import, not re-emitted on export
    "krovak": ("Krovak", {
        "lat0": "latitude_of_center", "lonc": "longitude_of_center",
        "k0": "scale_factor", "fe": "false_easting",
        "fn": "false_northing"}),
}

# GDAL emits _of_center for some methods and _of_origin for others;
# importers must accept either spelling (the reference normalizes via
# its EPSG parameter-code table).
_PARAM_ALIASES = {
    "latitude_of_center": "latitude_of_origin",
    "longitude_of_center": "central_meridian",
}

_ELLIPSOID_WKT_NAMES = {
    "WGS84": "WGS 84",
    "GRS80": "GRS 1980",
    "intl": "International 1924",
    "airy": "Airy 1830",
    "bessel": "Bessel 1841",
    "krass": "Krassowsky 1940",
    "clrk66": "Clarke 1866",
    "evrst30": "Everest 1830 (1967 Definition)",
    "clrk58_links": "Clarke 1858 (Clarke's links)",
}

_DATUM_WKT_NAMES = {
    "WGS84": "WGS_1984",
    "NAD83": "North_American_Datum_1983",
    "NAD27": "North_American_Datum_1927",
    "ETRS89": "European_Terrestrial_Reference_System_1989",
    "ED50": "European_Datum_1950",
    "OSGB36": "OSGB_1936",
    "GGRS87": "Greek_Geodetic_Reference_System_1987",
    "PULKOVO42": "Pulkovo_1942",
    "AMERSFOORT": "Amersfoort",
    "CH1903PLUS": "CH1903+",
    "TIMBALAI": "Timbalai_1948",
    "SJTSK": "System_of_the_Unified_Trigonometrical_Cadastral_Network",
    "TRINIDAD1903": "Trinidad_1903",
}

# registry geographic codes per datum (GEOGCS emission + import)
_GEOGRAPHIC_CODE = {
    "WGS84": 4326,
    "NAD83": 4269,
    "OSGB36": 4277,
    "AMERSFOORT": 4289,
    "ETRS89": 4258,
}


def _fmt(v: float) -> str:
    """Shortest exact decimal (GDAL prints up to 17 significant)."""
    return repr(float(v))


def _geogcs_wkt(datum: str) -> str:
    ell, towgs84 = DATUMS[datum]
    a, invf = ELLIPSOIDS[ell]
    tw = ",".join(_fmt(v) for v in towgs84)
    auth = ""
    code = _GEOGRAPHIC_CODE.get(datum)
    if code is not None:
        auth = f',AUTHORITY["EPSG","{code}"]'
    return (
        f'GEOGCS["{datum}",DATUM["{_DATUM_WKT_NAMES[datum]}",'
        f'SPHEROID["{_ELLIPSOID_WKT_NAMES[ell]}",{_fmt(a)},{_fmt(invf)}],'
        f"TOWGS84[{tw}]],"
        f'PRIMEM["Greenwich",0],'
        f'UNIT["degree",0.0174532925199433]{auth}]'
    )


def to_wkt(code) -> str:
    """Registry key -> GDAL-style WKT1 (exportToWkt)."""
    key = code if code in pz.REGISTRY else pz.resolve_crs(code)
    d = pz.REGISTRY[key]
    if isinstance(key, str) and key.upper().startswith("ESRI:"):
        auth = f'AUTHORITY["ESRI","{key.split(":")[1]}"]'
    else:
        auth = f'AUTHORITY["EPSG","{key}"]'
    if d.method == "geographic":
        g = _geogcs_wkt(d.datum)
        return g  # its own AUTHORITY is the geographic code
    if d.method == "webmerc":
        # EPSG:3857's WKT1 identity lives in its AUTHORITY node (the
        # sphere-on-ellipsoid trick is not a zoo method)
        return (
            f'PROJCS["WGS 84 / Pseudo-Mercator",{_geogcs_wkt("WGS84")},'
            f'PROJECTION["Mercator_1SP"],'
            f'PARAMETER["central_meridian",0],'
            f'PARAMETER["scale_factor",1],'
            f'PARAMETER["false_easting",0],'
            f'PARAMETER["false_northing",0],'
            f'UNIT["metre",1],{auth}]'
        )
    if d.method == "utm":
        zone = d.params["zone"]
        south = d.params["south"]
        params = {
            "latitude_of_origin": 0.0,
            "central_meridian": float(zone * 6 - 183),
            "scale_factor": 0.9996,
            "false_easting": 500000.0,
            "false_northing": 10000000.0 if south else 0.0,
        }
        name = f"WGS 84 / UTM zone {zone}{'S' if south else 'N'}"
        body = ",".join(
            f'PARAMETER["{k}",{_fmt(v)}]' for k, v in params.items())
        return (
            f'PROJCS["{name}",{_geogcs_wkt(d.datum)},'
            f'PROJECTION["Transverse_Mercator"],{body},'
            f'UNIT["metre",1],{auth}]'
        )
    if d.method == "polar_stereo_a":
        params = {
            "latitude_of_origin": -90.0 if d.params["south"] else 90.0,
            "central_meridian": d.params["lon0"],
            "scale_factor": d.params["k0"],
            "false_easting": d.params["fe"],
            "false_northing": d.params["fn"],
        }
        body = ",".join(
            f'PARAMETER["{k}",{_fmt(v)}]' for k, v in params.items())
        return (
            f'PROJCS["{key}",{_geogcs_wkt(d.datum)},'
            f'PROJECTION["Polar_Stereographic"],{body},'
            f'UNIT["metre",1],{auth}]'
        )
    proj_name, pmap = _METHOD_WKT[d.method]
    body = ",".join(
        f'PARAMETER["{pmap[k]}",{_fmt(v)}]'
        for k, v in d.params.items() if k in pmap)
    return (
        f'PROJCS["{key}",{_geogcs_wkt(d.datum)},'
        f'PROJECTION["{proj_name}"],{body},'
        f'UNIT["metre",1],{auth}]'
    )


# ---------------------------------------------------------------------------
# import
# ---------------------------------------------------------------------------

def _close(a: float, b: float, tol: float = 1e-6) -> bool:
    return abs(a - b) <= tol * max(1.0, abs(a), abs(b))


def _match_datum(geogcs: WktNode) -> str:
    datum_node = geogcs.find("DATUM")
    if datum_node is None:
        raise ValueError("WKT: GEOGCS without DATUM")
    sph = datum_node.find("SPHEROID")
    if sph is None:
        raise ValueError("WKT: DATUM without SPHEROID")
    a, invf = sph.numbers()[:2]
    tw_node = datum_node.find("TOWGS84")
    tw = tuple(tw_node.numbers()) if tw_node is not None else None
    candidates = []
    for name, (ell, towgs84) in DATUMS.items():
        ea, einvf = ELLIPSOIDS[ell]
        # WGS84 vs GRS 1980 differ only at the 10th significant digit
        # of 1/f — the flattening match must be near-exact
        if not (_close(a, ea, 1e-9) and _close(invf, einvf, 1e-9)):
            continue
        if tw is None:
            if all(v == 0.0 for v in towgs84):
                candidates.append(name)
            continue
        padded = tuple(tw) + (0.0,) * (7 - len(tw))
        if all(_close(x, y, 1e-9) for x, y in zip(padded, towgs84)):
            candidates.append(name)
    if candidates:
        # several datums share an ellipsoid + towgs84 (NAD83/ETRS89):
        # the WKT datum name disambiguates
        dn = (datum_node.str0 or "").upper().replace(" ", "_")
        for name in candidates:
            if dn == _DATUM_WKT_NAMES.get(name, "").upper():
                return name
        return candidates[0]
    raise KeyError(
        f"WKT datum {datum_node.str0!r} (a={a}, 1/f={invf}) not in the "
        f"engine's datum registry")


# ---------------------------------------------------------------------------
# WKT2 (ISO 19162 / OGC 18-010r7 — the reference accepts WKT1 and
# WKT2 interchangeably on import, ogr/ogrspatialreference.cpp
# importFromWkt; exportToWkt(FORMAT=WKT2) is the export dual)
# ---------------------------------------------------------------------------

_WKT2_DATUM_NAMES = {
    "WGS84": "World Geodetic System 1984",
    "NAD83": "North American Datum 1983",
    "NAD27": "North American Datum 1927",
    "ETRS89": "European Terrestrial Reference System 1989",
    "ED50": "European Datum 1950",
    "OSGB36": "Ordnance Survey of Great Britain 1936",
    "GGRS87": "Greek Geodetic Reference System 1987",
    "PULKOVO42": "Pulkovo 1942",
    "AMERSFOORT": "Amersfoort",
    "CH1903PLUS": "CH1903+",
    "TIMBALAI": "Timbalai 1948",
    "SJTSK": "System of the Unified Trigonometrical Cadastral Network",
    "TRINIDAD1903": "Trinidad 1903",
}

_WKT2_METHOD_DISPLAY = {
    9807: "Transverse Mercator",
    9804: "Mercator (variant A)",
    9822: "Albers Equal Area",
    9829: "Polar Stereographic (variant B)",
    9810: "Polar Stereographic (variant A)",
    9809: "Oblique Stereographic",
    9820: "Lambert Azimuthal Equal Area",
    9835: "Lambert Cylindrical Equal Area",
    1028: "Equidistant Cylindrical",
    9815: "Hotine Oblique Mercator (variant B)",
    9819: "Krovak",
    1024: "Popular Visualisation Pseudo Mercator",
    9806: "Cassini-Soldner",
}

_WKT2_PARAM_DISPLAY = {
    8801: "Latitude of natural origin",
    8802: "Longitude of natural origin",
    8805: "Scale factor at natural origin",
    8806: "False easting",
    8807: "False northing",
    8821: "Latitude of false origin",
    8822: "Longitude of false origin",
    8823: "Latitude of 1st standard parallel",
    8824: "Latitude of 2nd standard parallel",
    8826: "Easting at false origin",
    8827: "Northing at false origin",
    8832: "Latitude of standard parallel",
    8833: "Longitude of origin",
    8811: "Latitude of projection centre",
    8812: "Longitude of projection centre",
    8813: "Azimuth at projection centre",
    8814: "Angle from Rectified to Skew Grid",
    8815: "Scale factor at projection centre",
    8816: "Easting at projection centre",
    8817: "Northing at projection centre",
}


def _wkt2_datum_block(datum: str) -> str:
    ell, _tw = DATUMS[datum]
    a, invf = ELLIPSOIDS[ell]
    return (
        f'DATUM["{_WKT2_DATUM_NAMES[datum]}",'
        f'ELLIPSOID["{_ELLIPSOID_WKT_NAMES[ell]}",{_fmt(a)},{_fmt(invf)},'
        f'LENGTHUNIT["metre",1]]]'
    )


def _wkt2_id(key) -> str:
    if isinstance(key, str) and key.upper().startswith("ESRI:"):
        return f'ID["ESRI",{key.split(":")[1]}]'
    return f'ID["EPSG",{key}]'


def to_wkt2(code) -> str:
    """Registry key -> WKT2:2019 (exportToWkt FORMAT=WKT2).  Inverse
    of _wkt2_to_crs for every registry entry."""
    key = code if code in pz.REGISTRY else pz.resolve_crs(code)
    d = pz.REGISTRY[key]
    geog = (
        f'BASEGEOGCRS["{d.datum}",{_wkt2_datum_block(d.datum)}'
    )
    if d.method == "geographic":
        return (
            f'GEOGCRS["{d.datum}",{_wkt2_datum_block(d.datum)},'
            f'CS[ellipsoidal,2],'
            f'AXIS["geodetic latitude (Lat)",north],'
            f'AXIS["geodetic longitude (Lon)",east],'
            f'ANGLEUNIT["degree",0.0174532925199433],{_wkt2_id(key)}]'
        )
    # method code + EPSG-coded parameter list
    if d.method == "utm":
        mcode = 9807
        params = {
            8801: 0.0,
            8802: float(d.params["zone"] * 6 - 183),
            8805: 0.9996,
            8806: 500000.0,
            8807: 10000000.0 if d.params["south"] else 0.0,
        }
    elif d.method == "webmerc":
        mcode = 1024
        params = {8801: 0.0, 8802: 0.0, 8806: 0.0, 8807: 0.0}
    elif d.method in ("sinusoidal", "mollweide"):
        mcode = None
        pmap = _WKT2_METHOD_NAMES[d.method][1]
        rev = {v: k for k, v in pmap.items()}
        params = {rev[k]: v for k, v in d.params.items() if k in rev}
    else:
        mcode = next(
            mc for mc, (m, _p) in _WKT2_METHODS.items() if m == d.method
        )
        pmap = _WKT2_METHODS[mcode][1]
        rev = {v: k for k, v in pmap.items()}
        params = {rev[k]: v for k, v in d.params.items() if k in rev}
        if d.method == "polar_stereo_a":
            params[8801] = -90.0 if d.params["south"] else 90.0
    if mcode is None:
        method = f'METHOD["{d.method.title()}"]'
    else:
        method = (
            f'METHOD["{_WKT2_METHOD_DISPLAY[mcode]}",ID["EPSG",{mcode}]]'
        )
    body = ",".join(
        f'PARAMETER["{_WKT2_PARAM_DISPLAY[pc]}",{_fmt(v)},'
        f'ID["EPSG",{pc}]]'
        for pc, v in sorted(params.items())
    )
    return (
        f'PROJCRS["{key}",{geog}],'
        f'CONVERSION["unnamed",{method},{body}],'
        f'CS[Cartesian,2],AXIS["easting (E)",east],'
        f'AXIS["northing (N)",north],LENGTHUNIT["metre",1],'
        f'{_wkt2_id(key)}]'
    )

# EPSG method code -> (registry method, {EPSG parameter code -> param})
_WKT2_METHODS = {
    9807: ("tm", {8801: "lat0", 8802: "lon0", 8805: "k0",
                  8806: "fe", 8807: "fn"}),
    9804: ("mercator", {8802: "lon0", 8805: "k0", 8806: "fe", 8807: "fn"}),
    9822: ("albers", {8821: "lat0", 8822: "lon0", 8823: "lat1",
                      8824: "lat2", 8826: "fe", 8827: "fn"}),
    9829: ("polar_stereo", {8832: "lat_ts", 8833: "lon0",
                            8806: "fe", 8807: "fn"}),
    9810: ("polar_stereo_a", {8802: "lon0", 8805: "k0",
                              8806: "fe", 8807: "fn"}),
    9809: ("oblique_stereo", {8801: "lat0", 8802: "lon0", 8805: "k0",
                              8806: "fe", 8807: "fn"}),
    9820: ("laea", {8801: "lat0", 8802: "lon0", 8806: "fe", 8807: "fn"}),
    9835: ("cea", {8823: "lat_ts", 8802: "lon0", 8806: "fe", 8807: "fn"}),
    1028: ("eqc", {8823: "lat1", 8802: "lon0", 8806: "fe", 8807: "fn"}),
    9815: ("homerc", {8811: "latc", 8812: "lonc", 8813: "alpha",
                      8814: "gamma", 8815: "k0", 8816: "fe", 8817: "fn"}),
    9819: ("krovak", {8811: "lat0", 8833: "lonc", 8805: "k0",
                      8806: "fe", 8807: "fn"}),
    1041: ("krovak", {8811: "lat0", 8833: "lonc", 8805: "k0",
                      8806: "fe", 8807: "fn"}),
    1024: ("webmerc", {}),
    9806: ("cassini", {8801: "lat0", 8802: "lon0",
                       8806: "fe", 8807: "fn"}),
}
# methods without EPSG codes match by name
_WKT2_METHOD_NAMES = {
    "sinusoidal": ("sinusoidal", {8802: "lon0", 8806: "fe", 8807: "fn"}),
    "mollweide": ("mollweide", {8802: "lon0", 8806: "fe", 8807: "fn"}),
}

# datum-name keywords -> registry datum (WKT2 usually omits TOWGS84)
_WKT2_DATUM_KEYS = [
    ("WORLD GEODETIC SYSTEM 1984", "WGS84"),
    ("WGS", "WGS84"),
    ("NORTH AMERICAN DATUM 1983", "NAD83"),
    ("NORTH AMERICAN DATUM 1927", "NAD27"),
    ("EUROPEAN TERRESTRIAL", "ETRS89"),
    ("ETRS", "ETRS89"),
    ("OSGB", "OSGB36"),
    ("ORDNANCE SURVEY", "OSGB36"),
    ("AMERSFOORT", "AMERSFOORT"),
    ("CH1903", "CH1903PLUS"),
    ("TIMBALAI", "TIMBALAI"),
    ("UNIFIED TRIGONOMETRICAL", "SJTSK"),
    ("S-JTSK", "SJTSK"),
    ("EUROPEAN DATUM 1950", "ED50"),
    ("PULKOVO", "PULKOVO42"),
    ("GREEK", "GGRS87"),
]


def _last_id_key(node: WktNode):
    """The node's own ID["EPSG", n] (last ID child), if any."""
    ids = node.find_all("ID")
    if not ids:
        return None
    org = str(ids[-1].children[0]).upper()
    num = int(ids[-1].numbers()[0])
    return num if org == "EPSG" else f"{org}:{num}"


def _wkt2_datum(geog: WktNode) -> str:
    """GEOGCRS/BASEGEOGCRS -> registry datum: name keywords first,
    then the ellipsoid axes as a consistency check."""
    datum_node = geog.find("DATUM") or geog.find("ENSEMBLE") \
        or geog.find("TRF")
    if datum_node is None:
        raise ValueError("WKT2: geographic CRS without DATUM/ENSEMBLE")
    name = (datum_node.str0 + " " + geog.str0).upper()
    for key, datum in _WKT2_DATUM_KEYS:
        if key in name:
            ell_node = datum_node.find("ELLIPSOID")
            if ell_node is not None:
                a, invf = ell_node.numbers()[:2]
                want_a, want_invf = ELLIPSOIDS[DATUMS[datum][0]]
                if not (_close(a, want_a) and _close(invf, want_invf)):
                    continue
            return datum
    raise KeyError(f"WKT2: datum not in the registry: {datum_node.str0!r}")


def _wkt2_to_crs(root: WktNode):
    kind = root.name.upper()
    key = _last_id_key(root)
    if key is not None and key in pz.REGISTRY:
        return key
    if kind in ("GEOGCRS", "GEODCRS", "BASEGEOGCRS"):
        datum = _wkt2_datum(root)
        code = _GEOGRAPHIC_CODE.get(datum)
        if code is None:
            raise KeyError(f"no geographic registry code for datum {datum}")
        return code
    base = root.find("BASEGEOGCRS") or root.find("BASEGEODCRS")
    if base is None:
        raise ValueError("WKT2: PROJCRS without BASEGEOGCRS")
    datum = _wkt2_datum(base)
    conv = root.find("CONVERSION")
    if conv is None:
        raise ValueError("WKT2: PROJCRS without CONVERSION")
    meth = conv.find("METHOD")
    meth_key = _last_id_key(meth) if meth is not None else None
    entry = _WKT2_METHODS.get(meth_key)
    if entry is None and meth is not None:
        entry = _WKT2_METHOD_NAMES.get(meth.str0.strip().lower())
    if entry is None:
        raise KeyError(
            f"WKT2 method {meth.str0 if meth else '?'!r} not supported")
    method, pmap = entry
    if method == "webmerc":
        return 3857
    params: dict[str, float] = {}
    south = False
    for p in conv.find_all("PARAMETER"):
        pid = _last_id_key(p)
        val = p.numbers()[0]
        if pid in pmap:
            params[pmap[pid]] = val
        elif pid == 8801 and method == "polar_stereo_a":
            south = val < 0
    if method == "tm":
        # UTM recognition (zone codes, not generic tm entries)
        k0 = params.get("k0", 1.0)
        lon0 = params.get("lon0", 0.0)
        if (_close(k0, 0.9996) and _close(params.get("lat0", 0.0), 0.0)
                and _close(params.get("fe", 0.0), 500000.0)
                and datum == "WGS84"):
            zone = (lon0 + 183.0) / 6.0
            if _close(zone, round(zone)) and 1 <= round(zone) <= 60:
                fn = params.get("fn", 0.0)
                if _close(fn, 0.0):
                    return 32600 + round(zone)
                if _close(fn, 10000000.0):
                    return 32700 + round(zone)
    if method == "polar_stereo_a":
        params["south"] = south
    return _match_registry(method, datum, params)


def wkt_to_crs(wkt: str):
    """WKT1 PROJCS/GEOGCS or WKT2 PROJCRS/GEOGCRS -> registry key
    (importFromWkt)."""
    root = parse_wkt(wkt)
    kind = root.name.upper()
    if kind in ("PROJCRS", "GEOGCRS", "GEODCRS", "PROJECTEDCRS",
                "GEODETICCRS"):
        return _wkt2_to_crs(root)
    if kind not in ("PROJCS", "GEOGCS"):
        raise ValueError(f"WKT: expected PROJCS/GEOGCS, got {root.name!r}")
    # AUTHORITY fast-path (the LAST authority child is the CRS's own)
    auths = root.find_all("AUTHORITY")
    if auths:
        org = auths[-1].children[0]
        num = auths[-1].children[1]
        key = (int(num) if str(org).upper() == "EPSG"
               else f"{str(org).upper()}:{int(num)}")
        if key in pz.REGISTRY:
            return key
    if kind == "GEOGCS":
        datum = _match_datum(root)
        code = _GEOGRAPHIC_CODE.get(datum)
        if code is None:
            raise KeyError(f"no geographic registry code for datum {datum}")
        return code
    geogcs = root.find("GEOGCS")
    if geogcs is None:
        raise ValueError("WKT: PROJCS without GEOGCS")
    datum = _match_datum(geogcs)
    proj_node = root.find("PROJECTION")
    if proj_node is None:
        raise ValueError("WKT: PROJCS without PROJECTION")
    proj_name = proj_node.str0
    params: dict[str, float] = {}
    for p in root.find_all("PARAMETER"):
        nm = p.str0.lower()
        nm = _PARAM_ALIASES.get(nm, nm)
        params[nm] = p.numbers()[0]

    def g(name: str, default: float = 0.0) -> float:
        return params.get(_PARAM_ALIASES.get(name, name), default)

    pn = proj_name.replace(" ", "_").lower()
    # Polar_Stereographic splits into variants A (lat0 = +/-90, k0
    # given) and B (lat_ts given) exactly as the reference does when
    # choosing the EPSG method
    if pn == "polar_stereographic":
        lat0 = g("latitude_of_origin", 90.0)
        k0 = g("scale_factor", 1.0)
        if _close(abs(lat0), 90.0) and not _close(k0, 1.0):
            want = dict(k0=k0, south=lat0 < 0,
                        lon0=g("central_meridian"),
                        fe=g("false_easting"), fn=g("false_northing"))
            return _match_registry("polar_stereo_a", datum, want)
        want = dict(lat_ts=lat0, lon0=g("central_meridian"),
                    fe=g("false_easting"), fn=g("false_northing"))
        return _match_registry("polar_stereo", datum, want)
    if pn == "transverse_mercator":
        # UTM recognition first (zone codes, not generic tm entries)
        k0 = g("scale_factor", 1.0)
        lon0 = g("central_meridian")
        if (_close(k0, 0.9996) and _close(g("latitude_of_origin"), 0.0)
                and _close(g("false_easting"), 500000.0)
                and datum == "WGS84"):
            zone = (lon0 + 183.0) / 6.0
            if _close(zone, round(zone)) and 1 <= round(zone) <= 60:
                fn = g("false_northing")
                if _close(fn, 0.0):
                    return 32600 + round(zone)
                if _close(fn, 10000000.0):
                    return 32700 + round(zone)
        want = dict(k0=k0, lon0=lon0, lat0=g("latitude_of_origin"),
                    fe=g("false_easting"), fn=g("false_northing"))
        return _match_registry("tm", datum, want)
    for method, (wkt_name, pmap) in _METHOD_WKT.items():
        if pn == wkt_name.lower():
            defaults = {"k0": 1.0}
            want = {k: g(wkt_param, defaults.get(k, 0.0))
                    for k, wkt_param in pmap.items()}
            if method == "mercator" and datum == "WGS84" and _close(
                    want["k0"], 1.0) and root.str0.lower().find(
                    "pseudo") >= 0:
                return 3857
            return _match_registry(method, datum, want)
    raise KeyError(f"WKT PROJECTION {proj_name!r} not a supported method")


def _match_registry(method: str, datum: str, want: dict):
    for key, d in pz.REGISTRY.items():
        if d.method != method or d.datum != datum:
            continue
        ok = True
        for k, v in want.items():
            have = d.params.get(k)
            if isinstance(v, bool):
                if bool(have) != v:
                    ok = False
                    break
            elif have is None or not _close(float(have), float(v)):
                ok = False
                break
        if ok:
            return key
    raise KeyError(
        f"no registry CRS with method={method}, datum={datum}, "
        f"params={want}")
