"""WKT1 CRS import/export (gdal_spark/geo/wktcrs.py) — the
exportToWkt / importFromWkt / SetFromUserInput(WKT) surface
(/root/reference/ogr/ogrspatialreference.cpp)."""

import re

import pytest

from gdal_spark.geo import projzoo as pz
from gdal_spark.geo.wktcrs import parse_wkt, to_wkt, wkt_to_crs


def test_parse_wkt_grammar():
    node = parse_wkt(
        'PROJCS["x",GEOGCS["y",DATUM["d",SPHEROID["s",6378137,298.25]]],'
        'PARAMETER["p",1.5],AUTHORITY["EPSG","32610"]]'
    )
    assert node.name == "PROJCS"
    assert node.str0 == "x"
    sph = node.find("GEOGCS").find("DATUM").find("SPHEROID")
    assert sph.numbers() == [6378137.0, 298.25]
    assert node.find("AUTHORITY").children == ["EPSG", "32610"]


@pytest.mark.parametrize("key", sorted(pz.REGISTRY, key=str))
def test_wkt_roundtrip_every_registry_entry(key):
    wkt = to_wkt(key)
    assert wkt_to_crs(wkt) == key
    # and through the user-input front door
    assert pz.resolve_crs(wkt) == key


@pytest.mark.parametrize(
    "key", [4326, 27700, 3035, 6933, 5070, 3031, 5041, 32633, 32733,
            28992, 3395, "ESRI:54008", "ESRI:54009"])
def test_wkt_roundtrip_without_authority(key):
    # strip every AUTHORITY node: the import must re-derive the key
    # from PROJECTION + PARAMETER + datum matching alone
    wkt = re.sub(r',AUTHORITY\["[^"]*","[^"]*"\]', "", to_wkt(key))
    assert "AUTHORITY" not in wkt
    assert wkt_to_crs(wkt) == key


def test_wkt_import_external_utm():
    # a GDAL-emitted WKT1 for EPSG:32610 (typical .prj content),
    # no TOWGS84 node, spelled-out names
    wkt = """PROJCS["WGS 84 / UTM zone 10N",
        GEOGCS["WGS 84", DATUM["WGS_1984",
            SPHEROID["WGS 84",6378137,298.257223563]],
          PRIMEM["Greenwich",0], UNIT["degree",0.0174532925199433]],
        PROJECTION["Transverse_Mercator"],
        PARAMETER["latitude_of_origin",0],
        PARAMETER["central_meridian",-123],
        PARAMETER["scale_factor",0.9996],
        PARAMETER["false_easting",500000],
        PARAMETER["false_northing",0],
        UNIT["metre",1]]"""
    assert wkt_to_crs(wkt) == 32610


def test_wkt_import_esri_style_center_params():
    # ESRI writes latitude_of_origin where GDAL writes
    # latitude_of_center for LAEA — both must import
    wkt = to_wkt(3035).replace("latitude_of_center",
                               "latitude_of_origin").replace(
        "longitude_of_center", "central_meridian")
    wkt = re.sub(r',AUTHORITY\["[^"]*","[^"]*"\]', "", wkt)
    assert wkt_to_crs(wkt) == 3035


def test_wkt_unknown_raises():
    # AUTHORITY stripped so the method path must reject the name
    wkt = re.sub(r',AUTHORITY\["[^"]*","[^"]*"\]', "", to_wkt(3035))
    with pytest.raises(KeyError):
        wkt_to_crs(wkt.replace("Lambert_Azimuthal_Equal_Area", "Krovak"))
    with pytest.raises(ValueError):
        wkt_to_crs('LOCAL_CS["nope"]')


def test_reproject_accepts_wkt():
    x1, y1 = pz.reproject(5.0, 50.0, to_wkt(4326), to_wkt(3035))
    x2, y2 = pz.forward(3035, 5.0, 50.0)
    # reproject crosses the (zero-parameter) WGS84->ETRS89 Helmert;
    # the geocentric roundtrip's geodetic-latitude recovery costs
    # ~0.1 mm — the documented accuracy of the Helmert path
    assert abs(float(x1) - float(x2)) < 1e-3
    assert abs(float(y1) - float(y2)) < 1e-3


WKT2_BNG = '''PROJCRS["OSGB36 / British National Grid",
  BASEGEOGCRS["OSGB36", DATUM["Ordnance Survey of Great Britain 1936",
    ELLIPSOID["Airy 1830",6377563.396,299.3249646]]],
  CONVERSION["British National Grid",
    METHOD["Transverse Mercator",ID["EPSG",9807]],
    PARAMETER["Latitude of natural origin",49,ID["EPSG",8801]],
    PARAMETER["Longitude of natural origin",-2,ID["EPSG",8802]],
    PARAMETER["Scale factor at natural origin",0.9996012717,ID["EPSG",8805]],
    PARAMETER["False easting",400000,ID["EPSG",8806]],
    PARAMETER["False northing",-100000,ID["EPSG",8807]]],
  CS[Cartesian,2], ID["EPSG",27700]]'''


def test_wkt2_id_fast_path_and_param_matching():
    assert wkt_to_crs(WKT2_BNG) == 27700
    # strip the CRS-level ID -> method/parameter matching
    no_id = WKT2_BNG[:WKT2_BNG.rindex(', ID["EPSG",27700]')] + "]"
    assert wkt_to_crs(no_id) == 27700


def test_wkt2_geogcrs_ensemble():
    g = '''GEOGCRS["WGS 84",
      ENSEMBLE["World Geodetic System 1984 ensemble",
        MEMBER["WGS 84 (G2296)"],
        ELLIPSOID["WGS 84",6378137,298.257223563]],
      CS[ellipsoidal,2], AXIS["geodetic latitude (Lat)",north],
      AXIS["geodetic longitude (Lon)",east]]'''
    assert wkt_to_crs(g) == 4326


def test_wkt2_utm_recognition():
    u = '''PROJCRS["WGS 84 / UTM zone 31N",
      BASEGEOGCRS["WGS 84", DATUM["World Geodetic System 1984",
        ELLIPSOID["WGS 84",6378137,298.257223563]]],
      CONVERSION["UTM zone 31N",
        METHOD["Transverse Mercator",ID["EPSG",9807]],
        PARAMETER["Latitude of natural origin",0,ID["EPSG",8801]],
        PARAMETER["Longitude of natural origin",3,ID["EPSG",8802]],
        PARAMETER["Scale factor at natural origin",0.9996,ID["EPSG",8805]],
        PARAMETER["False easting",500000,ID["EPSG",8806]],
        PARAMETER["False northing",0,ID["EPSG",8807]]],
      CS[Cartesian,2]]'''
    assert wkt_to_crs(u) == 32631


def test_wkt2_homerc_method_code():
    s = '''PROJCRS["CH1903+ / LV95",
      BASEGEOGCRS["CH1903+", DATUM["CH1903+",
        ELLIPSOID["Bessel 1841",6377397.155,299.1528128]]],
      CONVERSION["Swiss Oblique Mercator 1995",
        METHOD["Hotine Oblique Mercator (variant B)",ID["EPSG",9815]],
        PARAMETER["Latitude of projection centre",46.952405555555565,ID["EPSG",8811]],
        PARAMETER["Longitude of projection centre",7.439583333333333,ID["EPSG",8812]],
        PARAMETER["Azimuth at projection centre",90,ID["EPSG",8813]],
        PARAMETER["Angle from Rectified to Skew Grid",90,ID["EPSG",8814]],
        PARAMETER["Scale factor at projection centre",1,ID["EPSG",8815]],
        PARAMETER["Easting at projection centre",2600000,ID["EPSG",8816]],
        PARAMETER["Northing at projection centre",1200000,ID["EPSG",8817]]],
      CS[Cartesian,2]]'''
    assert wkt_to_crs(s) == 2056


def test_wkt2_resolve_crs_entry():
    from gdal_spark.geo.projzoo import resolve_crs

    assert resolve_crs(WKT2_BNG) == 27700


def test_wkt2_export_roundtrips_every_registry_entry():
    """to_wkt2 inverts through the WKT2 importer for all entries —
    via the ID fast-path AND (spot-checked) parameter matching."""
    import re

    from gdal_spark.geo.wktcrs import to_wkt2

    for key in pz.REGISTRY:
        assert wkt_to_crs(to_wkt2(key)) == key, key
    for key in (27700, 5070, 2056, 5514, 3035, 6933, 4087, 26917, 3031):
        w = re.sub(r',ID\["EPSG",%s\]\]$' % key, "]", to_wkt2(key))
        assert wkt_to_crs(w) == key, key
