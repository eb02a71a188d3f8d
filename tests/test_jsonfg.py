"""OGC JSON-FG source (ogr/ogrsf_frmts/jsonfg)."""

import json
import math
import os
import tempfile

from gdal_spark.geo.wkb import parse_wkb, wkb_point
from gdal_spark.sources.jsonfg import read_jsonfg, write_jsonfg


def _df(spark, pts):
    rows = [(i, t, bytearray(wkb_point(x, y)))
            for i, t, x, y in pts]
    return spark.createDataFrame(
        rows, "i long, t string, geometry binary"
    )


def test_wgs84_path_uses_geometry_member(spark):
    path = os.path.join(tempfile.mkdtemp(), "a.json")
    write_jsonfg(_df(spark, [(1, "2026-01-02", 10.5, -3.25)]), path,
                 time_col="t", feature_type="pts", epsg=4326)
    doc = open(path).read()
    assert '"conformsTo" : ["[ogc-json-fg-1-0.1:core]"]' in doc
    assert '"coordRefSys" : "[EPSG:4326]"' in doc
    (r,) = read_jsonfg(spark, path, "i long").collect()
    assert r["place"] is None
    g = parse_wkb(bytes(r["geometry"]))
    assert (g.parts[0][0][0], g.parts[0][0][1]) == (10.5, -3.25)
    assert r["time"] == "2026-01-02" and r["feature_type"] == "pts"
    # the raw feature line carries {"date": ...} (not timestamp)
    feat = next(ln for ln in doc.splitlines()
                if ln.lstrip().startswith('{"featureType"'))
    assert json.loads(feat.rstrip(","))["time"] == {"date": "2026-01-02"}


def test_projected_path_place_plus_wgs84_fallback(spark):
    path = os.path.join(tempfile.mkdtemp(), "b.json")
    x, y = 1113194.9079327357, 2273030.926987689  # merc of (10, 20)
    write_jsonfg(_df(spark, [(7, "2026-03-04", x, y)]), path,
                 time_col="t", epsg=3857)
    (r,) = read_jsonfg(spark, path, "i long").collect()
    p = parse_wkb(bytes(r["place"])).parts[0][0]
    assert abs(p[0] - x) < 1e-6 and abs(p[1] - y) < 1e-6
    g = parse_wkb(bytes(r["geometry"])).parts[0][0]
    assert math.isclose(g[0], 10.0, abs_tol=1e-9)
    assert math.isclose(g[1], 20.0, abs_tol=1e-9)
    assert '"coordRefSys" : "[EPSG:3857]"' in open(path).read()
