"""Shapefile source/sink (gdal_spark/sources/shapefile.py) tests."""

import struct

import numpy as np


def test_shp_roundtrip_polygons(spark, tmp_path):
    from gdal_spark.fixtures.zones import build_zones
    from gdal_spark.geo.geom import polygon_area
    from gdal_spark.geo.wkb import parse_wkb
    from gdal_spark.sources.shapefile import read_shp, write_shp

    base = str(tmp_path / "zones")
    z = build_zones(spark, n=20).select("fid", "eas_id", "kind", "geometry")
    write_shp(z, base)
    back = read_shp(spark, base, 4)
    a = {r["fid"]: r for r in z.collect()}
    b = {r["fid"]: r for r in back.collect()}
    assert set(a) == set(b)
    for fid in a:
        assert a[fid]["eas_id"] == b[fid]["eas_id"]
        assert a[fid]["kind"] == b[fid]["kind"]
        ra = parse_wkb(bytes(a[fid]["geometry"])).all_rings()[0]
        rb = parse_wkb(bytes(b[fid]["geometry"])).all_rings()[0]
        assert len(ra) == len(rb)
        assert abs(polygon_area(ra) - polygon_area(rb)) < 1e-12


def test_shp_file_structure(spark, tmp_path):
    from gdal_spark.fixtures.zones import build_zones
    from gdal_spark.sources.shapefile import write_shp

    base = str(tmp_path / "s")
    z = build_zones(spark, n=4).select("fid", "eas_id", "kind", "geometry")
    write_shp(z, base)
    with open(base + ".shp", "rb") as f:
        head = f.read(100)
    (code,) = struct.unpack_from(">i", head, 0)
    version, stype = struct.unpack_from("<ii", head, 28)
    assert code == 9994 and version == 1000 and stype == 5
    with open(base + ".shx", "rb") as f:
        shx = f.read()
    assert (len(shx) - 100) // 8 == 4
    with open(base + ".dbf", "rb") as f:
        dbf = f.read(32)
    assert dbf[0] == 3  # dBase III
    (n_rec,) = struct.unpack_from("<I", dbf, 4)
    assert n_rec == 4


def test_shp_ring_orientation_spec(spark, tmp_path):
    """Outer rings store CW in the file (ESRI spec), come back CCW."""
    from gdal_spark.geo.geom import ring_area
    from gdal_spark.geo.wkb import parse_wkb, wkb_polygon
    from gdal_spark.sources.shapefile import read_shp, write_shp, _shape_record

    ring = np.array([[0, 0], [4, 0], [4, 4], [0, 4], [0, 0]], float)  # CCW
    hole = np.array([[1, 1], [1, 2], [2, 2], [2, 1], [1, 1]], float)  # CW
    wkb = wkb_polygon([ring, hole])
    rec = _shape_record(wkb)
    n_parts, n_pts = struct.unpack_from("<ii", rec, 36)
    parts = struct.unpack_from(f"<{n_parts}i", rec, 44)
    pts = np.frombuffer(rec, "<f8", 2 * n_pts, 44 + 4 * n_parts).reshape(n_pts, 2)
    outer_file = np.vstack([pts[: parts[1]]])
    assert ring_area(outer_file) < 0  # CW in the file
    df = spark.createDataFrame([(1, wkb)], ["fid", "geometry"])
    base = str(tmp_path / "o")
    write_shp(df, base)
    back = parse_wkb(bytes(read_shp(spark, base, 1).collect()[0]["geometry"]))
    rings = back.all_rings()[0]
    assert ring_area(rings[0]) > 0      # outer CCW again
    assert ring_area(rings[1]) < 0      # hole CW
