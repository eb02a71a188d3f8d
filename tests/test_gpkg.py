"""GeoPackage source/sink (gdal_spark/sources/gpkg.py) tests."""

import sqlite3

import numpy as np


def test_gpkg_roundtrip_exact(spark, tmp_path):
    from gdal_spark.fixtures.zones import build_zones
    from gdal_spark.sources.gpkg import read_gpkg, write_gpkg

    path = str(tmp_path / "zones.gpkg")
    z = build_zones(spark, n=20).select("fid", "eas_id", "kind", "geometry")
    write_gpkg(z, path, "zones")
    back = read_gpkg(spark, path, "zones", n_partitions=4)
    a = {r["fid"]: (r["eas_id"], r["kind"], bytes(r["geometry"])) for r in z.collect()}
    b = {r["fid"]: (r["eas_id"], r["kind"], bytes(r["geometry"])) for r in back.collect()}
    assert a == b


def test_gpkg_metadata_tables(spark, tmp_path):
    from gdal_spark.fixtures.zones import build_zones
    from gdal_spark.sources.gpkg import write_gpkg

    path = str(tmp_path / "meta.gpkg")
    z = build_zones(spark, n=5).select("fid", "eas_id", "kind", "geometry")
    write_gpkg(z, path, "zones")
    con = sqlite3.connect(path)
    (app_id,) = con.execute("PRAGMA application_id").fetchone()
    assert app_id == 1196444487  # 'GPKG'
    row = con.execute(
        "SELECT table_name, data_type, srs_id FROM gpkg_contents"
    ).fetchone()
    assert row == ("zones", "features", 4326)
    gc = con.execute(
        "SELECT table_name, column_name, srs_id FROM gpkg_geometry_columns"
    ).fetchone()
    assert gc == ("zones", "geometry", 4326)
    blob = con.execute("SELECT geometry FROM zones LIMIT 1").fetchone()[0]
    assert blob[:2] == b"GP" and blob[2] == 0
    flags = blob[3]
    assert flags & 1 and ((flags >> 1) & 7) == 1  # little-endian + XY env
    con.close()


def test_gpkg_blob_envelope_matches_bounds(spark, tmp_path):
    import struct

    from gdal_spark.geo.wkb import parse_wkb, wkb_polygon
    from gdal_spark.sources.gpkg import gpkg_blob_to_wkb, wkb_to_gpkg_blob

    ring = np.array([[1.0, 2.0], [5.0, 2.0], [5.0, 7.0], [1.0, 7.0], [1.0, 2.0]])
    wkb = wkb_polygon([ring])
    blob = wkb_to_gpkg_blob(wkb)
    xmin, xmax, ymin, ymax = struct.unpack_from("<4d", blob, 8)
    assert (xmin, xmax, ymin, ymax) == (1.0, 5.0, 2.0, 7.0)
    assert gpkg_blob_to_wkb(blob) == wkb


def test_geojsonseq_roundtrip_exact(spark, tmp_path):
    from gdal_spark.fixtures.zones import build_zones
    from gdal_spark.sources.geojsonseq import read_geojsonseq, write_geojsonseq

    path = str(tmp_path / "gjs")
    z = build_zones(spark, n=15).select("fid", "eas_id", "kind", "geometry")
    write_geojsonseq(z, path)
    back = read_geojsonseq(spark, path, "fid long, eas_id long, kind string")
    a = {r["fid"]: (r["eas_id"], r["kind"], bytes(r["geometry"])) for r in z.collect()}
    b = {r["fid"]: (r["eas_id"], r["kind"], bytes(r["geometry"])) for r in back.collect()}
    assert a == b  # repr-exact double roundtrip through JSON


def test_shp_prj_sidecar(spark, tmp_path):
    """.prj WKT1 sidecar roundtrips through the engine's CRS importer
    (ogr/ogrsf_frmts/shape .prj handling)."""
    import numpy as np

    from gdal_spark.geo import wkb as wkbmod
    from gdal_spark.sources.shapefile import read_prj, read_shp, write_shp

    sq = np.array([(0.0, 0.0), (2.0, 0.0), (2.0, 2.0), (0.0, 0.0)])
    df = spark.createDataFrame(
        [(1, bytearray(wkbmod.wkb_polygon([sq])))],
        "fid long, geometry binary",
    )
    base = str(tmp_path / "z")
    write_shp(df, base, crs=27700)
    assert read_prj(base) == 27700
    assert read_shp(spark, base).count() == 1
    # no sidecar -> unknown SRS, like the reference
    write_shp(df, str(tmp_path / "n"))
    assert read_prj(str(tmp_path / "n")) is None
