"""GTFS feed source (ogr/ogrsf_frmts/gtfs/ogrgtfsdriver.cpp)."""

import os
import tempfile

import pytest
from pyspark.sql import functions as F

from gdal_spark.sources.gtfs import (
    gtfs_shapes_geom,
    gtfs_trips_geom,
    read_gtfs_layer,
    write_gtfs_file,
)


@pytest.fixture(scope="module")
def feed(spark):
    root = os.path.join(tempfile.mkdtemp(), "feed")
    stops = spark.createDataFrame(
        [("s1", "Alpha", 10.5, -1.25), ("s2", "Beta", 11.0, -2.0),
         ("s3", "Gamma", 12.25, -3.5)],
        "stop_id string, stop_name string, stop_lat double,"
        " stop_lon double",
    )
    trips = spark.createDataFrame(
        [("tA", "r1", ""), ("tB", "r2", "")],
        "trip_id string, route_id string, service_id string",
    )
    # out-of-order rows: sequence must come from stop_sequence
    st = spark.createDataFrame(
        [("tA", "s3", 2), ("tA", "s1", 1), ("tB", "s2", 1),
         ("tA", "s2", 3), ("tB", "s1", 2)],
        "trip_id string, stop_id string, stop_sequence int",
    )
    shapes = spark.createDataFrame(
        [("shp", 2, -2.0, 11.0), ("shp", 1, -1.25, 10.5)],
        "shape_id string, shape_pt_sequence int, shape_pt_lon double,"
        " shape_pt_lat double",
    )
    for name, df in [("stops", stops), ("trips", trips),
                     ("stop_times", st), ("shapes", shapes)]:
        write_gtfs_file(df, root, name)
    return root


def test_layers_roundtrip_exact_floats(spark, feed):
    stops = read_gtfs_layer(spark, feed, "stops")
    rows = {r["stop_id"]: r for r in stops.collect()}
    assert float(rows["s3"]["stop_lat"]) == 12.25
    assert float(rows["s1"]["stop_lon"]) == -1.25


def test_trips_geom_chains_in_sequence_order(spark, feed):
    got = {r["trip_id"]: r for r in gtfs_trips_geom(spark, feed).collect()}
    a = got["tA"]
    assert a["n_stops"] == 3
    assert (a["first_stop"], a["last_stop"]) == ("s1", "s2")
    assert a["xs"] == [-1.25, -3.5, -2.0]  # s1, s3, s2 by sequence
    b = got["tB"]
    assert (b["first_stop"], b["last_stop"]) == ("s2", "s1")
    assert b["route_id"] == "r2"


def test_shapes_geom(spark, feed):
    (r,) = gtfs_shapes_geom(spark, feed).collect()
    assert r["shape_id"] == "shp" and r["n_points"] == 2
    assert r["xs"] == [-1.25, -2.0] and r["ys"] == [10.5, 11.0]


def test_guards(spark, feed):
    with pytest.raises(ValueError, match="unknown layer"):
        read_gtfs_layer(spark, feed, "fizz")
    with pytest.raises(FileNotFoundError, match="agency"):
        read_gtfs_layer(spark, feed, "agency")
