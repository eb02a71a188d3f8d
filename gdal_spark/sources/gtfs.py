"""GTFS (General Transit Feed Specification) vector source — the
reference's ogr/ogrsf_frmts/gtfs/ogrgtfsdriver.cpp.

A GTFS feed is a directory of CSV ``.txt`` files.  The reference
exposes each file as a layer, gives ``stops``/``shapes`` POINT
geometry from their lat/lon fields (:110-118), synthesizes a
LINESTRING per trip by chaining stop_times' stop_sequence-ordered
stops through the stops table (PrepareTripsData :193-253), and adds
a ``shapes_geom`` layer with one LINESTRING per shape_id ordered by
shape_pt_sequence (OGRGTFSShapesGeomLayer::Prepare :431-470).

Spark-first translation: the per-trip/per-shape in-memory maps
become ONE ``groupBy`` with ``array_sort(collect_list(struct(seq,
lon, lat)))`` — the sequence ordering rides the struct sort, no
driver-side maps, one exchange keyed on trip/shape id (uniform ids,
no skew).  CSV scans are Spark-native (splittable, pushdown-capable).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["write_gtfs_file", "read_gtfs_layer", "gtfs_trips_geom",
           "gtfs_shapes_geom", "GTFS_FILES"]

# the reference's layer whitelist (ogrgtfsdriver.cpp:536-540,576-580)
GTFS_FILES = (
    "agency", "calendar", "calendar_dates", "fare_attributes",
    "fare_rules", "frequencies", "routes", "shapes", "stops",
    "stop_times", "transfers", "trips",
)


def write_gtfs_file(df: DataFrame, dirname: str, name: str) -> None:
    """Stream one layer to ``<dir>/<name>.txt`` as a single CSV file
    (feeds are single-file-per-table by spec; floats print via repr
    so the read-back doubles are bit-identical)."""
    if name not in GTFS_FILES:
        raise ValueError(f"gtfs: unknown file {name!r}")
    os.makedirs(dirname, exist_ok=True)
    cols = df.columns
    with open(os.path.join(dirname, f"{name}.txt"), "w",
              encoding="utf-8") as fh:
        fh.write(",".join(cols) + "\n")
        for r in df.toLocalIterator():
            vals = []
            for c in cols:
                v = r[c]
                vals.append("" if v is None else
                            (repr(v) if isinstance(v, float) else str(v)))
            fh.write(",".join(vals) + "\n")


def read_gtfs_layer(spark: SparkSession, dirname: str,
                    name: str) -> DataFrame:
    """One GTFS file as a DataFrame (all-string columns, like the
    reference's CSV layer; cast at use sites)."""
    if name not in GTFS_FILES:
        raise ValueError(f"gtfs: unknown layer {name!r}")
    path = os.path.join(dirname, f"{name}.txt")
    if not os.path.exists(path):
        raise FileNotFoundError(f"gtfs: feed has no {name}.txt")
    return spark.read.csv(path, header=True)


def gtfs_trips_geom(spark: SparkSession, dirname: str) -> DataFrame:
    """The reference's enriched trips layer: one row per trip with
    the stop chain ordered by stop_sequence — columns (trip_id,
    route_id, n_stops, first_stop, last_stop, xs, ys) where xs/ys are
    the LINESTRING vertex arrays."""
    trips = read_gtfs_layer(spark, dirname, "trips").select(
        "trip_id", "route_id"
    )
    stop_times = read_gtfs_layer(spark, dirname, "stop_times").select(
        "trip_id", "stop_id",
        F.col("stop_sequence").cast("int").alias("seq"),
    )
    stops = read_gtfs_layer(spark, dirname, "stops").select(
        "stop_id",
        F.col("stop_lon").cast("double").alias("slon"),
        F.col("stop_lat").cast("double").alias("slat"),
    )
    chained = (
        stop_times.join(stops, "stop_id")
        .groupBy("trip_id")
        .agg(
            F.array_sort(
                F.collect_list(
                    F.struct("seq", "stop_id", "slon", "slat")
                )
            ).alias("pts")
        )
    )
    return (
        trips.join(chained, "trip_id")
        .select(
            "trip_id", "route_id",
            F.size("pts").alias("n_stops"),
            F.element_at("pts", 1)["stop_id"].alias("first_stop"),
            F.element_at("pts", -1)["stop_id"].alias("last_stop"),
            F.transform("pts", lambda p: p["slon"]).alias("xs"),
            F.transform("pts", lambda p: p["slat"]).alias("ys"),
        )
    )


def gtfs_shapes_geom(spark: SparkSession, dirname: str) -> DataFrame:
    """shapes_geom layer: one LINESTRING per shape_id ordered by
    shape_pt_sequence."""
    shapes = read_gtfs_layer(spark, dirname, "shapes").select(
        "shape_id",
        F.col("shape_pt_sequence").cast("int").alias("seq"),
        F.col("shape_pt_lon").cast("double").alias("lon"),
        F.col("shape_pt_lat").cast("double").alias("lat"),
    )
    return (
        shapes.groupBy("shape_id")
        .agg(F.array_sort(F.collect_list(F.struct("seq", "lon", "lat")))
             .alias("pts"))
        .select(
            "shape_id",
            F.size("pts").alias("n_points"),
            F.transform("pts", lambda p: p["lon"]).alias("xs"),
            F.transform("pts", lambda p: p["lat"]).alias("ys"),
        )
    )
