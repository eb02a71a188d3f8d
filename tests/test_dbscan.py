"""JDBC-style partitioned DB reads (sources/dbscan.py) against the
in-container sqlite stand-in."""

import sqlite3

import pytest

from gdal_spark.sources.dbscan import partition_clauses, read_db


def test_partition_clauses_tile_the_domain():
    cl = partition_clauses("k", 0, 100, 4)
    assert len(cl) == 4
    assert "IS NULL" in cl[0] and cl[0].startswith('"k" < 25')
    assert cl[1] == '"k" >= 25 AND "k" < 50'
    assert cl[-1] == '"k" >= 75'
    # every integer lands in exactly one clause
    for v in (-5, 0, 24, 25, 49, 74, 75, 99, 100, 10_000):
        hits = 0
        for c in cl:
            ok = False
            if "<" in c.split("OR")[0] and "IS NULL" in c:
                ok = v < int(c.split("<")[1].split("OR")[0])
            elif "AND" in c:
                lo = int(c.split(">=")[1].split("AND")[0])
                hi = int(c.split("<")[1])
                ok = lo <= v < hi
            else:
                ok = v >= int(c.split(">=")[1])
            hits += ok
        assert hits == 1, (v, cl)


def test_partition_clauses_degenerate():
    assert partition_clauses("k", 5, 5, 8) == ["1=1"]
    assert partition_clauses("k", 0, 3, 1) == ["1=1"]


@pytest.fixture()
def db(tmp_path):
    p = str(tmp_path / "t.sqlite")
    con = sqlite3.connect(p)
    con.execute(
        "CREATE TABLE obs (fid INTEGER PRIMARY KEY, name TEXT,"
        " score REAL, grp INTEGER)")
    con.executemany(
        "INSERT INTO obs VALUES (?,?,?,?)",
        [(i, f"n{i}", i * 0.5, i % 5) for i in range(200)])
    con.commit()
    con.close()
    return p


def test_read_db_partitioned_predicate_pruned(spark, db):
    df = read_db(
        spark, f"sqlite:///{db}", "obs",
        columns=["fid", "grp"],
        predicate="grp <> 2",
        partition_column="fid", num_partitions=6)
    assert df.columns == ["fid", "grp"]          # pruned SELECT
    rows = df.collect()
    assert len(rows) == 160                      # engine filtered
    assert {r["grp"] for r in rows} == {0, 1, 3, 4}
    assert sorted(r["fid"] for r in rows) == [
        i for i in range(200) if i % 5 != 2]
    assert df.rdd.getNumPartitions() == 6


def test_read_db_single_partition_and_types(spark, db):
    df = read_db(spark, f"sqlite:///{db}", "obs")
    assert [f.dataType.simpleString() for f in df.schema.fields] == [
        "bigint", "string", "double", "bigint"]
    assert df.count() == 200


def test_read_db_loud_errors(spark, db):
    with pytest.raises(ValueError, match="unknown columns"):
        read_db(spark, f"sqlite:///{db}", "obs", columns=["nope"])
    with pytest.raises(ValueError, match="no such table"):
        read_db(spark, f"sqlite:///{db}", "missing")
    with pytest.raises(ValueError, match="no driver"):
        read_db(spark, "postgresql://host/db", "obs")


def test_read_db_geometry_unwraps(spark, tmp_path):
    import numpy as np

    from gdal_spark.geo.wkb import parse_wkb, wkb_polygon
    from gdal_spark.sources.spatialite import write_spatialite

    ring = np.array([(0, 0), (4, 0), (4, 3), (0, 0)], dtype=float)
    df0 = spark.createDataFrame(
        [(1, 7, "a", bytearray(wkb_polygon([ring])))],
        "fid long, eas_id long, kind string, geometry binary")
    p = str(tmp_path / "g.sqlite")
    write_spatialite(df0, p, layer="zones")
    back = read_db(spark, f"sqlite:///{p}", "zones",
                   columns=["fid", "geometry"]).collect()
    g = parse_wkb(bytes(back[0]["geometry"]))
    assert np.array_equal(g.all_rings()[0][0], ring)


def test_read_db_empty_table_with_supplied_bound(spark, tmp_path):
    """A caller-supplied lower_bound must not defeat the empty-table
    guard when upper_bound still has to be auto-computed (and vice
    versa): both bounds NULL-check independently."""
    p = str(tmp_path / "empty.sqlite")
    con = sqlite3.connect(p)
    con.execute("CREATE TABLE obs (fid INTEGER, v REAL)")
    con.commit()
    con.close()
    for kw in ({"lower_bound": 0}, {"upper_bound": 10}, {}):
        df = read_db(spark, f"sqlite:///{p}", "obs",
                     partition_column="fid", num_partitions=4, **kw)
        assert df.count() == 0
        assert [f.name for f in df.schema.fields] == ["fid", "v"]
