"""OGR SQL dialect translator (gdal_spark/ogrsql.py)."""

import pytest

from gdal_spark.ogrsql import OgrSqlJoinError, translate_ogr_sql


def test_identifiers_to_backticks():
    assert translate_ogr_sql('SELECT "kind" FROM t') == "SELECT `kind` FROM t"
    # embedded "" escape
    assert translate_ogr_sql('SELECT "a""b" FROM t') == "SELECT `a\"b` FROM t"


def test_string_literals_untouched():
    sql = "SELECT * FROM t WHERE name = 'he said \"LIKE\" FID'"
    assert translate_ogr_sql(sql) == sql


def test_special_fields():
    out = translate_ogr_sql("SELECT FID, OGR_GEOM_AREA, OGR_GEOM_WKT FROM t")
    assert out == "SELECT fid, ST_Area(geometry), ST_AsText(geometry) FROM t"


def test_like_is_case_insensitive():
    assert (
        translate_ogr_sql("SELECT * FROM t WHERE a LIKE 'x%'")
        == "SELECT * FROM t WHERE a ilike 'x%'"
    )
    assert (
        translate_ogr_sql("WHERE a NOT like 'x%'")
        == "WHERE a NOT ilike 'x%'"
    )


def test_cast_type_rewrites():
    assert (
        translate_ogr_sql("CAST(x AS character(32))") == "CAST(x AS STRING)"
    )
    assert translate_ogr_sql("CAST(x AS numeric)") == "CAST(x AS DOUBLE)"
    assert translate_ogr_sql("CAST(x AS integer)") == "CAST(x AS BIGINT)"
    # a column alias is NOT a type rewrite
    assert translate_ogr_sql("SELECT x AS foo FROM t") == "SELECT x AS foo FROM t"


def test_alias_named_like_type_is_untouched():
    # ADVICE r3: `AS <type-word>` outside CAST(...) is a plain alias
    assert (
        translate_ogr_sql("SELECT a AS real, b AS date FROM t")
        == "SELECT a AS real, b AS date FROM t"
    )
    # and the rewrite still fires inside CAST even with an alias after
    assert (
        translate_ogr_sql("SELECT CAST(a AS float) AS numeric FROM t")
        == "SELECT CAST(a AS DOUBLE) AS numeric FROM t"
    )


def test_join_rewritten_to_first_match():
    out = translate_ogr_sql(
        "SELECT a.x, b.y FROM a JOIN b ON a.k = b.k",
        layer_columns={"b": ["k", "y"]},
    )
    assert "LEFT JOIN" in out
    assert "row_number() OVER (PARTITION BY `k` ORDER BY `k`, `y`)" in out
    assert "__rn = 1" in out
    # a secondary WITH fid orders by fid (OGR first-match = FID order)
    out2 = translate_ogr_sql(
        "SELECT a.x FROM a LEFT JOIN b ON a.k = b.k",
        layer_columns={"b": ["fid", "k", "y"]},
    )
    assert "ORDER BY fid)" in out2


def test_unsupported_join_shapes_raise():
    for bad in [
        "SELECT * FROM a INNER JOIN b ON a.x = b.x",
        "SELECT * FROM a RIGHT JOIN b ON a.x = b.x",
        "SELECT * FROM a CROSS JOIN b ON a.x = b.x",
        "SELECT * FROM a JOIN b ON a.x = b.x AND a.y = b.y",
        "SELECT * FROM a JOIN b ON x = y",
        "SELECT * FROM a JOIN b ON a.x < b.x",
    ]:
        with pytest.raises(OgrSqlJoinError):
            translate_ogr_sql(bad)


def test_execute_join_first_match(spark):
    from gdal_spark.ogrsql import execute_ogr_sql

    a = spark.createDataFrame([(1,), (2,), (3,)], "k long")
    b = spark.createDataFrame(
        [(10, 1, "x"), (11, 1, "y"), (12, 2, "z")], "fid long, k long, v string"
    )
    rows = execute_ogr_sql(
        spark,
        {"ta": a, "tb": b},
        "SELECT ta.k AS k, tb.v AS v FROM ta JOIN tb ON ta.k = tb.k",
    ).orderBy("k").collect()
    # first-match: k=1 -> min-fid row 'x' only; k=3 -> LEFT null
    assert [(r["k"], r["v"]) for r in rows] == [(1, "x"), (2, "z"), (3, None)]


def test_execute_against_layer(spark):
    from gdal_spark.ogrsql import execute_ogr_sql

    df = spark.createDataFrame(
        [(1, "Park"), (2, "water")], "fid long, kind string"
    )
    out = execute_ogr_sql(
        spark, {"lyr": df},
        """SELECT FID, "kind" FROM lyr WHERE "kind" LIKE 'PA%'""",
    ).collect()
    # FID resolves to the fid column (the output name follows the
    # underlying column; alias in the statement to rename)
    assert len(out) == 1 and out[0]["fid"] == 1
