"""OGR SQL dialect translator (gdal_spark/ogrsql.py)."""

from gdal_spark.ogrsql import translate_ogr_sql


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
