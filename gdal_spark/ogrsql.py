"""OGR SQL dialect execution — translate literal OGR SQL strings to
Spark SQL and run them against a registered layer.

The reference's query surface is the swq grammar
(/root/reference/ogr/swq_parser.y, ogr/swq_select.cpp) evaluated by
OGRGenSQLResultsLayer; this module makes that DIALECT executable on
the engine by token-level translation (the operator set already maps
1:1 onto Spark SQL — SURVEY.md §2.3):

- double-quoted identifiers -> backticks (OGR strings are
  single-quoted, identifiers double-quoted; Spark parses "x" as a
  string literal by default);
- special fields (ogr/ogr_p.h:167-174): FID -> the fid column,
  OGR_GEOM_AREA -> ST_Area(geometry), OGR_GEOM_WKT ->
  ST_AsText(geometry), OGR_STYLE passes through as a column;
- OGR SQL type names in CAST (ogr/swq_parser.y type list):
  character[(n)] -> STRING, numeric/float -> DOUBLE,
  integer -> BIGINT (OGR integers are 64-bit in SQL results);
- LIKE is case-INsensitive in OGR SQL by default
  (ogr/swq_op_general.cpp:1090-1128, OGR_SQL_LIKE_AS_ILIKE
  pre-dates it; GDAL >= 3.1 semantics: LIKE == ILIKE) -> rewritten
  to Spark `ilike`; ILIKE passes through;
- `SELECT * EXCEPT (a, b)` / EXCLUDE passes to Spark's star-except.

Everything else (AND/OR/NOT/IN/BETWEEN/IS NULL/CONCAT/SUBSTR/
aggregates/ORDER BY/LIMIT/OFFSET/DISTINCT/UNION ALL) is shared
syntax and passes through verbatim.  The translation is token-level
(quote-aware), never regex-over-strings, so literals are untouched.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

_SPECIAL = {
    "FID": "fid",
    "OGR_GEOM_AREA": "ST_Area(geometry)",
    "OGR_GEOM_WKT": "ST_AsText(geometry)",
}

_TYPE_MAP = {
    "CHARACTER": "STRING",
    "STRING": "STRING",
    "NUMERIC": "DOUBLE",
    "FLOAT": "DOUBLE",
    "REAL": "DOUBLE",
    "INTEGER": "BIGINT",
    "BIGINT": "BIGINT",
    "SMALLINT": "INT",
    "BOOLEAN": "BOOLEAN",
    "DATE": "DATE",
    "TIMESTAMP": "TIMESTAMP",
}


def _tokens(sql: str):
    """Quote-aware token stream: yields (kind, text) with kind in
    {'str', 'ident', 'word', 'other'}.  Handles '' and "" escapes."""
    i, n = 0, len(sql)
    while i < n:
        c = sql[i]
        if c == "'":
            j = i + 1
            while j < n:
                if sql[j] == "'" and j + 1 < n and sql[j + 1] == "'":
                    j += 2
                elif sql[j] == "'":
                    break
                else:
                    j += 1
            yield "str", sql[i : j + 1]
            i = j + 1
        elif c == '"':
            j = i + 1
            while j < n:
                if sql[j] == '"' and j + 1 < n and sql[j + 1] == '"':
                    j += 2
                elif sql[j] == '"':
                    break
                else:
                    j += 1
            yield "ident", sql[i : j + 1]
            i = j + 1
        elif c.isalpha() or c == "_":
            m = re.match(r"[A-Za-z_][A-Za-z_0-9]*", sql[i:])
            yield "word", m.group(0)
            i += m.end()
        else:
            yield "other", c
            i += 1


def translate_ogr_sql(sql: str) -> str:
    out: list[str] = []
    toks = list(_tokens(sql))
    i = 0
    while i < len(toks):
        kind, text = toks[i]
        if kind == "str":
            out.append(text)
        elif kind == "ident":
            inner = text[1:-1].replace('""', '"')
            out.append(f"`{inner}`")
        elif kind == "word":
            up = text.upper()
            if up in _SPECIAL:
                out.append(_SPECIAL[up])
            elif up == "LIKE":
                # OGR LIKE is case-insensitive (swq_op_general.cpp)
                out.append("ilike")
            elif up == "AS" and _next_word_is_type(toks, i):
                # CAST(x AS <ogr type>[(n)]): rewrite the type name and
                # swallow a character(n) length argument
                out.append("AS")
                j = i + 1
                while toks[j][0] == "other" and toks[j][1].isspace():
                    out.append(toks[j][1])
                    j += 1
                tname = toks[j][1].upper()
                out.append(_TYPE_MAP[tname])
                j += 1
                if tname in ("CHARACTER", "STRING") and _peek_paren(toks, j):
                    j = _skip_paren(toks, j)
                i = j
                continue
            else:
                out.append(text)
        else:
            out.append(text)
        i += 1
    return "".join(out)


def _next_word_is_type(toks, i) -> bool:
    j = i + 1
    while j < len(toks) and toks[j][0] == "other" and toks[j][1].isspace():
        j += 1
    return j < len(toks) and toks[j][0] == "word" and toks[j][1].upper() in _TYPE_MAP


def _peek_paren(toks, j) -> bool:
    while j < len(toks) and toks[j][0] == "other" and toks[j][1].isspace():
        j += 1
    return j < len(toks) and toks[j] == ("other", "(")


def _skip_paren(toks, j) -> int:
    while toks[j] != ("other", "("):
        j += 1
    depth = 0
    while j < len(toks):
        if toks[j] == ("other", "("):
            depth += 1
        elif toks[j] == ("other", ")"):
            depth -= 1
            if depth == 0:
                return j + 1
        j += 1
    return j


def execute_ogr_sql(
    spark: SparkSession, layers: dict[str, DataFrame], sql: str
) -> DataFrame:
    """Register each layer DataFrame under its OGR layer name, make
    the ST_ function registry available, and run the translated
    statement."""
    from gdal_spark.geo.st_functions import register_st_functions

    register_st_functions(spark)
    for name, df in layers.items():
        df.createOrReplaceTempView(name)
    return spark.sql(translate_ogr_sql(sql))
