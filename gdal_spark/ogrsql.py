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
  integer -> BIGINT (OGR integers are 64-bit in SQL results).
  The type rewrite fires ONLY inside a CAST(...) — a plain alias
  like `SELECT a AS date` is left untouched;
- LIKE is case-INsensitive in OGR SQL by default
  (ogr/swq_op_general.cpp:1090-1128, OGR_SQL_LIKE_AS_ILIKE
  pre-dates it; GDAL >= 3.1 semantics: LIKE == ILIKE) -> rewritten
  to Spark `ilike`; ILIKE passes through;
- `SELECT * EXCEPT (a, b)` / EXCLUDE passes to Spark's star-except;
- JOIN: OGR SQL joins are LEFT, single-equality, FIRST-MATCH-only
  lookups into the secondary table (ogr/ogr_gensql.cpp:1497-1527 —
  the secondary is scanned in FID order and the first matching
  feature wins; no fan-out on duplicate keys).  A bare Spark JOIN
  would return ALL matches, so every `[LEFT] JOIN t ON a.k = t.k`
  is rewritten to a LEFT join against a per-key first-row subquery
  (row_number() over the join key ordered by fid — or, for layers
  without a fid column, by every secondary column in schema order,
  a deterministic total order).  Join shapes OGR itself rejects
  (RIGHT/FULL/CROSS/INNER, non-equality ON, OR'd conditions) raise
  OgrSqlJoinError instead of mis-executing.

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


class OgrSqlJoinError(ValueError):
    """An OGR SQL JOIN shape the dialect cannot execute faithfully."""


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


def _unq(tok) -> str:
    kind, text = tok
    if kind == "ident":
        return text[1:-1].replace('""', '"')
    return text


# ---------------------------------------------------------------------------
# JOIN rewrite (runs BEFORE the main token translation; the injected
# scaffolding uses only tokens the main pass leaves untouched)
# ---------------------------------------------------------------------------

_COND_END = {
    "WHERE", "GROUP", "ORDER", "LIMIT", "OFFSET", "UNION",
    "LEFT", "JOIN", "HAVING",
}


def _rewrite_joins(sql: str, layer_columns: dict[str, list[str]] | None) -> str:
    toks = list(_tokens(sql))
    n = len(toks)
    out: list[str] = []

    def skip_ws(j: int) -> int:
        while j < n and toks[j][0] == "other" and toks[j][1].isspace():
            j += 1
        return j

    def next_word(j: int) -> str:
        j = skip_ws(j)
        if j < n and toks[j][0] == "word":
            return toks[j][1].upper()
        return ""

    def parse_ref(j: int):
        """Parse `[qual.]col`; returns ((qual_tok|None, col_tok), next_j)."""
        j = skip_ws(j)
        if j >= n or toks[j][0] not in ("word", "ident"):
            return None, j
        first = toks[j]
        j2 = skip_ws(j + 1)
        if j2 < n and toks[j2] == ("other", "."):
            j3 = skip_ws(j2 + 1)
            if j3 < n and toks[j3][0] in ("word", "ident"):
                return (first, toks[j3]), skip_ws(j3 + 1)
        return (None, first), j2

    i = 0
    while i < n:
        kind, text = toks[i]
        up = text.upper() if kind == "word" else ""
        if kind == "word" and up in ("RIGHT", "FULL", "CROSS", "INNER"):
            if next_word(i + 1) == "JOIN":
                raise OgrSqlJoinError(
                    f"OGR SQL supports only [LEFT] JOIN (first-match "
                    f"lookup, ogr/swq_parser.y); {up} JOIN is not part "
                    f"of the dialect"
                )
        if kind == "word" and up == "LEFT" and next_word(i + 1) == "JOIN":
            i = skip_ws(i + 1)  # fold LEFT into the JOIN branch below
            continue
        if kind == "word" and up == "JOIN":
            j = skip_ws(i + 1)
            if j >= n or toks[j][0] not in ("word", "ident"):
                raise OgrSqlJoinError("JOIN must name a secondary layer")
            table_tok = toks[j]
            table_name = _unq(table_tok)
            j = skip_ws(j + 1)
            if j < n and toks[j][0] == "word" and toks[j][1].upper() == "AS":
                j = skip_ws(j + 1)
            alias = None
            if (
                j < n
                and toks[j][0] in ("word", "ident")
                and toks[j][1].upper() != "ON"
            ):
                alias = _unq(toks[j])
                j = skip_ws(j + 1)
            if j >= n or toks[j][0] != "word" or toks[j][1].upper() != "ON":
                raise OgrSqlJoinError("OGR SQL JOIN requires an ON clause")
            j = skip_ws(j + 1)
            lhs, j = parse_ref(j)
            if lhs is None or j >= n or toks[j] != ("other", "="):
                raise OgrSqlJoinError(
                    "OGR SQL JOIN supports a single `a.field = b.field` "
                    "equality in ON (ogr/ogr_gensql.cpp secondary lookup)"
                )
            rhs, j = parse_ref(j + 1)
            if rhs is None:
                raise OgrSqlJoinError("malformed JOIN ON right-hand side")
            if j < n and toks[j][0] == "word" and toks[j][1].upper() in (
                "AND",
                "OR",
            ):
                raise OgrSqlJoinError(
                    "OGR SQL JOIN accepts exactly one equality condition"
                )
            if (
                j < n
                and not (
                    toks[j][0] == "word" and toks[j][1].upper() in _COND_END
                )
            ):
                raise OgrSqlJoinError(
                    f"unsupported token {toks[j][1]!r} after JOIN condition"
                )
            eff = alias or table_name
            sec = None
            for side in (lhs, rhs):
                qual = side[0]
                if qual is not None and _unq(qual).upper() == eff.upper():
                    sec = side
            if sec is None:
                raise OgrSqlJoinError(
                    "JOIN condition must qualify the secondary column "
                    f"with the layer name/alias {eff!r}"
                )
            key_col = _unq(sec[1])
            cols = (layer_columns or {}).get(table_name)
            if cols and "fid" in cols:
                order_by = "fid"
            elif cols:
                order_by = ", ".join(f'"{c}"' for c in cols)
            else:
                order_by = "fid"  # OGR layers always expose FID
            def ref_sql(side):
                qual, col = side
                q = f'"{_unq(qual)}".' if qual is not None else ""
                return f'{q}"{_unq(col)}"'
            out.append(
                f'LEFT JOIN (SELECT * EXCEPT (__rn) FROM '
                f'(SELECT *, row_number() OVER '
                f'(PARTITION BY "{key_col}" ORDER BY {order_by}) AS __rn '
                f'FROM "{table_name}") WHERE __rn = 1) AS "{eff}" '
                f"ON {ref_sql(lhs)} = {ref_sql(rhs)} "
            )
            i = j
            continue
        out.append(text)
        i += 1
    return "".join(out)


def translate_ogr_sql(
    sql: str, layer_columns: dict[str, list[str]] | None = None
) -> str:
    sql = _rewrite_joins(sql, layer_columns)
    out: list[str] = []
    toks = list(_tokens(sql))
    i = 0
    paren_depth = 0
    cast_depths: list[int] = []  # paren depth of each open CAST(
    cast_pending = False
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
            elif up == "CAST":
                cast_pending = True
                out.append(text)
            elif up == "LIKE":
                # OGR LIKE is case-insensitive (swq_op_general.cpp)
                out.append("ilike")
            elif (
                up == "AS"
                and cast_depths
                and cast_depths[-1] == paren_depth
                and _next_word_is_type(toks, i)
            ):
                # CAST(x AS <ogr type>[(n)]): rewrite the type name and
                # swallow a character(n) length argument.  Fires only
                # inside a CAST( ... ) — `SELECT a AS real` is an alias.
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
            if text == "(":
                paren_depth += 1
                if cast_pending:
                    cast_depths.append(paren_depth)
                    cast_pending = False
            elif text == ")":
                if cast_depths and cast_depths[-1] == paren_depth:
                    cast_depths.pop()
                paren_depth -= 1
            if not text.isspace():
                cast_pending = cast_pending and text == "("
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
    cols = {name: list(df.columns) for name, df in layers.items()}
    return spark.sql(translate_ogr_sql(sql, layer_columns=cols))
