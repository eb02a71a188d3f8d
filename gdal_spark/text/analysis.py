"""Text analysis: token stats, quality scoring, language-ID profile
scoring, document fingerprinting.

All Column math (higher-order array functions -> whole-stage codegen,
JVM-side). Each operator has a `sql_*` DuckDB twin used by oracles.

Language-ID note: the synthetic corpus shares one vocabulary across
languages, so the profile scorer's *prediction semantics* (argmax of
stopword-profile overlap with alphabetical tiebreak) is what is
verified — the same n-gram/stopword mechanism works on real corpora
by swapping the profile lists.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from gdal_spark.text import hashing as H

# fixed alphabetical language order for deterministic tiebreaks
LANGS = ("de", "en", "es", "fr", "zh")
PROFILES: dict[str, tuple[str, ...]] = {
    "de": ("agg", "table", "hash", "sort"),
    "en": ("the", "a", "fast", "big"),
    "es": ("data", "stream", "filter", "row"),
    "fr": ("query", "order", "value", "line"),
    "zh": ("window", "merge", "batch", "join"),
}

QUALITY_TARGET_TOKENS = 40


def with_tokens(df: DataFrame, text_col: str = "text") -> DataFrame:
    return df.withColumn("toks", F.split(F.col(text_col), " "))


def token_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """n_tokens, n_distinct, n_chars, order-sensitive fingerprint,
    and a quality score in milli-units:
    quality = 0.5*min(1, n_tokens/40) + 0.5*(n_distinct/n_tokens)."""
    df = with_tokens(df, text_col)
    df = df.withColumn("hs", F.expr(H.spark_token_hashes("toks")))
    nt = F.size("toks")
    nd = F.size(F.array_distinct("toks"))
    quality = (
        F.lit(0.5) * F.least(F.lit(1.0), nt.cast("double") / F.lit(float(QUALITY_TARGET_TOKENS)))
        + F.lit(0.5) * (nd.cast("double") / nt.cast("double"))
    )
    return df.select(
        "doc_id",
        nt.cast("long").alias("n_tokens"),
        nd.cast("long").alias("n_distinct"),
        F.length(text_col).cast("long").alias("n_chars"),
        F.expr(H.spark_fingerprint("hs")).alias("fingerprint"),
        F.floor(F.lit(1000.0) * quality).cast("long").alias("quality_milli"),
    )


def _profile_score(lang: str) -> Column:
    words = ", ".join(f"'{w}'" for w in PROFILES[lang])
    return F.expr(f"size(filter(toks, t -> t in ({words})))").cast("long")


def lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Stopword-profile scorer: per-language token-overlap count,
    argmax with alphabetical tiebreak."""
    df = with_tokens(df, text_col)
    for lang in LANGS:
        df = df.withColumn(f"s_{lang}", _profile_score(lang))
    best = F.greatest(*[F.col(f"s_{lang}") for lang in LANGS])
    # first alphabetical lang achieving the max (deterministic tiebreak)
    expr = F.lit(LANGS[-1])
    for lang in reversed(LANGS[:-1]):
        expr = F.when(F.col(f"s_{lang}") == best, F.lit(lang)).otherwise(expr)
    return df.select(
        "doc_id", expr.alias("pred_lang"), best.cast("long").alias("best_score")
    )


# ---------------------------------------------------------------------------
# DuckDB twins
# ---------------------------------------------------------------------------

def sql_token_stats(src: str = "documents") -> str:
    q = (
        f"(0.5 * least(1.0, cast(len(toks) as double) / {float(QUALITY_TARGET_TOKENS)})"
        f" + 0.5 * (cast(len(list_distinct(toks)) as double) / cast(len(toks) as double)))"
    )
    return f"""
WITH t AS (
  SELECT doc_id, text, string_split(text, ' ') AS toks FROM {src}
),
h AS (
  SELECT doc_id, text, toks, {H.duck_token_hashes('toks')} AS hs FROM t
)
SELECT doc_id,
  cast(len(toks) as bigint) AS n_tokens,
  cast(len(list_distinct(toks)) as bigint) AS n_distinct,
  cast(length(text) as bigint) AS n_chars,
  {H.duck_fingerprint('hs')} AS fingerprint,
  cast(floor(1000.0 * {q}) as bigint) AS quality_milli
FROM h
"""


def sql_lang_id(src: str = "documents") -> str:
    score_cols = []
    for lang in LANGS:
        words = ", ".join(f"'{w}'" for w in PROFILES[lang])
        score_cols.append(
            f"cast(len(list_filter(toks, t -> t in ({words}))) as bigint) AS s_{lang}"
        )
    best = "greatest(" + ", ".join(f"s_{lang}" for lang in LANGS) + ")"
    case = "CASE " + " ".join(
        f"WHEN s_{lang} = m THEN '{lang}'" for lang in LANGS
    ) + " END"
    return f"""
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM {src}
),
s AS (
  SELECT doc_id, {', '.join(score_cols)} FROM t
),
m AS (
  SELECT doc_id, s_de, s_en, s_es, s_fr, s_zh, {best} AS m FROM s
)
SELECT doc_id, {case} AS pred_lang, m AS best_score FROM m
"""
