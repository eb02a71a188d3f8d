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


# --- repetition quality signals (Gopher-style) -------------------------------

# duplicate n-gram fraction rejection thresholds in milli-units
# (Rae et al., "Scaling Language Models: ... Gopher", Table A1 uses
# 0.20 / 0.18 / 0.16 for duplicate 2/3/4-gram fractions)
GOPHER_DUP_MILLI = {2: 200, 3: 180, 4: 160}
GOPHER_TOP2_MILLI = 200


def _dup_frac_expr(shs: str) -> str:
    """milli-fraction of repeated n-gram slots: floor-exact integer
    (1000 * (total - distinct)) div total; 0 for shingle-less docs."""
    return (
        f"CASE WHEN size({shs}) = 0 THEN cast(0 as bigint) ELSE "
        f"(1000 * cast(size({shs}) - size(array_distinct({shs})) as bigint))"
        f" div size({shs}) END"
    )


_TOP_RUN = (
    "aggregate(array_sort({shs}), "
    "named_struct('prev', cast(-1 as bigint), 'run', 0, 'best', 0), "
    "(acc, x) -> named_struct('prev', x, "
    "'run', IF(x = acc.prev, acc.run + 1, 1), "
    "'best', greatest(acc.best, IF(x = acc.prev, acc.run + 1, 1))), "
    "acc -> acc.best)"
)


def repetition_signals(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document repetition quality signals (the Gopher filters):
    duplicate 2/3/4-gram milli-fractions, the most-frequent bigram's
    milli-share, and the keep/reject decision.

    Scale shape: PURE Column math — the top-bigram count is the max
    run of the SORTED shingle array (an aggregate fold), so no
    explode, no shuffle, nothing leaves the row.  All fractions are
    exact integer div, so the DuckDB twin matches bit-for-bit."""
    d = df.withColumn("toks", F.split(F.col(text_col), " ")).withColumn(
        "hs", F.expr(H.spark_token_hashes("toks"))
    )
    for n in (2, 3, 4):
        d = d.withColumn(f"sh{n}", F.expr(H.spark_shingle_hashes("hs", n)))
    top2 = (
        f"CASE WHEN size(sh2) = 0 THEN cast(0 as bigint) ELSE "
        f"(1000 * cast({_TOP_RUN.format(shs='sh2')} as bigint))"
        f" div size(sh2) END"
    )
    d = (
        d.withColumn("dup2_milli", F.expr(_dup_frac_expr("sh2")))
        .withColumn("dup3_milli", F.expr(_dup_frac_expr("sh3")))
        .withColumn("dup4_milli", F.expr(_dup_frac_expr("sh4")))
        .withColumn("top2_milli", F.expr(top2))
    )
    keep = (
        (F.col("dup2_milli") <= GOPHER_DUP_MILLI[2])
        & (F.col("dup3_milli") <= GOPHER_DUP_MILLI[3])
        & (F.col("dup4_milli") <= GOPHER_DUP_MILLI[4])
        & (F.col("top2_milli") <= GOPHER_TOP2_MILLI)
    )
    return d.select(
        "doc_id", "dup2_milli", "dup3_milli", "dup4_milli", "top2_milli",
        keep.cast("int").alias("keep"),
    )


def sql_repetition_signals(src: str = "documents") -> str:
    """DuckDB twin: same integer fractions; the top-bigram count is
    relational (explode + group) — max count == max sorted run."""
    def dup(shs):
        return (
            f"CASE WHEN len({shs}) = 0 THEN cast(0 as bigint) ELSE "
            f"(1000 * cast(len({shs}) - len(list_distinct({shs})) as bigint))"
            f" // len({shs}) END"
        )

    return f"""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM {src}),
hh AS (SELECT doc_id, {H.duck_token_hashes('toks')} AS hs FROM t),
sh AS (
  SELECT doc_id,
    {H.duck_shingle_hashes('hs', 2)} AS sh2,
    {H.duck_shingle_hashes('hs', 3)} AS sh3,
    {H.duck_shingle_hashes('hs', 4)} AS sh4
  FROM hh
),
occ2 AS (
  SELECT s.doc_id, s.sh2[r.i + 1] AS g
  FROM sh s JOIN range(0, 4096) r(i) ON r.i < len(s.sh2)
),
top2 AS (
  SELECT doc_id, max(c) AS maxc FROM (
    SELECT doc_id, g, count(*) AS c FROM occ2 GROUP BY 1, 2
  ) GROUP BY 1
),
sig AS (
  SELECT s.doc_id,
    {dup('s.sh2')} AS dup2_milli,
    {dup('s.sh3')} AS dup3_milli,
    {dup('s.sh4')} AS dup4_milli,
    CASE WHEN len(s.sh2) = 0 THEN cast(0 as bigint)
         ELSE (1000 * cast(coalesce(t.maxc, 0) as bigint)) // len(s.sh2)
    END AS top2_milli
  FROM sh s LEFT JOIN top2 t ON t.doc_id = s.doc_id
)
SELECT doc_id, dup2_milli, dup3_milli, dup4_milli, top2_milli,
  cast(CASE WHEN dup2_milli <= {GOPHER_DUP_MILLI[2]}
             AND dup3_milli <= {GOPHER_DUP_MILLI[3]}
             AND dup4_milli <= {GOPHER_DUP_MILLI[4]}
             AND top2_milli <= {GOPHER_TOP2_MILLI}
        THEN 1 ELSE 0 END as int) AS keep
FROM sig
"""


# --- sequence packing (concat-and-chunk) -------------------------------------

PACK_WINDOW = 512   # tokens per packed training sequence


def sequence_packing(df: DataFrame, window: int = PACK_WINDOW,
                     text_col: str = "text") -> DataFrame:
    """Concat-and-chunk sequence packing — the standard LLM
    pretraining layout: documents concatenate in a deterministic
    total order (source, doc_id) within each source stream, and the
    token stream splits into fixed `window`-token sequences.  Every
    document reports the sequence index and in-sequence offset where
    it starts, plus how many sequences it spans (documents CROSS
    sequence boundaries, as in real packing).

    Scale shape: one window cumsum per source partition — source
    streams are independent, so the shuffle key is `source` and skew
    is bounded by stream size (salt the cumsum with a two-phase
    running total if one source dominates).
    """
    from pyspark.sql import Window

    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    nt = F.size(F.split(F.col(text_col), " ")).cast("long")
    d = df.withColumn("n_tokens", nt).withColumn(
        "end_tok", F.sum("n_tokens").over(w)
    ).withColumn("start_tok", F.col("end_tok") - F.col("n_tokens"))
    return d.select(
        "doc_id",
        "source",
        "n_tokens",
        F.expr(f"start_tok div {window}").cast("long").alias("seq_idx"),
        F.pmod(F.col("start_tok"), F.lit(window)).cast("long")
          .alias("seq_offset"),
        F.expr(
            f"(end_tok - 1) div {window} - start_tok div {window}"
        ).cast("long").alias("n_boundary_crossings"),
    )


def sql_sequence_packing(src: str = "documents",
                         window: int = PACK_WINDOW) -> str:
    return f"""
WITH t AS (
  SELECT doc_id, source,
    cast(len(string_split(text, ' ')) as bigint) AS n_tokens
  FROM {src}
),
c AS (
  SELECT doc_id, source, n_tokens,
    sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                        ROWS UNBOUNDED PRECEDING) AS end_tok
  FROM t
)
SELECT doc_id, source, n_tokens,
  cast((end_tok - n_tokens) // {window} as bigint) AS seq_idx,
  cast((end_tok - n_tokens) % {window} as bigint) AS seq_offset,
  cast((end_tok - 1) // {window}
       - (end_tok - n_tokens) // {window} as bigint)
    AS n_boundary_crossings
FROM c
"""


def vocab_topk(df: DataFrame, k: int = 50,
               text_col: str = "text") -> DataFrame:
    """Corpus vocabulary statistics: the top-k tokens by total count
    with document frequency — the tokenizer-training / data-mixing
    staple.  One explode + one groupBy(token) with map-side partials;
    deterministic (count DESC, token ASC) ordering."""
    from pyspark.sql import Window

    tok = df.select(
        "doc_id", F.explode(F.split(F.col(text_col), " ")).alias("tok")
    )
    agg = tok.groupBy("tok").agg(
        F.count(F.lit(1)).alias("n_total"),
        F.countDistinct("doc_id").alias("n_docs"),
    )
    w = Window.orderBy(F.col("n_total").desc(), F.col("tok").asc())
    return (
        agg.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("rank", "tok", "n_total", "n_docs")
    )


def sql_vocab_topk(src: str = "documents", k: int = 50) -> str:
    return f"""
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM {src}
),
agg AS (
  SELECT tok, cast(count(*) as bigint) AS n_total,
         cast(count(DISTINCT doc_id) as bigint) AS n_docs
  FROM tok GROUP BY tok
)
SELECT cast(row_number() OVER (ORDER BY n_total DESC, tok ASC) as int)
         AS rank,
       tok, n_total, n_docs
FROM agg ORDER BY n_total DESC, tok ASC LIMIT {k}
"""


# --- TF-IDF keyword extraction ----------------------------------------------

def tfidf_topk(df: DataFrame, k: int = 3, text_col: str = "text") -> DataFrame:
    """Top-k keywords per document by TF-IDF.

    idf quantizes ONCE per vocabulary entry — floor(1e6 * ln(N/df)),
    exact integers downstream (tf * idf_micro), so the cross-engine
    hash is stable; ties break on ascending token.  Scale: tf and df
    are token-key groupBys with map-side partials; the idf table is
    vocab-sized -> broadcast; the per-doc top-k window partitions by
    doc_id (no global window over the corpus).
    """
    from pyspark.sql import Window

    tok = df.select(
        "doc_id", F.explode(F.split(F.col(text_col), " ")).alias("tok")
    )
    tf = tok.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tok.groupBy("tok").agg(F.countDistinct("doc_id").alias("df"))
    n = df.agg(F.count(F.lit(1)).alias("n_all"))
    idf = (
        dfreq.crossJoin(F.broadcast(n))
        .withColumn(
            "idf_micro",
            F.floor(
                F.lit(1e6)
                * F.log(F.col("n_all").cast("double") / F.col("df").cast("double"))
            ).cast("long"),
        )
        .select("tok", "idf_micro")
    )
    scored = tf.join(F.broadcast(idf), "tok").withColumn(
        "tfidf_micro", (F.col("tf") * F.col("idf_micro")).cast("long")
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.desc("tfidf_micro"), F.asc("tok")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("doc_id", "rank", "tok", F.col("tf").cast("long").alias("tf"),
                "tfidf_micro")
    )


def sql_tfidf_topk(src: str = "documents", k: int = 3) -> str:
    return f"""
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM {src}
),
tf AS (SELECT doc_id, tok, count(*) AS tf FROM tok GROUP BY 1, 2),
dfreq AS (SELECT tok, count(DISTINCT doc_id) AS df FROM tok GROUP BY 1),
n AS (SELECT count(*) AS n_all FROM {src}),
idf AS (
  SELECT tok, cast(floor(cast('1e6' as double) *
    ln(cast(n_all as double) / cast(df as double))) as bigint) AS idf_micro
  FROM dfreq CROSS JOIN n
),
sc AS (
  SELECT tf.doc_id, tf.tok, tf.tf, cast(tf.tf * idf.idf_micro as bigint)
           AS tfidf_micro,
    row_number() OVER (PARTITION BY tf.doc_id
                       ORDER BY tf.tf * idf.idf_micro DESC, tf.tok ASC) AS rk
  FROM tf JOIN idf USING (tok)
)
SELECT doc_id, cast(rk as int) AS rank, tok, cast(tf as bigint) AS tf,
       tfidf_micro
FROM sc WHERE rk <= {k}
"""


# --- PII redaction ------------------------------------------------------------

# deliberately simple character classes: identical semantics in Java
# regex (Spark) and RE2 (DuckDB) — no backrefs, no lookaround.
PII_PATTERNS = (
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z][A-Za-z]+", "<EMAIL>"),
    ("phone", "555-[0-9][0-9][0-9][0-9]", "<PHONE>"),
    ("ip", "10\\.[0-9]+\\.[0-9]+\\.[0-9]+", "<IP>"),
)


def redact_pii(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Scrub emails / phone extensions / internal IPs from a text
    column; emit per-kind match counts and the redacted text.  Pure
    Column math (regexp_extract_all / regexp_replace, JVM-side);
    patterns are deliberately lookaround-free so the DuckDB RE2 twin
    matches Java regex semantics byte for byte."""
    out = df
    red = F.col(text_col)
    for name, pat, rep in PII_PATTERNS:
        out = out.withColumn(
            f"n_{name}",
            F.size(F.expr(f"regexp_extract_all({text_col}, '{pat}', 0)"))
            .cast("long"),
        )
        red = F.regexp_replace(red, pat, rep)
    return out.withColumn("redacted", red).select(
        "doc_id", "n_email", "n_phone", "n_ip",
        F.length("redacted").cast("long").alias("redacted_len"),
        F.md5(F.col("redacted").cast("binary")).alias("redacted_md5"),
    )


def sql_redact_pii(src: str = "documents", text_expr: str = "text") -> str:
    n_cols, red = [], text_expr
    for name, pat, rep in PII_PATTERNS:
        n_cols.append(
            f"cast(len(regexp_extract_all({text_expr}, '{pat}')) as bigint)"
            f" AS n_{name}"
        )
        red = f"regexp_replace({red}, '{pat}', '{rep}', 'g')"
    return f"""
SELECT doc_id, {', '.join(n_cols)},
  cast(length({red}) as bigint) AS redacted_len,
  md5({red}) AS redacted_md5
FROM {src}
"""
