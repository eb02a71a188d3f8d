"""Statistical text models over the documents corpus, distributed.

Two operators a large-scale training-data pipeline needs that the
tokens/dedup modules don't cover:

1. **Bigram language-model perplexity** (`train_score_bigram_lm`) —
   the CCNet-style quality bucket: train an add-one-smoothed bigram
   LM on the corpus itself (one pass of token-key shuffles), then
   score every document with its average negative log-likelihood.
   Documents whose NLL is far above the corpus median are
   boilerplate/noise candidates.  Public semantics: Wenzek et al.,
   "CCNet: Extracting High Quality Monolingual Datasets from Web
   Crawl Data" (LREC 2020) — we replace KenLM with a corpus-trained
   bigram model so the whole operator is closed-form and
   oracle-able.

2. **Multinomial Naive Bayes classifier** (`train_predict_nb`) —
   train per-(label, token) counts from a labelled column (the
   corpus ships `lang`), add-one smoothing, then argmax posterior
   per document.  This is the classic fastText-style quality /
   language filter reduced to its countable core.

Float-parity discipline (CLAUDE.md): every log is quantized ONCE per
distinct model entry — `floor(1e6 * ln(rational))` over exact
integer counts — then documents aggregate INTEGER micro-nats, so the
cross-engine hash cannot wobble on aggregation order.

Scale notes (100 TB):
- Training is groupBy on token keys with map-side partial
  aggregation; the fitted model is vocab-sized (capped by `top_v`
  with an `<unk>` bucket, the standard LM closed-vocabulary trick),
  so the scoring join is a broadcast hash join.
- The deterministic top-V vocabulary rank is a global window over
  the *aggregated vocabulary table* (metadata-sized — millions of
  rows at worst), never over the corpus.
- Document scoring reuses the hash partitioning on doc_id: the lag
  window and the final groupBy share one exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

BOS = "<s>"
UNK = "<unk>"

# micro-nats: 1e6 quantum on |ln| <= ~20 leaves ~9 decimal digits of
# slack above the 1-ulp libm divergence between the JVM and DuckDB.
_Q = 1_000_000.0


def _unigrams(docs: DataFrame, text_col: str) -> DataFrame:
    """(doc_id, i, w) token stream — posexplode of the split column."""
    return docs.select(
        "doc_id",
        F.posexplode(F.split(F.col(text_col), " ")).alias("i", "w"),
    )


def _top_v(uni: DataFrame, top_v: int) -> DataFrame:
    """Deterministic top-V vocabulary: rank by (count desc, token asc).

    The window is global but runs over the aggregated vocabulary
    table, which is metadata-sized — documented scale exception.
    """
    counts = uni.groupBy("w").agg(F.count("*").alias("cnt"))
    rk = F.row_number().over(Window.orderBy(F.desc("cnt"), F.asc("w")))
    return counts.withColumn("rk", rk).where(F.col("rk") <= top_v).select("w")


def _map_unk(uni: DataFrame, top_v: int | None) -> DataFrame:
    if top_v is None:
        return uni
    keep = _top_v(uni, top_v).withColumn("_keep", F.lit(True))
    return (
        uni.join(F.broadcast(keep), "w", "left")
        .withColumn("w", F.when(F.col("_keep"), F.col("w")).otherwise(F.lit(UNK)))
        .drop("_keep")
    )


def train_score_bigram_lm(
    docs: DataFrame, text_col: str = "text", top_v: int | None = None
) -> DataFrame:
    """Train an add-one bigram LM on `docs` and score every document.

    Returns (doc_id, n_bigrams, nll_micro, nll_avg_micro): the count
    of scored bigrams (== token count; position 0 pairs with the
    BOS sentinel), the total and the per-token average negative
    log-likelihood in integer micro-nats.
    """
    uni = _map_unk(_unigrams(docs, text_col), top_v)

    # bigram stream via lag over (doc_id, i) — one doc_id exchange,
    # reused by the final groupBy below.
    w_doc = Window.partitionBy("doc_id").orderBy("i")
    bg = uni.withColumn(
        "w1", F.coalesce(F.lag("w").over(w_doc), F.lit(BOS))
    ).select("doc_id", "w1", F.col("w").alias("w2"))

    m2 = bg.groupBy("w1", "w2").agg(F.count("*").alias("c2"))
    m1 = bg.groupBy("w1").agg(F.count("*").alias("c1"))
    v = bg.agg(F.countDistinct("w2").alias("nv"))

    lp = (
        m2.join(m1, "w1")
        .crossJoin(F.broadcast(v))
        .withColumn(
            "lpm",
            F.floor(
                F.lit(_Q)
                * F.log(
                    (F.col("c2") + F.lit(1)).cast("double")
                    / (F.col("c1") + F.col("nv")).cast("double")
                )
            ).cast("long"),
        )
        .select("w1", "w2", "lpm")
    )

    scored = (
        bg.join(F.broadcast(lp), ["w1", "w2"])
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_bigrams"),
            (-F.sum("lpm")).cast("long").alias("nll_micro"),
        )
    )
    return scored.select(
        "doc_id",
        "n_bigrams",
        "nll_micro",
        F.expr("nll_micro div n_bigrams").cast("long").alias("nll_avg_micro"),
    )


def train_predict_nb(
    docs: DataFrame, label_col: str = "lang", text_col: str = "text"
) -> DataFrame:
    """Multinomial Naive Bayes: train on (label_col, tokens of
    text_col), predict the label of every document.

    Returns (doc_id, pred_label, score_micro, is_correct) where
    score_micro = quantized log prior + sum of quantized per-token
    log likelihoods (integer micro-nats, add-one smoothing) and
    is_correct compares against the training label.  Ties break on
    ascending label.
    """
    uni = docs.select(
        "doc_id",
        F.col(label_col).alias("lbl"),
        F.explode(F.split(F.col(text_col), " ")).alias("w"),
    )

    cls_tok = uni.groupBy("lbl", "w").agg(F.count("*").alias("c_lt"))
    cls_tot = uni.groupBy("lbl").agg(F.count("*").alias("tot_l"))
    vocab = uni.select("w").distinct()
    v = uni.agg(F.countDistinct("w").alias("nv"))

    # dense (label, token) grid so unseen pairs get the smoothed floor
    grid = (
        cls_tot.crossJoin(vocab)
        .join(cls_tok, ["lbl", "w"], "left")
        .crossJoin(F.broadcast(v))
        .withColumn(
            "llh",
            F.floor(
                F.lit(_Q)
                * F.log(
                    (F.coalesce(F.col("c_lt"), F.lit(0)) + F.lit(1)).cast("double")
                    / (F.col("tot_l") + F.col("nv")).cast("double")
                )
            ).cast("long"),
        )
        .select("lbl", "w", "llh")
    )

    n_docs = docs.agg(F.count("*").alias("n_all"))
    priors = (
        docs.groupBy(F.col(label_col).alias("lbl"))
        .agg(F.count("*").alias("n_l"))
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "prior",
            F.floor(
                F.lit(_Q)
                * F.log(F.col("n_l").cast("double") / F.col("n_all").cast("double"))
            ).cast("long"),
        )
        .select("lbl", "prior")
    )

    tok_scores = (
        docs.select("doc_id", F.explode(F.split(F.col(text_col), " ")).alias("w"))
        .join(F.broadcast(grid), "w")
        .groupBy("doc_id", "lbl")
        .agg(F.sum("llh").alias("s_tok"))
        .join(F.broadcast(priors), "lbl")
        .withColumn("score_micro", (F.col("s_tok") + F.col("prior")).cast("long"))
    )

    w_best = Window.partitionBy("doc_id").orderBy(
        F.desc("score_micro"), F.asc("lbl")
    )
    best = (
        tok_scores.withColumn("rk", F.row_number().over(w_best))
        .where(F.col("rk") == 1)
        .select("doc_id", F.col("lbl").alias("pred_label"), "score_micro")
    )
    truth = docs.select("doc_id", F.col(label_col).alias("true_label"))
    return best.join(truth, "doc_id").select(
        "doc_id",
        "pred_label",
        "score_micro",
        (F.col("pred_label") == F.col("true_label")).alias("is_correct"),
    )


# ---------------------------------------------------------------------------
# DuckDB twins
# ---------------------------------------------------------------------------

_DQ = "cast('1e6' as double)"


def sql_bigram_lm(src: str = "documents", top_v: int | None = None,
                  max_tokens: int = 128) -> str:
    if top_v is None:
        mapped = "SELECT doc_id, i, w FROM uni"
    else:
        mapped = f"""
  SELECT doc_id, i,
    CASE WHEN w IN (SELECT w FROM topv) THEN w ELSE '{UNK}' END AS w
  FROM uni"""
    topv_cte = "" if top_v is None else f"""
topv AS (
  SELECT w FROM (
    SELECT w, row_number() OVER (ORDER BY count(*) DESC, w ASC) AS rk
    FROM uni GROUP BY w) WHERE rk <= {top_v}),"""
    return f"""
WITH tk AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM {src}
),
uni AS (
  SELECT doc_id, r.i AS i, t[r.i + 1] AS w
  FROM tk CROSS JOIN range(0, {max_tokens}) r(i) WHERE r.i < len(t)
),{topv_cte}
m AS ({mapped}),
bg AS (
  SELECT a.doc_id, CASE WHEN a.i = 0 THEN '{BOS}' ELSE b.w END AS w1,
         a.w AS w2
  FROM m a LEFT JOIN m b ON a.doc_id = b.doc_id AND b.i = a.i - 1
),
m2 AS (SELECT w1, w2, count(*) AS c2 FROM bg GROUP BY 1, 2),
m1 AS (SELECT w1, count(*) AS c1 FROM bg GROUP BY 1),
v AS (SELECT count(DISTINCT w2) AS nv FROM bg),
lp AS (
  SELECT w1, w2,
    cast(floor({_DQ} * ln(cast(c2 + 1 as double) / cast(c1 + nv as double)))
         as bigint) AS lpm
  FROM m2 JOIN m1 USING (w1) CROSS JOIN v
)
SELECT bg.doc_id, cast(count(*) as bigint) AS n_bigrams,
  cast(-sum(lpm) as bigint) AS nll_micro,
  cast((-sum(lpm)) // count(*) as bigint) AS nll_avg_micro
FROM bg JOIN lp USING (w1, w2) GROUP BY bg.doc_id
"""


def sql_nb(src: str = "documents", label_col: str = "lang") -> str:
    return f"""
WITH uni AS (
  SELECT doc_id, {label_col} AS lbl, unnest(string_split(text, ' ')) AS w
  FROM {src}
),
cls_tok AS (SELECT lbl, w, count(*) AS c_lt FROM uni GROUP BY 1, 2),
cls_tot AS (SELECT lbl, count(*) AS tot_l FROM uni GROUP BY 1),
vocab AS (SELECT DISTINCT w FROM uni),
v AS (SELECT count(DISTINCT w) AS nv FROM uni),
grid AS (
  SELECT t.lbl, vocab.w,
    cast(floor({_DQ} * ln(cast(coalesce(c.c_lt, 0) + 1 as double)
                          / cast(t.tot_l + v.nv as double))) as bigint) AS llh
  FROM cls_tot t CROSS JOIN vocab CROSS JOIN v
  LEFT JOIN cls_tok c ON c.lbl = t.lbl AND c.w = vocab.w
),
nd AS (SELECT count(*) AS n_all FROM {src}),
priors AS (
  SELECT {label_col} AS lbl,
    cast(floor({_DQ} * ln(cast(count(*) as double)
                          / cast((SELECT n_all FROM nd) as double)))
         as bigint) AS prior
  FROM {src} GROUP BY 1
),
toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM {src}
),
sc AS (
  SELECT toks.doc_id, grid.lbl,
    cast(sum(grid.llh) + any_value(priors.prior) as bigint) AS score_micro
  FROM toks JOIN grid USING (w) JOIN priors ON priors.lbl = grid.lbl
  GROUP BY 1, 2
),
best AS (
  SELECT doc_id, lbl AS pred_label, score_micro,
    row_number() OVER (PARTITION BY doc_id
                       ORDER BY score_micro DESC, lbl ASC) AS rk
  FROM sc
)
SELECT b.doc_id, b.pred_label, b.score_micro,
  (b.pred_label = d.{label_col}) AS is_correct
FROM best b JOIN {src} d USING (doc_id) WHERE b.rk = 1
"""
