"""Distributed BPE tokenizer training (Sennrich et al. 2016,
"Neural Machine Translation of Rare Words with Subword Units").

The corpus pass is the only data-scale stage: ONE groupBy collapses
the corpus to (word, count) — vocabulary-sized metadata.  The merge
loop then runs k iterations of Spark aggregations over that small
DataFrame (explode adjacent symbol pairs weighted by word count,
argmax with deterministic (count desc, left asc, right asc)
tiebreak, apply the merge with a vectorized rewrite).  That is the
honest distributed shape of BPE: corpus-bound work happens once;
the inherently-sequential merge ladder iterates on metadata.

The merge application is left-to-right non-overlapping, matching
the reference algorithm: in "a a a" merging (a, a) yields
["aa", "a"], never ["a", "aa"].

Iterative and therefore not single-statement-SQL-expressible — the
correctness story is the differential pytest suite against an
independent in-memory reference implementation (tests/test_bpe.py),
the same documented exception class as dither/viewshed.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

END = "</w>"  # word-end marker, per the published algorithm

_SYM_SCHEMA = T.StructType(
    [
        T.StructField("syms", T.ArrayType(T.StringType())),
        T.StructField("cnt", T.LongType()),
    ]
)


def merge_once(syms: list[str], left: str, right: str) -> list[str]:
    """Left-to-right non-overlapping application of one merge."""
    out, k = [], 0
    while k < len(syms):
        if k + 1 < len(syms) and syms[k] == left and syms[k + 1] == right:
            out.append(left + right)
            k += 2
        else:
            out.append(syms[k])
            k += 1
    return out


def word_vocab(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus -> (syms, cnt) vocabulary: the single data-scale pass.

    Empty tokens from repeated separators are dropped — Python
    ``list("")`` is ``[]`` (a pairless 1-symbol word in the reference
    trainer) while Spark ``split('', '')`` is ``['']``; filtering
    keeps both engines on the same vocabulary and merges never touch
    a pairless word anyway."""
    return (
        docs.select(F.explode(F.split(F.col(text_col), " ")).alias("w"))
        .where(F.col("w") != "")
        .groupBy("w")
        .agg(F.count("*").cast("long").alias("cnt"))
        .withColumn(
            "syms",
            F.concat(
                F.split(F.col("w"), ""), F.array(F.lit(END))
            ),
        )
        .select("syms", "cnt")
    )


_PAIR_EXPLODE = (
    "transform(sequence(0, size(syms) - 2), "
    "j -> struct(syms[j] AS l, syms[j + 1] AS r))"
)


def pair_counts_top(docs: DataFrame, k: int = 32,
                    text_col: str = "text") -> DataFrame:
    """Top-k weighted adjacent-symbol pairs of the initial vocabulary
    (BPE iteration 0's candidate table) -> (rnk, l, r, cnt).

    (cnt desc, l, r) is a total order — (l, r) is unique after the
    groupBy — so the k-prefix is deterministic and oracle-safe."""
    from pyspark.sql import Window

    pairs = (
        word_vocab(docs, text_col)
        .where(F.size("syms") >= 2)
        .select(F.explode(F.expr(_PAIR_EXPLODE)).alias("p"), "cnt")
        .groupBy("p.l", "p.r")
        .agg(F.sum("cnt").alias("cnt"))
    )
    # distributed top-k (TakeOrderedAndProject: map-side partial
    # top-k, no single-partition window over the full pair table),
    # THEN rank the k surviving rows
    top = pairs.orderBy(F.desc("cnt"), F.asc("l"), F.asc("r")).limit(k)
    w = Window.orderBy(F.desc("cnt"), F.asc("l"), F.asc("r"))
    return top.select(
        F.row_number().over(w).cast("long").alias("rnk"), "l", "r", "cnt"
    )


def bpe_train(docs: DataFrame, n_merges: int,
              text_col: str = "text") -> list[tuple[str, str, int]]:
    """-> ordered merge table [(left, right, weighted_count), ...].

    Ties break on (count desc, left asc, right asc).  Stops early
    when no pair occurs twice."""
    # vocabulary-sized from here on; cache between iterations
    words = word_vocab(docs, text_col).localCheckpoint()

    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        # sequence(0, -1) DESCENDS in Spark — single-symbol words
        # (fully merged) must not reach the pair explode
        pairs = words.where(F.size("syms") >= 2).select(
            F.explode(F.expr(_PAIR_EXPLODE)).alias("p"),
            "cnt",
        ).groupBy("p.l", "p.r").agg(F.sum("cnt").alias("c"))
        top = pairs.orderBy(
            F.desc("c"), F.asc("l"), F.asc("r")
        ).limit(1).collect()  # 1-row argmax over metadata — documented
        if not top or top[0]["c"] < 2:
            break
        left, right, c = top[0]["l"], top[0]["r"], int(top[0]["c"])
        merges.append((left, right, c))

        def apply_merge(batches, left=left, right=right):
            for pdf in batches:
                pdf = pdf.copy()
                pdf["syms"] = pdf["syms"].map(
                    lambda s: merge_once(list(s), left, right)
                )
                yield pdf

        words = words.mapInPandas(apply_merge, _SYM_SCHEMA).localCheckpoint()
    return merges


def bpe_encode(word: str, merges: list[tuple[str, str, int]]) -> list[str]:
    """Apply a trained merge table to one word (greedy by rank)."""
    syms = list(word) + [END]
    for left, right, _ in merges:
        syms = merge_once(syms, left, right)
    return syms
