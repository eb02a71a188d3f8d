"""Bigram-LM perplexity + Naive Bayes classifier (text/lm.py).

Goldens are hand-computed on tiny corpora; the DuckDB twins are
exercised by the oracle gate (lm_perplexity / nb_classify)."""

import math

import pytest

from gdal_spark.text import lm


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, lang string, text string")


def test_bigram_lm_hand_computed(spark):
    # one doc "a b a" + one doc "b b": exact add-one bigram model
    df = _docs(spark, [(0, "en", "a b a"), (1, "en", "b b")])
    out = {
        r["doc_id"]: r.asDict()
        for r in lm.train_score_bigram_lm(df).collect()
    }
    # bigrams: d0: (<s>,a) (a,b) (b,a); d1: (<s>,b) (b,b)
    # c1: <s>=2, a=1, b=2 ; V = |{a,b}| = 2
    # c2: (<s>,a)=1 (<s>,b)=1 (a,b)=1 (b,a)=1 (b,b)=1
    def lp(c2, c1):
        return math.floor(1e6 * math.log((c2 + 1) / (c1 + 2)))

    d0 = -(lp(1, 2) + lp(1, 1) + lp(1, 2))
    d1 = -(lp(1, 2) + lp(1, 2))
    assert out[0]["n_bigrams"] == 3 and out[0]["nll_micro"] == d0
    assert out[1]["n_bigrams"] == 2 and out[1]["nll_micro"] == d1
    assert out[0]["nll_avg_micro"] == d0 // 3


def test_bigram_lm_unk_mapping(spark):
    # top_v=1 keeps only the most frequent token ('b'); everything
    # else folds to <unk>
    df = _docs(spark, [(0, "en", "a b b c"), (1, "en", "b x")])
    out = lm.train_score_bigram_lm(df, top_v=1).collect()
    assert {r["doc_id"] for r in out} == {0, 1}
    # vocab after mapping is {b, <unk>} so the model has <= 3*2 rows;
    # both docs score finite integers
    assert all(r["nll_micro"] > 0 for r in out)


def test_bigram_lm_ranking_separates_repetition(spark):
    # a highly repetitive doc compresses better than a shuffled one
    # under a corpus model dominated by the repetitive pattern
    rows = [(i, "en", "x y " * 20) for i in range(8)]
    rows.append((8, "en", "y y x x y x x y"))
    df = _docs(spark, [(i, l, t.strip()) for i, l, t in rows])
    out = {r["doc_id"]: r["nll_avg_micro"]
           for r in lm.train_score_bigram_lm(df).collect()}
    assert out[8] > out[0]


def test_nb_recovers_separable_labels(spark):
    rows = []
    for i in range(10):
        rows.append((i, "aa", "red red blue"))
        rows.append((100 + i, "bb", "green green blue"))
    df = _docs(spark, rows)
    out = lm.train_predict_nb(df).collect()
    assert all(r["is_correct"] for r in out)
    assert {r["pred_label"] for r in out} == {"aa", "bb"}


def test_nb_tiebreak_ascending_label(spark):
    # perfectly symmetric corpus: every doc ties across both labels;
    # the ascending-label tiebreak must pick 'aa' for all
    df = _docs(spark, [(0, "aa", "w"), (1, "bb", "w")])
    out = {r["doc_id"]: r["pred_label"]
           for r in lm.train_predict_nb(df).collect()}
    assert out == {0: "aa", 1: "aa"}


def test_nb_score_is_integer_micro_nats(spark):
    df = _docs(spark, [(0, "aa", "p q"), (1, "bb", "q r")])
    for r in lm.train_predict_nb(df).collect():
        assert isinstance(r["score_micro"], int)
        assert r["score_micro"] < 0  # log-probs are negative
