"""TF-IDF top-k + PII redaction (text/analysis.py)."""

import math

from gdal_spark.text import analysis as ta


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_tfidf_prefers_rare_tokens(spark):
    df = _docs(
        spark,
        [
            (0, "common rare0 common common"),
            (1, "common rare1 common"),
            (2, "common common common"),
        ],
    )
    out = {
        (r["doc_id"], r["rank"]): r["tok"]
        for r in ta.tfidf_topk(df, k=1).collect()
    }
    # 'common' appears in all docs -> idf 0; rare tokens win where present
    assert out[(0, 1)] == "rare0" and out[(1, 1)] == "rare1"
    assert out[(2, 1)] == "common"  # only choice, score 0


def test_tfidf_quantization_matches_closed_form(spark):
    df = _docs(spark, [(0, "a a b"), (1, "b c")])
    rows = ta.tfidf_topk(df, k=3).collect()
    idf_a = math.floor(1e6 * math.log(2 / 1))
    got = {(r["doc_id"], r["tok"]): r["tfidf_micro"] for r in rows}
    assert got[(0, "a")] == 2 * idf_a
    assert got[(0, "b")] == 0  # df=2, ln(1)=0
    assert got[(1, "c")] == idf_a


def test_redact_counts_and_text(spark):
    df = _docs(
        spark,
        [
            (0, "hi bob@x.com and sue@y.org call 555-1234"),
            (1, "server 10.1.2.3 up"),
            (2, "clean text"),
        ],
    )
    out = {r["doc_id"]: r.asDict() for r in ta.redact_pii(df).collect()}
    assert out[0]["n_email"] == 2 and out[0]["n_phone"] == 1
    assert out[1]["n_ip"] == 1 and out[1]["n_email"] == 0
    assert out[2]["n_email"] == out[2]["n_phone"] == out[2]["n_ip"] == 0
    # redacted length reflects '<EMAIL>' substitutions
    assert out[2]["redacted_len"] == len("clean text")
    assert (
        out[0]["redacted_len"]
        == len("hi <EMAIL> and <EMAIL> call <PHONE>")
    )


def test_redact_md5_is_text_digest(spark):
    import hashlib

    df = _docs(spark, [(0, "no pii here")])
    r = ta.redact_pii(df).collect()[0]
    assert r["redacted_md5"] == hashlib.md5(b"no pii here").hexdigest()
