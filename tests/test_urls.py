"""URL canonicalization / domain extraction / per-domain caps."""

from pyspark.sql import functions as F

from gdal_spark.text.urls import (
    normalize_url,
    registrable_domain,
    url_dedup_domain_cap,
)


def _norm(spark, urls):
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    return [
        r["n"] for r in df.select(normalize_url(F.col("url")).alias("n"))
        .collect()
    ]


def test_normalization_rules(spark):
    cases = {
        # scheme+host lowering, www strip, default port, fragment
        "HTTP://WWW.ExAmple.COM:80/a#frag": "http://example.com/a",
        "https://Site.ORG:443/x": "https://site.org/x",
        # non-default port kept
        "https://site.org:8080/x": "https://site.org:8080/x",
        # tracking params dropped, rest sorted, '?' dropped when empty
        "http://h.com/p?utm_source=x&b=2&a=1": "http://h.com/p?a=1&b=2",
        "http://h.com/p?utm_campaign=x&gclid=1&fbclid=2": "http://h.com/p",
        # empty path -> '/'
        "http://h.com?a=1": "http://h.com/?a=1",
    }
    got = _norm(spark, list(cases))
    assert got == list(cases.values())


def test_registrable_domain_public_suffix(spark):
    df = spark.createDataFrame(
        [
            ("http://a.b.example.co.uk/x", "example.co.uk"),
            ("http://deep.sub.site.com/x", "site.com"),
            ("http://plain.org/", "plain.org"),
            ("http://x.com.au/", "x.com.au"),
        ],
        "u string, want string",
    )
    rows = df.select(
        registrable_domain(F.col("u")).alias("got"), "want"
    ).collect()
    for r in rows:
        assert r["got"] == r["want"]


def test_dedup_keeps_lowest_id_and_caps_domains(spark):
    rows = [
        (0, "http://WWW.d.com/p?utm_source=1"),
        (1, "http://d.com:80/p"),          # same canonical as id 0
        (2, "http://d.com/q"),
        (3, "http://d.com/r"),
        (4, "http://d.com/s"),             # 4th distinct d.com doc
        (5, "http://other.org/"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    kept = url_dedup_domain_cap(df, max_per_domain=3).collect()
    ids = sorted(r["doc_id"] for r in kept)
    # id 1 deduped away (canonical twin of 0); id 4 capped away
    assert ids == [0, 2, 3, 5]
    by_id = {r["doc_id"]: r for r in kept}
    assert by_id[0]["url_norm"] == "http://d.com/p"
    assert by_id[0]["domain"] == "d.com"
