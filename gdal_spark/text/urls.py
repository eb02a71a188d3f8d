"""URL canonicalization + domain-level corpus controls.

The web-crawl half of a training-data pipeline: canonicalize document
URLs (the C4 / RefinedWeb dedup key), extract the registrable domain
(public-suffix aware), and cap documents per domain (domain-balanced
corpora; RefinedWeb §3.2 dedups then caps per-site contributions).

Everything is pure Column math — string/regexp/array built-ins, zero
UDFs, zero shuffle for normalization; the only exchanges are the
dedup groupBy (normalized-url key) and the per-domain cap window,
both on uniformly-hashed string keys.

Normalization rules (the conservative RFC 3986 §6 set every crawler
applies):
- scheme and host lowercased;
- leading ``www.`` stripped from the host;
- default ports dropped (``:80`` http, ``:443`` https);
- fragment dropped;
- tracking params dropped (``utm_*``, ``fbclid``, ``gclid``);
- remaining query params sorted by full ``k=v`` text; empty query
  drops the ``?``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["normalize_url", "registrable_domain", "url_dedup_domain_cap",
           "TWO_LEVEL_SUFFIXES", "TRACKING_PREFIXES"]

# minimal public-suffix data (the full list is a data file; these are
# the two-level suffixes the synthetic fleet uses)
TWO_LEVEL_SUFFIXES = ("co.uk", "ac.uk", "com.au", "co.jp")
TRACKING_PREFIXES = ("utm_", "fbclid", "gclid")


def _split_url(url: Column):
    scheme = F.lower(F.regexp_extract(url, r"^([A-Za-z][A-Za-z0-9+.-]*):", 1))
    rest = F.regexp_extract(url, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1)
    hostport = F.lower(rest)
    path = F.regexp_extract(url, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    query = F.regexp_extract(url, r"\?([^#]*)", 1)
    return scheme, hostport, path, query


def normalize_url(url: Column) -> Column:
    scheme, hostport, path, query = _split_url(url)
    host = F.regexp_replace(hostport, r"^www\.", "")
    host = F.when(scheme == "http",
                  F.regexp_replace(host, r":80$", "")).otherwise(host)
    host = F.when(scheme == "https",
                  F.regexp_replace(host, r":443$", "")).otherwise(host)
    parts = F.filter(
        F.split(query, "&"),
        lambda p: (p != "")
        & ~F.exists(
            F.array(*[F.lit(t) for t in TRACKING_PREFIXES]),
            lambda t: p.startswith(t),
        ),
    )
    qs = F.array_join(F.array_sort(parts), "&")
    norm_path = F.when(path == "", F.lit("/")).otherwise(path)
    return F.concat(
        scheme, F.lit("://"), host, norm_path,
        F.when(qs == "", F.lit("")).otherwise(F.concat(F.lit("?"), qs)),
    )


def registrable_domain(url_norm: Column) -> Column:
    """eTLD+1 of an already-normalized URL."""
    host = F.regexp_extract(url_norm, r"^[a-z][a-z0-9+.-]*://([^/:?#]*)", 1)
    labels = F.split(host, r"\.")
    n = F.size(labels)
    last2 = F.concat_ws(".", F.element_at(labels, -2), F.element_at(labels, -1))
    two_level = F.array(*[F.lit(s) for s in TWO_LEVEL_SUFFIXES])
    return F.when(
        F.array_contains(two_level, last2) & (n >= 3),
        F.concat_ws(".", F.element_at(labels, -3), last2),
    ).otherwise(last2)


def url_dedup_domain_cap(
    df: DataFrame,
    url_col: str = "url",
    id_col: str = "doc_id",
    max_per_domain: int | None = None,
) -> DataFrame:
    """Canonicalize -> exact-dedup on the normalized URL (keep the
    lowest id, the crawler's first-fetch-wins rule) -> optionally cap
    per registrable domain in id order."""
    from pyspark.sql import Window

    out = df.withColumn("url_norm", normalize_url(F.col(url_col)))
    out = out.withColumn("domain", registrable_domain(F.col("url_norm")))
    w = Window.partitionBy("url_norm").orderBy(F.col(id_col))
    out = (
        out.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )
    if max_per_domain is not None:
        wd = Window.partitionBy("domain").orderBy(F.col(id_col))
        out = (
            out.withColumn("_rd", F.row_number().over(wd))
            .where(F.col("_rd") <= max_per_domain)
            .drop("_rd")
        )
    return out
