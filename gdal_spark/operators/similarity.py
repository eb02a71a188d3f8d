"""Similarity search over an embedding column (array<float>).

- brute-force cosine top-k: the correctness baseline — broadcast the
  query set, JVM-side zip_with/aggregate dot products (no Python in
  the hot path), window re-rank.
- sign-LSH bucketed top-k: the scale path — a deterministic
  axis-aligned hyperplane bucket (sign bits of fixed dims) turns the
  candidate step into an equi-join; ring expansion (hamming-1
  buckets) trades recall for cost.
- per-label centroids: elementwise vector mean via posexplode.

At 10^12 rows the brute-force path is O(Q x N) and only valid for
small Q; the LSH path shuffles each row once on its bucket key.
All three have DuckDB SQL twins (value-level oracles).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

LSH_DIMS = (0, 8, 16, 24, 32, 40)  # sign-bit dims -> 64 buckets

_DOT = (
    "aggregate(zip_with({a}, {b}, (x, y) -> cast(x as double) * cast(y as double)), "
    "cast(0.0 as double), (acc, v) -> acc + v)"
)
_NORM = (
    "sqrt(aggregate({a}, cast(0.0 as double), "
    "(acc, x) -> acc + cast(x as double) * cast(x as double)))"
)


def with_norm(df: DataFrame, vec: str = "embedding") -> DataFrame:
    return df.withColumn("norm", F.expr(_NORM.format(a=vec)))


def lsh_bucket(vec: str = "embedding") -> F.Column:
    """Deterministic sign-bit bucket over LSH_DIMS (element_at is
    1-indexed)."""
    # try_element_at + coalesce(-1): a missing dim yields bit 0, the
    # same as DuckDB's NULL >= 0 -> CASE ELSE 0
    terms = [
        f"IF(coalesce(try_element_at({vec}, {d + 1}), cast(-1.0 as double)) >= 0, {1 << i}, 0)"
        for i, d in enumerate(LSH_DIMS)
    ]
    return F.expr(" + ".join(terms)).cast("int")


def cosine_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int,
    bucketed: bool = False,
    ring: int = 0,
) -> DataFrame:
    """Top-k cosine neighbours of each query vector (excluding self).

    `queries` needs (query_id, qv). bucketed=True restricts candidates
    to the query's sign-LSH bucket (approximate; exact within-bucket);
    ring=r additionally probes buckets within r bit flips
    (multi-probe LSH — recall rises, candidate cost grows ~6^r/r!).
    """
    base = with_norm(emb)
    q = queries.withColumn("qnorm", F.expr(_NORM.format(a="qv")))
    if bucketed:
        base = base.withColumn("bucket", lsh_bucket("embedding"))
        q = q.withColumn("qbucket", lsh_bucket("qv"))
        if ring == 0:
            cond = F.col("bucket") == F.col("qbucket")
        else:
            # hamming-ring expansion: probe buckets within `ring`
            # sign-bit flips of the query's bucket (multi-probe LSH)
            cond = F.expr(f"bit_count(bucket ^ qbucket) <= {ring}")
        joined = base.join(
            F.broadcast(q), cond & (F.col("vec_id") != F.col("query_id"))
        )
    else:
        joined = base.join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))
    sim = F.expr(_DOT.format(a="embedding", b="qv")) / (F.col("norm") * F.col("qnorm"))
    scored = joined.withColumn("sim", sim)
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "query_id",
            F.col("rank").cast("int").alias("rank"),
            "vec_id",
            F.floor(F.col("sim") * 10000).cast("long").alias("sim_e4"),
        )
    )


def label_centroids(emb: DataFrame) -> DataFrame:
    """Elementwise mean vector per label -> (label, dim, c_e6)."""
    ex = emb.select(
        "label", F.posexplode("embedding").alias("dim", "v")
    )
    return (
        ex.groupBy("label", "dim")
        .agg(F.avg(F.col("v").cast("double")).alias("c"))
        .select(
            "label",
            F.col("dim").cast("int"),
            F.floor(F.col("c") * 1e6).cast("long").alias("c_e6"),
        )
    )


# ---------------------------------------------------------------------------
# DuckDB twins
# ---------------------------------------------------------------------------

_DUCK_DOT = (
    "list_sum(list_transform(list_zip({a}, {b}), "
    "p -> cast(p[1] as double) * cast(p[2] as double)))"
)
_DUCK_NORM = (
    "sqrt(list_sum(list_transform({a}, x -> cast(x as double) * cast(x as double))))"
)


def duck_lsh_bucket(vec: str) -> str:
    terms = [
        f"CASE WHEN {vec}[{d + 1}] >= 0 THEN {1 << i} ELSE 0 END"
        for i, d in enumerate(LSH_DIMS)
    ]
    return "cast(" + " + ".join(terms) + " as int)"


def sql_cosine_topk(query_filter: str, k: int, bucketed: bool = False,
                    ring: int = 0, src: str = "embeddings") -> str:
    dot = _DUCK_DOT.format(a="e.embedding", b="q.embedding")
    ne = _DUCK_NORM.format(a="e.embedding")
    nq = _DUCK_NORM.format(a="q.embedding")
    if bucketed and ring > 0:
        bucket_cond = (
            f" AND bit_count(cast(xor({duck_lsh_bucket('e.embedding')}, "
            f"{duck_lsh_bucket('q.embedding')}) as bigint)) <= {ring}"
        )
    elif bucketed:
        bucket_cond = (
            f" AND {duck_lsh_bucket('e.embedding')} = {duck_lsh_bucket('q.embedding')}"
        )
    else:
        bucket_cond = ""
    return f"""
WITH q AS (SELECT vec_id AS query_id, embedding FROM {src} WHERE {query_filter}),
d AS (
  SELECT q.query_id, e.vec_id,
    ({dot}) / (({ne}) * ({nq})) AS sim
  FROM {src} e JOIN q ON e.vec_id <> q.query_id{bucket_cond}
),
r AS (
  SELECT query_id, vec_id, sim,
    row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, vec_id ASC) AS rnk
  FROM d
)
SELECT query_id, cast(rnk as int) AS rank, vec_id,
       cast(floor(sim * 10000) as bigint) AS sim_e4
FROM r WHERE rnk <= {k}
"""


def sql_label_centroids(src: str = "embeddings") -> str:
    # DuckDB 1.0 has no WITH ORDINALITY: index via a dim-range join
    return f"""
SELECT label, cast(d.dim as int) AS dim,
       cast(floor(avg(cast(embedding[d.dim + 1] as double)) * 1e6) as bigint) AS c_e6
FROM {src}, range(0, 4096) AS d(dim)
WHERE d.dim < len(embedding)
GROUP BY 1, 2
"""
