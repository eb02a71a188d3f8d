"""Deduplication operators: exact (content hash), MinHash+LSH
near-dup, SimHash near-dup.

Shapes for 10^12-row scale:
- exact: md5 groupBy — one shuffle on the digest, metadata-light.
- MinHash+LSH: signatures are per-row Column math (no shuffle);
  candidates come from an equi-join on (band, bucket) — never a
  cross join; verification joins token sets only for candidates.
- SimHash: 64-bit signatures (4 x 16-bit band columns; 64 per-bit
  streams from rehashed token hashes) with a banded equi-join and a
  pigeonhole guarantee: any pair at hamming distance <= 3 shares at
  least one intact band -> banded recall is exactly 100% and the
  oracle (brute-force in SQL) must match row-for-row. 16-bit bands
  keep buckets ~N/2^16-sized, so the within-bucket join stays linear
  at corpus scale (the 16-bit legacy simhash() is kept for parity).

Everything is expressible in DuckDB SQL (hashing.py constants are
inlined), so every operator is value-verified, not just row-counted.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from gdal_spark.text import hashing as H


def with_hashes(df: DataFrame, text_col: str = "text") -> DataFrame:
    """tokens, per-token hashes (ordered), distinct-token hashes."""
    return (
        df.withColumn("toks", F.split(F.col(text_col), " "))
        .withColumn("hs", F.expr(H.spark_token_hashes("toks")))
        .withColumn("dtoks", F.array_distinct("toks"))
        .withColumn("dhs", F.expr(H.spark_token_hashes("dtoks")))
    )


def exact_dups(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Content-hash dedup: md5 digest + copy count per digest."""
    d = df.withColumn("text_md5", F.md5(F.col(text_col)))
    counts = d.groupBy("text_md5").agg(F.count(F.lit(1)).alias("n_copies"))
    return d.join(counts, "text_md5").select("doc_id", "text_md5", "n_copies")


def minhash_signature(df: DataFrame) -> DataFrame:
    """N_PERM minhash columns mh0..mh15 over the distinct-token set."""
    out = with_hashes(df)
    for j in range(H.N_PERM):
        out = out.withColumn(f"mh{j}", F.expr(H.spark_minhash("dhs", j)))
    return out


def lsh_band_buckets(sig: DataFrame) -> DataFrame:
    """(doc_id, band, bucket): bucket packs the band's 2 minhashes."""
    parts = []
    for b in range(H.BANDS):
        j0, j1 = 2 * b, 2 * b + 1
        parts.append(
            sig.select(
                "doc_id",
                F.lit(b).alias("band"),
                (F.col(f"mh{j0}") * F.lit(H.MOD) + F.col(f"mh{j1}")).alias("bucket"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def minhash_lsh_pairs(df: DataFrame) -> DataFrame:
    """Near-dup pairs: LSH candidates (shared band bucket) verified by
    Jaccard >= 0.5 (integer test 2*|A∩B| >= |A∪B|) over the
    FIXED-WIDTH token-hash sets (array_distinct of the per-token
    int64 hashes) rather than the raw token strings — at corpus scale
    the verify join then ships 8-byte values instead of variable-
    width text (hash collisions merge tokens identically in both
    engines, so the oracle stays value-exact).
    Returns (doc_a, doc_b, j_milli)."""
    sig = minhash_signature(df).withColumn("hset", F.array_distinct("dhs"))
    buckets = lsh_band_buckets(sig)
    a = buckets.alias("a")
    b = buckets.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .dropDuplicates(["doc_a", "doc_b"])
    )
    toks = sig.select("doc_id", "hset")
    pairs = (
        cand.join(toks.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("hset", "ha"), "doc_a")
        .join(toks.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("hset", "hb"), "doc_b")
        .withColumn("inter", F.size(F.array_intersect("ha", "hb")).cast("long"))
        .withColumn("uni", (F.size("ha") + F.size("hb")).cast("long") - F.col("inter"))
        .where(F.lit(2) * F.col("inter") >= F.col("uni"))
    )
    return pairs.select(
        "doc_a",
        "doc_b",
        F.floor(F.lit(1000.0) * F.col("inter") / F.col("uni")).cast("long").alias("j_milli"),
    )


NGRAM_N = 3  # word-shingle width for the n-gram Jaccard pipeline


def ngram_jaccard_pairs(df: DataFrame, n: int = NGRAM_N,
                        text_col: str = "text") -> DataFrame:
    """Word n-gram (shingle) near-dup pairs — the classic
    shingle->minhash->band->bucket-join pipeline, order-sensitive
    where the token-set pipeline (minhash_lsh_pairs) is not:
    reordered documents share tokens but few shingles.

    Candidates come from MinHash(16)+LSH(8x2) over the DISTINCT
    shingle-hash sets; the verify join tests exact shingle-set
    Jaccard >= 0.5 in integer math.  Scale shape: one (band, bucket)
    equi-join over int64 keys + one hash-set verify join — identical
    to minhash_lsh_pairs, which survives 100 TB."""
    d = (
        df.withColumn("toks", F.split(F.col(text_col), " "))
        .withColumn("hs", F.expr(H.spark_token_hashes("toks")))
        .withColumn("shs", F.expr(H.spark_shingle_hashes("hs", n)))
        .withColumn("hset", F.array_distinct("shs"))
    )
    sig = d
    for j in range(H.N_PERM):
        sig = sig.withColumn(f"mh{j}", F.expr(H.spark_minhash("hset", j)))
    buckets = lsh_band_buckets(sig)
    a = buckets.alias("a")
    b = buckets.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .dropDuplicates(["doc_a", "doc_b"])
    )
    toks = sig.select("doc_id", "hset")
    pairs = (
        cand.join(
            toks.withColumnRenamed("doc_id", "doc_a")
            .withColumnRenamed("hset", "ha"), "doc_a")
        .join(
            toks.withColumnRenamed("doc_id", "doc_b")
            .withColumnRenamed("hset", "hb"), "doc_b")
        .withColumn("inter", F.size(F.array_intersect("ha", "hb")).cast("long"))
        .withColumn(
            "uni",
            (F.size("ha") + F.size("hb")).cast("long") - F.col("inter"),
        )
        .where(F.lit(2) * F.col("inter") >= F.col("uni"))
    )
    return pairs.select(
        "doc_a",
        "doc_b",
        F.floor(F.lit(1000.0) * F.col("inter") / F.col("uni"))
        .cast("long").alias("j_milli"),
    )


def sql_ngram_jaccard_pairs(src: str = "documents",
                            n: int = NGRAM_N) -> str:
    mh_cols = ", ".join(
        f"{H.duck_minhash('hset', j)} AS mh{j}" for j in range(H.N_PERM)
    )
    band_rows = " UNION ALL ".join(
        f"SELECT doc_id, {b} AS band, mh{2*b} * {H.MOD} + mh{2*b+1} AS bucket FROM sig"
        for b in range(H.BANDS)
    )
    return f"""
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM {src}
),
hh AS (
  SELECT doc_id, {H.duck_token_hashes('toks')} AS hs FROM t
),
sh AS (
  SELECT doc_id, list_distinct({H.duck_shingle_hashes('hs', n)}) AS hset
  FROM hh
),
sig AS (SELECT doc_id, hset, {mh_cols} FROM sh),
buckets AS ({band_rows}),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM buckets a JOIN buckets b
    ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
),
j AS (
  SELECT c.doc_a, c.doc_b,
    cast(len(list_intersect(sa.hset, sb.hset)) as bigint) AS inter,
    cast(len(sa.hset) + len(sb.hset) as bigint)
      - cast(len(list_intersect(sa.hset, sb.hset)) as bigint) AS uni
  FROM cand c
  JOIN sig sa ON sa.doc_id = c.doc_a
  JOIN sig sb ON sb.doc_id = c.doc_b
)
SELECT doc_a, doc_b,
       cast(floor(1000.0 * inter / uni) as bigint) AS j_milli
FROM j WHERE 2 * inter >= uni
"""


def simhash(df: DataFrame) -> DataFrame:
    """16-bit SimHash over per-token hashes (with multiplicity):
    bit k set iff sum over tokens of (2*bit_k(h) - 1) >= 0."""
    out = with_hashes(df)
    terms = []
    for k in range(H.SIMHASH_BITS):
        s = f"aggregate(hs, cast(0 as bigint), (acc, x) -> acc + (2 * ((x >> {k}) & 1) - 1))"
        terms.append(f"IF({s} >= 0, cast({1 << k} as bigint), cast(0 as bigint))")
    return out.select(
        "doc_id", F.expr(" + ".join(terms)).alias("simhash")
    )


def simhash64(df: DataFrame) -> DataFrame:
    """64-bit SimHash as 4 x 16-bit band columns (sh0..sh3) — the
    scale variant: 16-bit signatures collapse at corpus scale (each
    band bucket holds ~N/2^16 docs and the within-bucket join goes
    quadratic); 64 bits with 16-bit bands keeps buckets sparse and
    the 4-band equi-join pigeonhole-exact for hamming <= 3.

    Token hashes stay Column math (shared with minhash); the 64 bit
    streams (parity of permutation k of each token hash, summed as
    +-1 votes) run as ONE Arrow-batched numpy pass — the Catalyst
    `aggregate()` form costs 64 array traversals per row and was the
    bench's hottest regression."""
    a_c, b_c = zip(*H.perm_constants(H.SIMHASH64_BITS))
    a_arr = np.asarray(a_c, dtype=np.int64)[None, :]
    b_arr = np.asarray(b_c, dtype=np.int64)[None, :]
    weights = (1 << np.arange(H.SIMHASH64_BAND_BITS, dtype=np.int64))

    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def bands(hs: pd.Series) -> pd.Series:
        out = []
        for arr in hs:
            h = np.asarray(arr, dtype=np.int64)[:, None]
            votes = 2 * (((a_arr * h + b_arr) % H.MOD) % 2) - 1  # (T, 64)
            bits = votes.sum(axis=0) >= 0
            bb = bits.reshape(H.SIMHASH64_BANDS, H.SIMHASH64_BAND_BITS)
            out.append((bb * weights).sum(axis=1).astype(np.int32).tolist())
        return pd.Series(out)

    out = with_hashes(df).withColumn("_sh", bands(F.col("hs")))
    cols = [
        F.element_at("_sh", b + 1).alias(f"sh{b}")
        for b in range(H.SIMHASH64_BANDS)
    ]
    return out.select("doc_id", *cols)


def simhash_pairs(df: DataFrame, max_dist: int = 3) -> DataFrame:
    """All pairs at 64-bit simhash hamming distance <= max_dist via
    the 4x16-bit band equi-join (exact recall for max_dist <= 3 by
    pigeonhole: 4 bands, <= 3 differing bits -> one band intact)."""
    sh = simhash64(df)
    parts = [
        sh.select(
            "doc_id", "sh0", "sh1", "sh2", "sh3",
            F.lit(b).alias("band"), F.col(f"sh{b}").alias("bucket"),
        )
        for b in range(H.SIMHASH64_BANDS)
    ]
    buckets = parts[0]
    for p in parts[1:]:
        buckets = buckets.unionByName(p)
    a = buckets.alias("a")
    b = buckets.alias("b")
    hdist = " + ".join(
        f"bit_count(a.sh{i} ^ b.sh{i})" for i in range(H.SIMHASH64_BANDS)
    )
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.expr(hdist).cast("int").alias("hdist"),
        )
        .where(F.col("hdist") <= max_dist)
        .dropDuplicates(["doc_a", "doc_b"])
    )


def cluster_near_dups(df: DataFrame, pairs: DataFrame | None = None) -> DataFrame:
    """Near-dup CLUSTERS: connected components over the verified
    MinHash pair graph (the dedup decision unit — keep one doc per
    cluster), fully distributed: iterative min-label propagation
    joins over the pair edge list (operators/graph.py) — nothing is
    ever collected to the driver, so this survives a 10^12-doc
    corpus where even the doc-id list is not driver-sized. Docs in
    no pair attach as singletons via a left join.
    Returns (doc_id, cluster_id, cluster_size) where cluster_id is
    the minimum doc_id of the cluster (stable, shuffle-free id)."""
    if pairs is None:
        pairs = minhash_lsh_pairs(df)
    from gdal_spark.operators.graph import connected_components

    roots = connected_components(pairs, src="doc_a", dst="doc_b")
    labeled = (
        df.select("doc_id")
        .join(roots, F.col("doc_id") == F.col("id"), "left")
        .select(
            "doc_id", F.coalesce("root", "doc_id").alias("cluster_id")
        )
    )
    sizes = labeled.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("cluster_size")
    )
    return labeled.join(sizes, "cluster_id").select(
        "doc_id",
        F.col("cluster_id").cast("long"),
        F.col("cluster_size").cast("long"),
    )


# ---------------------------------------------------------------------------
# DuckDB twins
# ---------------------------------------------------------------------------

def _duck_sig_cte(src: str) -> str:
    mh_cols = ", ".join(
        f"{H.duck_minhash('dhs', j)} AS mh{j}" for j in range(H.N_PERM)
    )
    return f"""
t AS (
  SELECT doc_id, list_distinct(string_split(text, ' ')) AS dtoks FROM {src}
),
hh AS (
  SELECT doc_id, dtoks, {H.duck_token_hashes('dtoks')} AS dhs FROM t
),
sig AS (
  SELECT doc_id, dtoks, {mh_cols} FROM hh
)"""


def sql_exact_dups(src: str = "documents") -> str:
    return f"""
WITH d AS (SELECT doc_id, md5(text) AS text_md5 FROM {src})
SELECT d.doc_id, d.text_md5, c.n_copies
FROM d JOIN (
  SELECT text_md5, count(*) AS n_copies FROM d GROUP BY text_md5
) c USING (text_md5)
"""


def sql_minhash_lsh_pairs(src: str = "documents") -> str:
    band_rows = " UNION ALL ".join(
        f"SELECT doc_id, {b} AS band, mh{2*b} * {H.MOD} + mh{2*b+1} AS bucket FROM sig"
        for b in range(H.BANDS)
    )
    return f"""
WITH {_duck_sig_cte(src)},
hsets AS (SELECT doc_id, list_distinct(dhs) AS hset FROM hh),
buckets AS ({band_rows}),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM buckets a JOIN buckets b
    ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
),
j AS (
  SELECT c.doc_a, c.doc_b,
    cast(len(list_intersect(sa.hset, sb.hset)) as bigint) AS inter,
    cast(len(sa.hset) + len(sb.hset) as bigint)
      - cast(len(list_intersect(sa.hset, sb.hset)) as bigint) AS uni
  FROM cand c
  JOIN hsets sa ON sa.doc_id = c.doc_a
  JOIN hsets sb ON sb.doc_id = c.doc_b
)
SELECT doc_a, doc_b,
       cast(floor(1000.0 * inter / uni) as bigint) AS j_milli
FROM j WHERE 2 * inter >= uni
"""


def sql_cluster_near_dups(src: str = "documents") -> str:
    """DuckDB twin of cluster_near_dups: connected components over the
    verified MinHash pair graph via a recursive reachability CTE
    (per-node min reachable id == the Spark min-label fixpoint)."""
    return f"""
WITH RECURSIVE pairs AS ({sql_minhash_lsh_pairs(src)}),
edges AS (
  SELECT doc_a AS a, doc_b AS b FROM pairs
  UNION
  SELECT doc_b AS a, doc_a AS b FROM pairs
),
walk(id, reach) AS (
  SELECT a, a FROM (SELECT DISTINCT a FROM edges)
  UNION
  SELECT w.id, e.b FROM walk w JOIN edges e ON e.a = w.reach
),
roots AS (SELECT id, min(reach) AS root FROM walk GROUP BY id),
labeled AS (
  SELECT d.doc_id, coalesce(r.root, d.doc_id) AS cluster_id
  FROM {src} d LEFT JOIN roots r ON r.id = d.doc_id
),
sizes AS (
  SELECT cluster_id, count(*) AS cluster_size FROM labeled GROUP BY cluster_id
)
SELECT l.doc_id, cast(l.cluster_id as bigint) AS cluster_id,
       cast(s.cluster_size as bigint) AS cluster_size
FROM labeled l JOIN sizes s USING (cluster_id)
"""


def _duck_simhash_cte(src: str) -> str:
    terms = []
    for k in range(H.SIMHASH_BITS):
        s = f"list_sum(list_transform(hs, x -> 2 * ((x >> {k}) & 1) - 1))"
        terms.append(f"CASE WHEN cast({s} as bigint) >= 0 THEN cast({1 << k} as bigint) ELSE cast(0 as bigint) END")
    return f"""
t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM {src}),
hh AS (SELECT doc_id, {H.duck_token_hashes('toks')} AS hs FROM t),
sh AS (SELECT doc_id, {' + '.join(terms)} AS simhash FROM hh)"""


def sql_simhash(src: str = "documents") -> str:
    return f"WITH {_duck_simhash_cte(src)} SELECT doc_id, simhash FROM sh"


def _duck_sim64_cte(src: str) -> str:
    bands = []
    for b in range(H.SIMHASH64_BANDS):
        terms = []
        for j in range(H.SIMHASH64_BAND_BITS):
            a, c = H.perm_constants(H.SIMHASH64_BITS)[16 * b + j]
            s = (
                f"cast(list_sum(list_transform(hs, "
                f"x -> 2 * ((({a} * x + {c}) % {H.MOD}) % 2) - 1)) as bigint)"
            )
            terms.append(f"CASE WHEN {s} >= 0 THEN {1 << j} ELSE 0 END")
        bands.append("cast(" + " + ".join(terms) + f" as int) AS sh{b}")
    return f"""
t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM {src}),
hh AS (SELECT doc_id, {H.duck_token_hashes('toks')} AS hs FROM t),
sh64 AS (SELECT doc_id, {', '.join(bands)} FROM hh)"""


def sql_simhash64(src: str = "documents") -> str:
    return f"WITH {_duck_sim64_cte(src)} SELECT doc_id, sh0, sh1, sh2, sh3 FROM sh64"


def sql_simhash_pairs(src: str = "documents", max_dist: int = 3) -> str:
    hdist = " + ".join(
        f"bit_count(xor(a.sh{i}, b.sh{i}))" for i in range(H.SIMHASH64_BANDS)
    )
    return f"""
WITH {_duck_sim64_cte(src)}
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       cast({hdist} as int) AS hdist
FROM sh64 a JOIN sh64 b ON a.doc_id < b.doc_id
WHERE {hdist} <= {max_dist}
"""


# --- exact-substring duplicate spans ----------------------------------------

SPAN_N = 8  # words per shingle for duplicate-span detection


def duplicate_spans(df: DataFrame, n: int = SPAN_N,
                    text_col: str = "text") -> DataFrame:
    """Exact-substring dedup: maximal token spans whose every length-n
    word shingle occurs >= 2 times in the corpus (the span-level exact
    dedup of Lee et al., "Deduplicating Training Data Makes Language
    Models Better" — re-expressed relationally instead of via a
    suffix array).

    Pipeline: ordered token hashes -> positional shingle hashes
    (posexplode) -> one groupBy(sh) marking duplicated shingles ->
    LEFT SEMI join back (skew-tolerant: hot boilerplate shingles
    never fan out) -> per-doc gaps-and-islands (pos - row_number)
    merging adjacent duplicate shingles into maximal spans.

    Scale shape: two shuffles on int64 keys (sh groupBy + semi join)
    plus one bounded per-doc window — no corpus-sized driver state,
    no suffix array.  Returns (doc_id, start_tok, end_tok inclusive,
    n_shingles).
    """
    from pyspark.sql import Window

    d = (
        df.withColumn("toks", F.split(F.col(text_col), " "))
        .withColumn("hs", F.expr(H.spark_token_hashes("toks")))
        .withColumn("shs", F.expr(H.spark_shingle_hashes("hs", n)))
    )
    occ = d.select("doc_id", F.posexplode("shs").alias("pos", "sh"))
    dup_sh = (
        occ.groupBy("sh")
        .agg(F.count(F.lit(1)).alias("n_occ"))
        .where(F.col("n_occ") >= 2)
        .select("sh")
    )
    dup_occ = occ.join(dup_sh, "sh", "left_semi")
    w = Window.partitionBy("doc_id").orderBy("pos")
    isl = dup_occ.withColumn(
        "grp", F.col("pos") - F.row_number().over(w)
    )
    return (
        isl.groupBy("doc_id", "grp")
        .agg(
            F.min("pos").cast("long").alias("start_tok"),
            (F.max("pos") + F.lit(n - 1)).cast("long").alias("end_tok"),
            F.count(F.lit(1)).cast("long").alias("n_shingles"),
        )
        .select("doc_id", "start_tok", "end_tok", "n_shingles")
    )


def sql_duplicate_spans(src: str = "documents", n: int = SPAN_N) -> str:
    """DuckDB twin of duplicate_spans (0-based positions to match
    posexplode; scalar generate_series is legal, the lateral
    table-function form is not — positions come from a constant
    range cross join)."""
    return f"""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM {src}),
hh AS (SELECT doc_id, {H.duck_token_hashes('toks')} AS hs FROM t),
sh AS (SELECT doc_id, {H.duck_shingle_hashes('hs', n)} AS shs FROM hh),
occ AS (
  SELECT s.doc_id, r.i AS pos, s.shs[r.i + 1] AS sh
  FROM sh s JOIN range(0, 4096) r(i) ON r.i < len(s.shs)
),
dup AS (SELECT sh FROM occ GROUP BY sh HAVING count(*) >= 2),
docc AS (SELECT o.doc_id, o.pos FROM occ o JOIN dup d ON o.sh = d.sh),
isl AS (
  SELECT doc_id, pos,
    pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
  FROM docc
)
SELECT doc_id, cast(min(pos) as bigint) AS start_tok,
       cast(max(pos) + {n - 1} as bigint) AS end_tok,
       cast(count(*) as bigint) AS n_shingles
FROM isl GROUP BY doc_id, grp
"""


def decontaminate(train: DataFrame, test: DataFrame, n: int = SPAN_N,
                  text_col: str = "text") -> DataFrame:
    """Benchmark decontamination: flag training documents that share
    ANY length-n word shingle with a held-out test set (the standard
    n-gram-overlap leakage check run before LLM pretraining).

    Scale shape: test-set shingles are a DISTINCT int64 set that is
    tiny next to the corpus -> broadcast-friendly LEFT SEMI join from
    the train shingle stream; one groupBy(doc_id) counts contaminated
    shingles.  No corpus-sized state anywhere.

    Returns (doc_id, n_contaminated, n_shingles, contaminated)."""
    def shingles(df):
        return (
            df.withColumn("toks", F.split(F.col(text_col), " "))
            .withColumn("hs", F.expr(H.spark_token_hashes("toks")))
            .withColumn("shs", F.expr(H.spark_shingle_hashes("hs", n)))
        )

    test_sh = (
        shingles(test)
        .select(F.explode("shs").alias("sh"))
        .distinct()
    )
    tr = shingles(train).select(
        "doc_id", F.size("shs").alias("n_shingles"),
        F.posexplode("shs").alias("pos", "sh"),
    )
    hits = (
        tr.join(F.broadcast(test_sh), "sh", "left_semi")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_contaminated"))
    )
    base = shingles(train).select(
        "doc_id", F.size("shs").cast("long").alias("n_shingles")
    )
    return base.join(hits, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n_contaminated", F.lit(0)).cast("long")
          .alias("n_contaminated"),
        "n_shingles",
        (F.coalesce("n_contaminated", F.lit(0)) > 0).cast("int")
          .alias("contaminated"),
    )


def sql_decontaminate(train_src: str, test_src: str,
                      n: int = SPAN_N) -> str:
    """DuckDB twin of decontaminate (test_src is a full SELECT)."""
    def sh_cte(alias, src):
        return f"""
{alias}_t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM {src}),
{alias}_h AS (SELECT doc_id, {H.duck_token_hashes('toks')} AS hs
              FROM {alias}_t),
{alias}_s AS (SELECT doc_id, {H.duck_shingle_hashes('hs', n)} AS shs
              FROM {alias}_h)"""

    return f"""
WITH {sh_cte('tr', train_src)},
{sh_cte('te', test_src)},
tes AS (
  SELECT DISTINCT s.shs[r.i + 1] AS sh
  FROM te_s s JOIN range(0, 4096) r(i) ON r.i < len(s.shs)
),
occ AS (
  SELECT s.doc_id, s.shs[r.i + 1] AS sh
  FROM tr_s s JOIN range(0, 4096) r(i) ON r.i < len(s.shs)
),
hits AS (
  SELECT o.doc_id, count(*) AS n_contaminated
  FROM occ o JOIN tes t ON o.sh = t.sh
  GROUP BY o.doc_id
)
SELECT b.doc_id,
  cast(coalesce(h.n_contaminated, 0) as bigint) AS n_contaminated,
  cast(len(b.shs) as bigint) AS n_shingles,
  cast(CASE WHEN coalesce(h.n_contaminated, 0) > 0 THEN 1 ELSE 0 END
       as int) AS contaminated
FROM tr_s b LEFT JOIN hits h ON h.doc_id = b.doc_id
"""
