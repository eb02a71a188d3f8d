"""Text analysis / dedup / similarity operator tests."""

import pytest
from pyspark.sql import functions as F

from gdal_spark.text import analysis, dedup, hashing


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "the fast big table"),
        (1, "the fast big table"),            # exact dup of 0
        (2, "the fast big table scan"),       # near dup of 0/1
        (3, "window merge batch join query"),
        (4, "stream data filter row sort"),
        (5, "a a a a a a"),                   # low quality (repetition)
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_token_stats(docs):
    got = {r["doc_id"]: r.asDict() for r in analysis.token_stats(docs).collect()}
    assert got[0]["n_tokens"] == 4
    assert got[0]["n_distinct"] == 4
    assert got[5]["n_tokens"] == 6
    assert got[5]["n_distinct"] == 1
    # identical text -> identical fingerprint; different -> different
    assert got[0]["fingerprint"] == got[1]["fingerprint"]
    assert got[0]["fingerprint"] != got[2]["fingerprint"]
    # repetitive doc scores below a diverse doc
    assert got[5]["quality_milli"] < got[4]["quality_milli"]


def test_lang_id_profiles(docs):
    got = {r["doc_id"]: r["pred_lang"] for r in analysis.lang_id(docs).collect()}
    assert got[0] == "en"   # the/fast/big are en markers
    assert got[3] == "zh"   # window/merge/batch/join
    assert got[4] == "es"   # data/stream/filter/row


def test_exact_dups(docs):
    got = {r["doc_id"]: r["n_copies"] for r in dedup.exact_dups(docs).collect()}
    assert got[0] == 2 and got[1] == 2
    assert got[2] == 1


def test_minhash_pairs_finds_near_dup(docs):
    pairs = {
        (r["doc_a"], r["doc_b"]): r["j_milli"]
        for r in dedup.minhash_lsh_pairs(docs).collect()
    }
    assert (0, 1) in pairs and pairs[(0, 1)] == 1000  # identical
    assert (0, 2) in pairs and pairs[(0, 2)] == 800   # 4/5 jaccard
    assert (3, 4) not in pairs


def test_simhash_identical_and_distance(docs):
    sh = {r["doc_id"]: r["simhash"] for r in dedup.simhash(docs).collect()}
    assert sh[0] == sh[1]
    assert 0 <= sh[0] < (1 << hashing.SIMHASH_BITS)
    pairs = {
        (r["doc_a"], r["doc_b"]): r["hdist"]
        for r in dedup.simhash_pairs(docs).collect()
    }
    assert pairs[(0, 1)] == 0


def test_simhash_banding_is_exact(spark):
    """4x16-bit banded join must equal brute force for hamming <= 3
    (pigeonhole over 4 bands of the 64-bit signature)."""
    import itertools

    docs = spark.createDataFrame(
        [(i, f"tok{i} tok{(i*7)%19} tok{(i*3)%11} tok{(i*5)%13}") for i in range(60)],
        ["doc_id", "text"],
    )
    sh = {
        r["doc_id"]: (r["sh0"], r["sh1"], r["sh2"], r["sh3"])
        for r in dedup.simhash64(docs).collect()
    }

    def hdist(a, b):
        return sum(bin(x ^ y).count("1") for x, y in zip(sh[a], sh[b]))

    brute = {
        (a, b)
        for a, b in itertools.combinations(sorted(sh), 2)
        if hdist(a, b) <= 3
    }
    banded = {
        (r["doc_a"], r["doc_b"]) for r in dedup.simhash_pairs(docs).collect()
    }
    assert banded == brute


def test_ann_brute_force_and_lsh(spark):
    import numpy as np

    from gdal_spark.operators import similarity as sim

    rng = np.random.default_rng(3)
    vecs = rng.normal(size=(80, 16)).astype("float32")
    vecs[1] = vecs[0] + rng.normal(scale=1e-3, size=16).astype("float32")
    emb = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )
    q = emb.where(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    top = sim.cosine_topk(emb, q, 5).collect()
    assert top[0]["vec_id"] == 1  # the planted near-duplicate wins
    assert top[0]["rank"] == 1
    # brute-force check of the full ranking
    sims = vecs @ vecs[0] / (np.linalg.norm(vecs, axis=1) * np.linalg.norm(vecs[0]))
    order = [i for i in np.argsort(-sims) if i != 0][:5]
    assert [r["vec_id"] for r in sorted(top, key=lambda r: r["rank"])] == order
    # LSH path returns a subset of the same ranking within the bucket
    lsh = sim.cosine_topk(emb, q, 5, bucketed=True).collect()
    assert all(r["query_id"] == 0 for r in lsh)
    assert lsh and lsh[0]["vec_id"] == 1


def test_cluster_near_dups(spark, docs):
    from gdal_spark.text.dedup import cluster_near_dups

    out = {r["doc_id"]: r for r in cluster_near_dups(docs).collect()}
    # docs 0, 1, 2 form one cluster (0==1 exact, 2 near); others singleton
    assert out[0]["cluster_id"] == out[1]["cluster_id"] == out[2]["cluster_id"]
    assert out[0]["cluster_size"] == 3
    assert out[3]["cluster_size"] == 1
    assert out[3]["cluster_id"] != out[0]["cluster_id"]
    # every doc appears exactly once
    assert len(out) == 6


def test_connected_components_chain_and_triangle(spark):
    from gdal_spark.operators.graph import connected_components

    # chain 10-11-12-13, triangle 20-21-22, isolated edge 30-31
    edges = spark.createDataFrame(
        [(11, 10), (11, 12), (13, 12), (20, 21), (21, 22), (20, 22), (31, 30)],
        "src long, dst long",
    )
    got = {r["id"]: r["root"] for r in connected_components(edges).collect()}
    assert {got[i] for i in (10, 11, 12, 13)} == {10}
    assert {got[i] for i in (20, 21, 22)} == {20}
    assert {got[i] for i in (30, 31)} == {30}


def test_cluster_ids_are_min_doc_id(spark, docs):
    from gdal_spark.text.dedup import cluster_near_dups

    out = {r["doc_id"]: r for r in cluster_near_dups(docs).collect()}
    assert out[0]["cluster_id"] == 0          # min doc id of {0,1,2}
    assert out[4]["cluster_id"] == 4          # singleton labels itself


def test_ivf_topk_structure(spark):
    import numpy as np

    from gdal_spark.operators import similarity as sim

    rng = np.random.default_rng(13)
    rows = [
        (int(i), [float(x) for x in rng.normal(0, 0.2, 16)], int(i % 3))
        for i in range(80)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    q = emb.where("vec_id % 20 = 0").selectExpr(
        "vec_id as query_id", "embedding as qv"
    )
    got = sim.ivf_topk(emb, q, 3).collect()
    per_q = {}
    for r in got:
        per_q.setdefault(r["query_id"], []).append(r)
    for qid, rs in per_q.items():
        ranks = sorted(r["rank"] for r in rs)
        assert ranks == list(range(1, len(rs) + 1))
        assert all(r["vec_id"] != qid for r in rs)
    # recall sanity vs brute force: the probed top-1 should usually
    # agree with the global top-1 (identical-direction vectors exist
    # only by chance; just require non-empty candidates per query)
    assert len(per_q) == 4


def test_duplicate_spans_merges_maximal_runs(spark):
    """Exact-substring dedup (dedup.duplicate_spans, n=3): a phrase
    shared by two docs becomes ONE maximal span per doc; unique text
    around it contributes nothing."""
    shared = "alpha beta gamma delta epsilon"          # 5 tokens
    rows = [
        (0, "unique0 pre " + shared + " post0 tail0 end0"),
        (1, "other1 lead1 " + shared + " different1 x1 y1"),
        (2, "nothing here matches anything at all ok"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {
        r["doc_id"]: r
        for r in dedup.duplicate_spans(df, n=3).collect()
    }
    assert set(out) == {0, 1}
    # doc 0: shared phrase occupies tokens 2..6 -> shingles at 2,3,4
    assert out[0]["start_tok"] == 2 and out[0]["end_tok"] == 6
    assert out[0]["n_shingles"] == 3
    assert out[1]["start_tok"] == 2 and out[1]["end_tok"] == 6


def test_duplicate_spans_within_doc_repeat(spark):
    """A phrase repeated INSIDE one document also counts (total
    occurrences >= 2), yielding two disjoint spans."""
    phrase = "p q r"
    rows = [(0, f"{phrase} filler1 filler2 filler3 {phrase} tail")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    spans = sorted(
        (r["start_tok"], r["end_tok"])
        for r in dedup.duplicate_spans(df, n=3).collect()
    )
    # tokens: p q r filler1 filler2 filler3 p q r tail -> matches at 0 and 6
    assert spans == [(0, 2), (6, 8)]


def test_duplicate_spans_short_docs_empty(spark):
    df = spark.createDataFrame([(0, "a b"), (1, "a b")],
                               ["doc_id", "text"])
    # docs shorter than n yield no shingles at all
    assert dedup.duplicate_spans(df, n=3).count() == 0


def test_kmeans_lloyd_recovers_separated_clusters(spark):
    """Two well-separated blobs, k=2: every point lands with its blob
    centre; empty-cell and tie handling are deterministic."""
    from gdal_spark.operators import similarity as sim

    rows = []
    for i in range(10):                       # blob A near (1, 0)
        rows.append((i, [1.0 + 0.001 * i, 0.0]))
    for i in range(10):                       # blob B near (0, 1)
        rows.append((100 + i, [0.0, 1.0 + 0.001 * i]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = sim.kmeans_lloyd(df, k=2, iters=2).collect()
    assert len(out) == 4                      # 2 cells x 2 dims
    sizes = {r["cell"]: r["n_members"] for r in out}
    assert sorted(sizes.values()) == [10, 10]
    cents = {(r["cell"], r["d"]): r["comp_q"] for r in out}
    # init = vec_ids 0 and 1 (both blob A); after the first update one
    # centroid owns blob A, the other migrates to blob B
    q = 1 << 20
    got = sorted(
        (round(cents[(c, 0)] / q, 1), round(cents[(c, 1)] / q, 1))
        for c in (0, 1)
    )
    assert got == [(0.0, 1.0), (1.0, 0.0)]


def test_kmeans_lloyd_integer_means_are_floored(spark):
    from gdal_spark.operators import similarity as sim

    # three identical-cluster points whose quantized sum is not
    # divisible by 3 -> floored mean, bit-stable across partitionings
    df = spark.createDataFrame(
        [(0, [0.25]), (1, [0.25]), (2, [0.25000286])],
        "vec_id long, embedding array<float>",
    )
    out = sim.kmeans_lloyd(df, k=1, iters=1).collect()
    q = [r["comp_q"] for r in out]
    import math
    import numpy as np
    xs = [math.floor(float(np.float32(v)) * (1 << 20))
          for v in (0.25, 0.25, 0.25000286)]
    assert q == [sum(xs) // 3]


def test_repetition_signals_gopher_filters(spark):
    rows = [
        (0, "a b a b a b a b a b a b"),     # pure bigram loop -> reject
        (1, "one two three four five six seven eight nine ten"),
        (2, "x"),                           # no bigrams at all -> keep
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in analysis.repetition_signals(df).collect()}
    assert out[0]["keep"] == 0 and out[1]["keep"] == 1 and out[2]["keep"] == 1
    # doc 0: 11 bigrams, 2 distinct -> dup = 9/11 -> 818 milli
    assert out[0]["dup2_milli"] == (1000 * 9) // 11
    # top bigram "a b" occurs 6 of 11 times
    assert out[0]["top2_milli"] == (1000 * 6) // 11
    assert out[1]["dup2_milli"] == 0 and out[1]["top2_milli"] == (1000 * 1) // 9
    assert out[2]["dup2_milli"] == 0 and out[2]["top2_milli"] == 0


def test_sequence_packing_layout(spark):
    rows = [
        (0, "src0", " ".join(["w"] * 300)),
        (1, "src0", " ".join(["w"] * 300)),   # crosses the 512 line
        (2, "src0", " ".join(["w"] * 24)),
        (3, "src1", " ".join(["w"] * 10)),    # independent stream
    ]
    df = spark.createDataFrame(rows, ["doc_id", "source", "text"])
    out = {r["doc_id"]: r for r in
           analysis.sequence_packing(df, window=512).collect()}
    assert (out[0]["seq_idx"], out[0]["seq_offset"]) == (0, 0)
    assert out[0]["n_boundary_crossings"] == 0
    # doc 1 starts at token 300 and ends at 600 -> crosses into seq 1
    assert (out[1]["seq_idx"], out[1]["seq_offset"]) == (0, 300)
    assert out[1]["n_boundary_crossings"] == 1
    # doc 2 starts at 600 -> seq 1, offset 88
    assert (out[2]["seq_idx"], out[2]["seq_offset"]) == (1, 88)
    # src1 restarts at zero
    assert (out[3]["seq_idx"], out[3]["seq_offset"]) == (0, 0)


def test_decontaminate_flags_shared_ngrams(spark):
    shared = "alpha beta gamma"
    train = spark.createDataFrame(
        [
            (0, "clean doc nothing shared here at all"),
            (1, f"leaky prefix {shared} leaky suffix words"),
            (2, "x y z " + shared + " " + shared + " tail"),
        ],
        ["doc_id", "text"],
    )
    test = spark.createDataFrame(
        [(100, f"benchmark question {shared} answer")],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in
           dedup.decontaminate(train, test, n=3).collect()}
    assert out[0]["contaminated"] == 0 and out[0]["n_contaminated"] == 0
    assert out[1]["contaminated"] == 1 and out[1]["n_contaminated"] == 1
    # doc 2 contains the shared trigram twice
    assert out[2]["n_contaminated"] == 2
    assert out[0]["n_shingles"] == 5


def test_vocab_topk_ordering(spark):
    df = spark.createDataFrame(
        [(0, "a a a b b c"), (1, "b a zz")], ["doc_id", "text"]
    )
    rows = analysis.vocab_topk(df, k=3).collect()
    assert [(r["rank"], r["tok"], r["n_total"], r["n_docs"])
            for r in rows] == [
        (1, "a", 4, 2), (2, "b", 3, 2), (3, "c", 1, 1),
    ]


def test_semdedup_removes_one_of_each_planted_pair(spark):
    """Two separated blobs plus a near-copy of one member per blob:
    the copy pairs with its original inside the cluster; exactly one
    of each pair is removed, and the KEPT one is the pair member
    farther from the cluster centroid."""
    from gdal_spark.operators import similarity as sim

    rows = []
    # ANGULAR spacing (cosine is scale-blind): adjacent blob members
    # are ~0.0004 apart in cosine, the planted copies ~5e-8
    for i in range(6):                        # blob A near (1, 0)
        rows.append((i, [1.0, 0.03 * i]))
    for i in range(6):                        # blob B near (0, 1)
        rows.append((100 + i, [0.03 * i, 1.0]))
    rows.append((500, [1.0, 0.0003]))         # near-dup of vec 0
    rows.append((501, [0.1503, 1.0]))         # near-dup of vec 105
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {r["vec_id"]: r for r in
           sim.semdedup(df, k=2, iters=2, threshold_e4=9999).collect()}
    assert len(out) == 14
    removed = {v for v, r in out.items() if r["keep"] == 0}
    # one per pair: {0 or 500} and {105 or 501}
    assert len(removed & {0, 500}) == 1
    assert len(removed & {105, 501}) == 1
    # the kept member of each pair is FARTHER from the centroid
    for a, b in ((0, 500), (105, 501)):
        kept, cut = (a, b) if b in removed else (b, a)
        assert out[kept]["d2"] >= out[cut]["d2"]
        assert out[kept]["cell"] == out[cut]["cell"]
    # non-duplicates all kept
    assert all(out[v]["keep"] == 1 for v in out
               if v not in {0, 500, 105, 501})


def test_semdedup_threshold_gates_removal(spark):
    from gdal_spark.operators import similarity as sim

    df = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.9, 0.1]), (2, [0.0, 1.0])],
        "vec_id long, embedding array<float>",
    )
    out = sim.semdedup(df, k=1, iters=1, threshold_e4=9999).collect()
    assert all(r["keep"] == 1 for r in out)   # cos(0,1) ~ 0.994 < .9999


def test_semdedup_hot_cluster_cap_bounds_pairs(spark):
    """Planted 10x skew: one giant all-similar cluster.  max_cluster
    splits it into pmod(vec_id, n_sub) sub-cells so the pairwise join
    is size*max_cluster-bounded, and the capped result is
    CONSERVATIVE (its removals are a subset of the exact run's)."""
    from pyspark.sql import functions as F

    from gdal_spark.operators import similarity as sim

    rows = []
    for i in range(100):                      # hot blob near (1, 0)
        rows.append((i, [1.0, 1e-6 * i]))
    for i in range(10):                       # small blob near (0, 1)
        rows.append((1000 + i, [0.03 * i, 1.0]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    exact = {r["vec_id"]: r["keep"]
             for r in sim.semdedup(df, k=2, iters=2,
                                   threshold_e4=9999).collect()}
    capped = {r["vec_id"]: r["keep"]
              for r in sim.semdedup(df, k=2, iters=2, threshold_e4=9999,
                                    max_cluster=10).collect()}
    assert set(capped) == set(exact)
    # conservative: capped never removes what exact kept
    assert all(exact[v] == 0 for v, kp in capped.items() if kp == 0)
    # the hot cluster still deduplicates hard inside sub-cells
    assert sum(1 for v, kp in capped.items() if v < 100 and kp == 0) >= 80

    # pair bound: largest (cell, sub) group is ~max_cluster-sized, so
    # worst-case pairs fall from size^2 = 10000 to ~size*max_cluster
    _, assigned = sim._lloyd_loop(df, 2, 2, "embedding")
    prio = assigned.select("vec_id", "cell", "d2")
    sizes = prio.groupBy("cell").agg(F.count(F.lit(1)).alias("cn"))
    sub = (prio.join(F.broadcast(sizes), "cell")
           .withColumn("nsub", F.ceil(F.col("cn") / 10).cast("long"))
           .withColumn("sub", F.pmod(F.col("vec_id"), F.col("nsub")))
           .groupBy("cell", "sub").count().agg(F.max("count")).first()[0])
    assert sub <= 25  # pmod(vec_id) balance within 2.5x of the cap
