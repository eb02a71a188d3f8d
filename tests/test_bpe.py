"""Distributed BPE trainer vs an independent in-memory reference
(text/bpe.py) — the documented oracle-exception class (iterative)."""

from collections import Counter

import pytest

from gdal_spark.text.bpe import END, bpe_encode, bpe_train, merge_once


def _ref_train(texts, n_merges):
    """Straightforward single-machine Sennrich trainer."""
    words = Counter()
    for t in texts:
        for w in t.split(" "):
            words[w] += 1
    vocab = {tuple(list(w) + [END]): c for w, c in words.items()}
    merges = []
    for _ in range(n_merges):
        pairs = Counter()
        for syms, c in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += c
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < 2:
            break
        (left, right), c = best
        merges.append((left, right, c))
        vocab = {
            tuple(merge_once(list(s), left, right)): c
            for s, c in vocab.items()
        }
    return merges


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_merge_once_left_to_right():
    assert merge_once(["a", "a", "a"], "a", "a") == ["aa", "a"]
    assert merge_once(["x", "a", "a", "a", "a"], "a", "a") == [
        "x", "aa", "aa"
    ]


def test_matches_reference_small(spark):
    texts = ["low lower lowest", "low low new newer", "wider wide new"]
    got = bpe_train(_docs(spark, texts), 8)
    assert got == _ref_train(texts, 8)


def test_matches_reference_repetitive(spark):
    texts = ["aaab aab ab ab ab", "b aaab aaab", "ba ab aaab"]
    got = bpe_train(_docs(spark, texts), 10)
    assert got == _ref_train(texts, 10)


def test_early_stop_when_no_repeats(spark):
    # every pair unique -> zero merges
    got = bpe_train(_docs(spark, ["xy zq"]), 5)
    assert got == _ref_train(["xy zq"], 5)
    assert got == []


def test_encode_uses_merge_ranks(spark):
    texts = ["banana banana bandana"]
    merges = bpe_train(_docs(spark, texts), 6)
    enc = bpe_encode("banana", merges)
    assert "".join(enc) == "banana" + END
    assert len(enc) < len("banana") + 1  # some merge applied


def test_deterministic_tiebreak(spark):
    # 'ab' and 'cd' both occur twice; (a,b) < (c,d) lexicographically
    texts = ["ab ab cd cd"]
    merges = bpe_train(_docs(spark, texts), 1)
    assert merges[0][:2] == ("a", "b")
