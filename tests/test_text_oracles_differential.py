"""Differential validation of the text-op DuckDB twins against
independent brute-force Python implementations — random corpora via
hypothesis, no Spark session (the Spark side is covered by the
driver's oracle gate; this guards the ORACLES themselves)."""

import duckdb
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from gdal_spark.text import analysis, dedup

_word = st.sampled_from(["a", "b", "c", "dd", "eee", "f"])
_doc = st.lists(_word, min_size=1, max_size=30).map(" ".join)
_corpus = st.lists(_doc, min_size=1, max_size=8)


def _duck(sql: str, docs: list[str]):
    con = duckdb.connect()
    pdf = pd.DataFrame(
        {
            "doc_id": range(len(docs)),
            "text": docs,
            "source": ["s" + str(i % 2) for i in range(len(docs))],
        }
    )
    con.register("documents", pdf)
    return con.sql(sql).df()


def _brute_spans(docs, n):
    from collections import Counter

    sh = {
        d: [tuple(doc.split()[i:i + n])
            for i in range(len(doc.split()) - n + 1)]
        for d, doc in enumerate(docs)
    }
    counts = Counter(g for gs in sh.values() for g in gs)
    spans = []
    for d, gs in sh.items():
        dup_pos = [i for i, g in enumerate(gs) if counts[g] >= 2]
        run = []
        for p in dup_pos:
            if run and p == run[-1] + 1:
                run.append(p)
            else:
                if run:
                    spans.append((d, run[0], run[-1] + n - 1, len(run)))
                run = [p]
        if run:
            spans.append((d, run[0], run[-1] + n - 1, len(run)))
    return sorted(spans)


@settings(max_examples=30, deadline=None)
@given(_corpus)
def test_dup_spans_oracle_matches_brute_force(docs):
    n = 3
    got = _duck(dedup.sql_duplicate_spans("documents", n=n), docs)
    rows = sorted(
        (int(r.doc_id), int(r.start_tok), int(r.end_tok),
         int(r.n_shingles))
        for r in got.itertuples()
    )
    assert rows == _brute_spans(docs, n)


@settings(max_examples=30, deadline=None)
@given(_corpus)
def test_seq_packing_oracle_matches_brute_force(docs):
    got = _duck(analysis.sql_sequence_packing("documents", window=7),
                docs)
    by_doc = {int(r.doc_id): r for r in got.itertuples()}
    cum = {}
    for d, doc in enumerate(docs):
        src = "s" + str(d % 2)
        start = cum.get(src, 0)
        nt = len(doc.split())
        assert by_doc[d].seq_idx == start // 7
        assert by_doc[d].seq_offset == start % 7
        assert by_doc[d].n_boundary_crossings == (
            (start + nt - 1) // 7 - start // 7
        )
        cum[src] = start + nt


@settings(max_examples=30, deadline=None)
@given(_corpus)
def test_repetition_oracle_matches_brute_force(docs):
    got = _duck(analysis.sql_repetition_signals("documents"), docs)
    by_doc = {int(r.doc_id): r for r in got.itertuples()}
    for d, doc in enumerate(docs):
        toks = doc.split()
        for n, col in ((2, "dup2_milli"), (3, "dup3_milli"),
                       (4, "dup4_milli")):
            gs = [tuple(toks[i:i + n])
                  for i in range(len(toks) - n + 1)]
            exp = 0 if not gs else (
                1000 * (len(gs) - len(set(gs)))
            ) // len(gs)
            assert getattr(by_doc[d], col) == exp, (d, n)
        gs2 = [tuple(toks[i:i + 2]) for i in range(len(toks) - 1)]
        if gs2:
            from collections import Counter

            top = Counter(gs2).most_common(1)[0][1]
            assert by_doc[d].top2_milli == (1000 * top) // len(gs2)
        else:
            assert by_doc[d].top2_milli == 0


@settings(max_examples=30, deadline=None)
@given(_corpus)
def test_decontaminate_oracle_matches_brute_force(docs):
    n = 3
    sql = dedup.sql_decontaminate(
        "(SELECT * FROM documents WHERE doc_id % 2 = 1)",
        "(SELECT * FROM documents WHERE doc_id % 2 = 0)", n=n)
    got = _duck(sql, docs)
    test_sh = set()
    for d, doc in enumerate(docs):
        if d % 2 == 0:
            toks = doc.split()
            test_sh |= {tuple(toks[i:i + n])
                        for i in range(len(toks) - n + 1)}
    by_doc = {int(r.doc_id): r for r in got.itertuples()}
    for d, doc in enumerate(docs):
        if d % 2 == 0:
            continue
        toks = doc.split()
        gs = [tuple(toks[i:i + n]) for i in range(len(toks) - n + 1)]
        hits = sum(1 for g in gs if g in test_sh)
        assert by_doc[d].n_contaminated == hits
        assert by_doc[d].contaminated == (1 if hits else 0)
