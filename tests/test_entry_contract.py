"""Driver-contract invariants for __spark_entry__."""

import sys

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entry


def test_registry_consistency():
    qs = entry.queries()
    oracles = entry.oracle_sql()
    assert qs, "queries() must not be empty"
    # every oracle refers to an existing query
    for name in oracles:
        assert name in qs, f"oracle {name} has no query"
    # every query is oracle-checked (rows-only exceptions listed here)
    # bpe_train is iterative (merge k depends on merge k-1): value
    # truth is tests/test_bpe.py's differential suite + the oracled
    # bpe_pair_counts twin of its corpus-scale stage.
    rows_only: set[str] = {"bpe_train"}
    missing = [n for n in qs if n not in oracles and n not in rows_only]
    assert not missing, f"queries without oracles: {missing}"


def test_oracle_sql_is_strings():
    for name, sql in entry.oracle_sql().items():
        assert isinstance(sql, str) and "SELECT" in sql.upper(), name


def test_entry_smoke(spark):
    df = entry.entry(spark)
    assert df.count() >= 0
    assert len(df.schema.fields) >= 3


def test_one_query_runs(spark):
    out = entry.q_tile_counts(spark, entry.SF001)
    assert out.count() > 0
