"""Deterministic split assignment (text/splits.py)."""

import pytest
from pyspark.sql import functions as F

from gdal_spark.text.splits import assign_splits


def test_cluster_members_share_split_and_fractions_hold(spark):
    df = spark.range(4000).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 500).alias("cluster"),
    )
    out = assign_splits(
        df, "doc_id",
        fractions={"train": 0.8, "val": 0.1, "test": 0.1},
        cluster_col="cluster",
    )
    per_cluster = (
        out.groupBy("cluster")
        .agg(F.countDistinct("split").alias("n"))
        .agg(F.max("n"))
        .first()[0]
    )
    assert per_cluster == 1  # leakage-free: one split per cluster
    counts = {r["split"]: r["count"] for r in
              out.groupBy("split").count().collect()}
    assert 0.7 < counts["train"] / 4000 < 0.9
    assert counts["val"] > 0 and counts["test"] > 0


def test_stable_across_repartition(spark):
    df = spark.range(100).select(F.col("id").alias("doc_id"))
    a = {r["doc_id"]: r["split"]
         for r in assign_splits(df, "doc_id").collect()}
    b = {r["doc_id"]: r["split"]
         for r in assign_splits(df.repartition(7), "doc_id").collect()}
    assert a == b


def test_bad_fractions_raise(spark):
    df = spark.range(5).select(F.col("id").alias("doc_id"))
    with pytest.raises(ValueError, match="sum"):
        assign_splits(df, "doc_id", fractions={"train": 0.5, "val": 0.1})
