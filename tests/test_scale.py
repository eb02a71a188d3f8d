"""Salting / resume / lineage / metrics tests (north-rule Phase 6)."""

import pytest
from pyspark.sql import functions as F

from gdal_spark.operators import scale


def test_salted_agg_matches_plain(spark):
    df = spark.range(10_000).select(
        (F.col("id") % 7).alias("k"),
        # zipf-ish: most rows share key 0
        F.when(F.col("id") % 10 < 8, F.lit(0)).otherwise(F.col("id") % 7).alias("hot"),
        (F.col("id") * 3 % 101).alias("v"),
    )
    plain = {
        (r["hot"],): (r["s"], r["n"])
        for r in df.groupBy("hot").agg(F.sum("v").alias("s"), F.count("v").alias("n")).collect()
    }
    salted = {
        (r["hot"],): (r["v"], r["n"])
        for r in scale.salted_agg(
            df.withColumn("n", F.lit(1)), ["hot"], {"v": "sum", "n": "sum"}, buckets=8
        ).collect()
    }
    assert plain.keys() == salted.keys()
    for k in plain:
        assert plain[k] == salted[k]


def test_hot_keys_detects_zipf(spark):
    df = spark.range(1000).select(
        F.when(F.col("id") < 900, F.lit(42)).otherwise(F.col("id")).alias("cell")
    )
    hot = scale.hot_keys(df, ["cell"], threshold=100).collect()
    assert len(hot) == 1
    assert hot[0]["cell"] == 42
    assert hot[0]["n"] == 900


def test_resume_anti_join(tmp_path, spark):
    out = str(tmp_path / "tiles")
    work = spark.range(100).select(
        F.col("id").alias("tile"), (F.col("id") * 2).alias("payload")
    )
    writer = scale.ResumableWriter(spark, out, keys=["tile"])
    m1 = writer.run(work, job_run_id="run1")
    assert m1["rows"] == 100
    # second run: everything committed -> zero new rows
    m2 = writer.run(work, job_run_id="run2")
    assert m2["rows"] == 0
    snap = spark.read.parquet(out)
    assert snap.count() == 100
    # partial-failure resume: extended workload re-runs only the delta
    work2 = spark.range(120).select(
        F.col("id").alias("tile"), (F.col("id") * 2).alias("payload")
    )
    m3 = writer.run(work2, job_run_id="run3")
    assert m3["rows"] == 20
    snap = spark.read.parquet(out)
    assert snap.count() == 120
    # lineage columns present and attribute the delta to run3
    run3 = snap.where(F.col("job_run_id") == "run3")
    assert run3.count() == 20
    assert {r["tile"] for r in run3.select("tile").collect()} == set(range(100, 120))
    assert "partition_id" in snap.columns


def test_metrics_recorded(tmp_path, spark):
    out = str(tmp_path / "m")
    writer = scale.ResumableWriter(spark, out, keys=["k"])
    writer.run(spark.range(10).select(F.col("id").alias("k")))
    assert writer.metrics[0]["distinct_keys"] == 10
    assert writer.metrics[0]["wall_ms"] >= 0
