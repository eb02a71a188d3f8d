"""Structured Streaming: incremental tile ingestion with checkpoint
resume, and watermark-windowed event rollups."""

import datetime as dt

from pyspark.sql import functions as F

from gdal_spark.streaming.jobs import (
    incremental_tile_counts,
    read_tile_counts,
    windowed_event_rollup,
)


def test_incremental_tile_counts_resume(tmp_path, spark):
    inp = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    spark.range(0, 500).selectExpr("id as i").write.parquet(inp, mode="append")
    incremental_tile_counts(spark, inp, out, ckpt)
    total1 = read_tile_counts(spark, out).agg(F.sum("n_images")).collect()[0][0]
    assert total1 == 500

    # second run with NO new files: checkpoint says nothing to do
    incremental_tile_counts(spark, inp, out, ckpt)
    total2 = read_tile_counts(spark, out).agg(F.sum("n_images")).collect()[0][0]
    assert total2 == 500

    # new arrivals -> only the delta is processed, totals now 800
    spark.range(500, 800).selectExpr("id as i").write.parquet(inp, mode="append")
    incremental_tile_counts(spark, inp, out, ckpt)
    merged = read_tile_counts(spark, out)
    assert merged.agg(F.sum("n_images")).collect()[0][0] == 800

    # incremental result == batch-from-scratch result per tile
    from gdal_spark.fixtures import georef
    from gdal_spark.tiles import tilemath as tm

    batch = (
        georef.with_image_geo(spark.range(800).selectExpr("id as i"), "i")
        .select(*tm.tile_xy_cols(F.col("cx"), F.col("cy"), 6))
        .toDF("tile_x", "tile_y")
        .groupBy("tile_x", "tile_y")
        .count()
    )
    got = {
        (r["tile_x"], r["tile_y"]): r["n_images"] for r in merged.collect()
    }
    want = {(r["tile_x"], r["tile_y"]): r["count"] for r in batch.collect()}
    assert got == want


def test_windowed_event_rollup(tmp_path, spark):
    inp = str(tmp_path / "ev")
    out = str(tmp_path / "agg")
    ckpt = str(tmp_path / "ck")
    base = dt.datetime(2024, 1, 1)
    rows = [
        (i, base + dt.timedelta(hours=i % 30), i % 5, "click" if i % 2 else "view",
         float(i), "{}")
        for i in range(200)
    ]
    schema = "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    spark.createDataFrame(rows, schema).write.parquet(inp)
    # a far-future row advances the watermark so earlier windows close
    spark.createDataFrame(
        [(999, base + dt.timedelta(days=10), 0, "view", 0.0, "{}")], schema
    ).write.parquet(inp, mode="append")
    windowed_event_rollup(spark, inp, out, ckpt)
    res = spark.read.parquet(out)
    assert res.count() > 0
    # every finalized 6h window count matches the batch group-by
    batch = (
        spark.read.parquet(inp)
        .groupBy(F.window("ts", "6 hours").alias("w"), "event_type")
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n")
    )
    got = {(r["window_start"], r["event_type"]): r["n"] for r in res.collect()}
    want = {(r["window_start"], r["event_type"]): r["n"] for r in batch.collect()}
    for k, v in got.items():
        assert want[k] == v


def test_stateful_user_stats(tmp_path, spark):
    """GroupState persists across micro-batches and restarts."""
    from gdal_spark.streaming.jobs import stateful_user_stats

    inp = str(tmp_path / "sin")
    out = str(tmp_path / "sout")
    ckpt = str(tmp_path / "sck")
    base = dt.datetime(2024, 2, 1)
    schema = "event_id long, ts timestamp, user_id long, event_type string, value double, props string"

    def mk(rows):
        spark.createDataFrame(rows, schema).write.parquet(inp, mode="append")

    mk([(i, base, i % 3, "view", 1.5, "{}") for i in range(30)])
    stateful_user_stats(spark, inp, out, ckpt)
    # second wave: state must carry the first wave's totals
    mk([(100 + i, base, i % 3, "click", 2.25, "{}") for i in range(12)])
    stateful_user_stats(spark, inp, out, ckpt)

    res = spark.read.parquet(out)
    latest = (
        res.groupBy("user_id")
        .agg(F.max("batch_id").alias("b"))
        .join(res, ["user_id"])
        .where("batch_id = b")
    )
    got = {
        r["user_id"]: (r["total_events"], r["total_cents"])
        for r in latest.collect()
    }
    assert got[0] == (10 + 4, 10 * 150 + 4 * 225)
    assert got[1] == (10 + 4, 10 * 150 + 4 * 225)
    assert got[2] == (10 + 4, 10 * 150 + 4 * 225)


def test_streaming_pip_enrich(tmp_path, spark):
    """Stream-static PIP join: incremental result equals batch."""
    from gdal_spark.fixtures import georef as _georef
    from gdal_spark.fixtures.zones import build_zones
    from gdal_spark.operators.spatial_join import pip_join
    from gdal_spark.streaming.jobs import streaming_pip_enrich

    inp = str(tmp_path / "imgs")
    out = str(tmp_path / "pairs")
    ckpt = str(tmp_path / "pk")
    zones = build_zones(spark, n=100)

    spark.range(0, 30000).selectExpr("id as i").write.parquet(inp, mode="append")
    streaming_pip_enrich(spark, inp, zones, out, ckpt)
    spark.range(30000, 50000).selectExpr("id as i").write.parquet(inp, mode="append")
    streaming_pip_enrich(spark, inp, zones, out, ckpt)

    got = {
        (r["image_id"], r["fid"])
        for r in spark.read.parquet(out).select("image_id", "fid").collect()
    }
    batch = pip_join(
        _georef.with_image_geo(spark.range(50000).selectExpr("id as i"), "i"),
        zones,
    )
    want = {(r["image_id"], r["fid"]) for r in batch.collect()}
    assert got == want


def test_streaming_exact_dedup_across_batches_and_restarts(tmp_path, spark):
    import pandas as pd

    from gdal_spark.streaming.jobs import streaming_exact_dedup

    inp = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    spark.createDataFrame(
        [(1, "alpha"), (2, "beta"), (3, "alpha")], "doc_id long, text string"
    ).write.mode("append").parquet(inp)
    streaming_exact_dedup(spark, inp, out, ckpt)
    first = spark.read.parquet(out)
    assert first.select("text_md5").distinct().count() == 2
    # restart with new files: an old duplicate must stay suppressed
    spark.createDataFrame(
        [(4, "beta"), (5, "gamma")], "doc_id long, text string"
    ).write.mode("append").parquet(inp)
    streaming_exact_dedup(spark, inp, out, ckpt)
    rows = spark.read.parquet(out).select("doc_id", "text_md5").collect()
    by_digest = {}
    for r in rows:
        by_digest.setdefault(r["text_md5"], []).append(r["doc_id"])
    assert len(by_digest) == 3            # alpha, beta, gamma
    assert all(len(v) == 1 for v in by_digest.values())  # one keeper each
    assert 4 not in {r["doc_id"] for r in rows}  # later dup suppressed


def test_streaming_simhash_dedup_across_batches(tmp_path, spark):
    """Near-dup signatures suppress across micro-batches and restarts
    (checkpointed dropDuplicates state on the 64-bit SimHash)."""
    from gdal_spark.streaming.jobs import streaming_simhash_dedup

    inp = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    d1 = spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (2, "totally different words here")],
        "doc_id long, text string",
    )
    d1.write.parquet(inp)
    streaming_simhash_dedup(spark, inp, out, ckpt)
    first = spark.read.parquet(out)
    assert first.count() == 2
    # identical text in a LATER batch = same signature -> suppressed
    d2 = spark.createDataFrame(
        [(3, "alpha beta gamma delta"), (4, "a genuinely new document")],
        "doc_id long, text string",
    )
    d2.write.mode("append").parquet(inp)
    streaming_simhash_dedup(spark, inp, out, ckpt)
    got = spark.read.parquet(out).toPandas()
    assert sorted(got["doc_id"]) == [1, 2, 4]      # 3 suppressed
    assert got["sim64"].nunique() == 3
