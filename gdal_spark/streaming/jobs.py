"""Structured Streaming jobs: incremental tile ingestion + windowed
event rollups.

The reference is a batch library (SURVEY.md §2.11) — its
"streaming-shaped" obligations are resumable long jobs and
incremental snapshots. Here they are expressed natively:

- incremental_tile_counts: images arrive as parquet files; each
  micro-batch derives georef (Column math), assigns zoom-z tiles and
  upserts per-tile counts. Trigger(availableNow=True) + a checkpoint
  dir give exactly-once incremental processing: re-running after new
  files arrive processes ONLY the new files (the streaming twin of
  the anti-join resume in operators/scale.py, and of the reference's
  tile-exists skip, apps/gdalalg_raster_tile.cpp:377).
- windowed_event_rollup: event-time tumbling windows with a watermark
  for late data — the streaming twin of q_events_windowed.

Sinks are idempotent per micro-batch: foreachBatch may re-deliver a
batch after a partial write (at-least-once), so each batch writes to
its own `batch_id=<n>` partition directory with mode("overwrite") —
a retry replaces the same directory instead of appending duplicate
rows, restoring exactly-once results table semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gdal_spark.fixtures import georef
from gdal_spark.tiles import tilemath as tm


def _write_batch_idempotent(df: DataFrame, out_dir: str, batch_id: int) -> None:
    """Write one micro-batch's rows into `{out_dir}/batch_id=<n>/`
    with overwrite: a foreachBatch retry (at-least-once delivery)
    replaces the partial partition instead of appending a duplicate,
    so readers summing across batches never double-count."""
    df.write.mode("overwrite").parquet(f"{out_dir}/batch_id={batch_id}")


def incremental_tile_counts(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    z: int = 6,
    id_schema: str = "i long",
) -> None:
    """Process all currently-available new files, then stop."""
    stream = spark.readStream.schema(id_schema).parquet(input_dir)
    geo = georef.with_image_geo(stream, "i")
    tx, ty = tm.tile_xy_cols(F.col("cx"), F.col("cy"), z)
    assigned = geo.select(
        F.lit(z).alias("tile_z"), tx.alias("tile_x"), ty.alias("tile_y")
    )

    def upsert(batch_df: DataFrame, batch_id: int) -> None:
        counts = batch_df.groupBy("tile_z", "tile_x", "tile_y").agg(
            F.count("*").alias("n_images")
        )
        _write_batch_idempotent(counts, out_dir, batch_id)

    (
        assigned.writeStream.foreachBatch(upsert)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )


def read_tile_counts(spark: SparkSession, out_dir: str) -> DataFrame:
    """Merge the per-batch partial counts into current totals."""
    return (
        spark.read.parquet(out_dir)
        .groupBy("tile_z", "tile_x", "tile_y")
        .agg(F.sum("n_images").alias("n_images"))
    )


def streaming_pip_enrich(
    spark: SparkSession,
    input_dir: str,
    zones,
    out_dir: str,
    checkpoint_dir: str,
) -> None:
    """Stream-static spatial enrichment: arriving images (id rows)
    derive georef and join the STATIC zones table through the
    same cell-key PIP machinery used in batch — Structured Streaming
    supports stream-static joins natively, so the batch operator
    composes unchanged inside foreachBatch."""
    from gdal_spark.operators.spatial_join import pip_join

    stream = spark.readStream.schema("i long").parquet(input_dir)

    def enrich(batch_df: DataFrame, batch_id: int) -> None:
        images = georef.with_image_geo(batch_df, "i")
        pairs = pip_join(images, zones)
        _write_batch_idempotent(pairs, out_dir, batch_id)

    (
        stream.writeStream.foreachBatch(enrich)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )


def stateful_user_stats(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    checkpoint_dir: str,
) -> None:
    """Custom stateful operator via applyInPandasWithState: per-user
    running totals (event count, value cents) carried in GroupState
    across micro-batches — the applyInPandasWithState analog of a
    keyed accumulator; emits one row per user per batch with the
    running totals so far."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    schema = "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    out_type = "user_id long, total_events long, total_cents long"
    state_type = "total_events long, total_cents long"

    def update(key, pdfs, state: GroupState):
        total_events, total_cents = (
            state.get if state.exists else (0, 0)
        )
        for pdf in pdfs:
            total_events += len(pdf)
            # per-row integer cents: deterministic across batchings
            total_cents += int(pdf["value"].mul(100).round().astype("int64").sum())
        state.update((total_events, total_cents))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "total_events": [total_events],
                "total_cents": [total_cents],
            }
        )

    stream = spark.readStream.schema(schema).parquet(input_dir)
    out = stream.groupBy("user_id").applyInPandasWithState(
        update, out_type, state_type, "append", GroupStateTimeout.NoTimeout
    )

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        _write_batch_idempotent(batch_df, out_dir, batch_id)

    (
        out.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )


def windowed_event_rollup(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    window: str = "6 hours",
    watermark: str = "1 day",
) -> None:
    """Event-time tumbling windows with a watermark; append mode emits
    only finalized windows."""
    schema = "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    stream = spark.readStream.schema(schema).parquet(input_dir)
    agg = (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("sum_cents"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type", "n", "sum_cents",
        )
    )
    (
        agg.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )


def streaming_exact_dedup(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    checkpoint_dir: str,
) -> None:
    """Streaming twin of text/dedup.exact_dups: arriving documents
    drop exact-content duplicates ACROSS micro-batches via
    dropDuplicates on the content digest — state persists in the
    checkpoint, so a duplicate arriving in a later batch (or after a
    restart) is still suppressed. Emits the first-seen row per
    digest."""
    stream = spark.readStream.schema("doc_id long, text string").parquet(input_dir)
    deduped = stream.withColumn("text_md5", F.md5("text")).dropDuplicates(
        ["text_md5"]
    )

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        _write_batch_idempotent(
            batch_df.select("doc_id", "text_md5"), out_dir, batch_id
        )

    (
        deduped.writeStream.outputMode("update")
        .foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )


def streaming_simhash_dedup(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    checkpoint_dir: str,
) -> None:
    """Streaming twin of text/dedup.simhash64 near-dup suppression:
    arriving documents compute the 64-bit SimHash and drop rows whose
    FULL signature was already seen across micro-batches
    (dropDuplicates state in the checkpoint — survives restarts).
    Full-signature equality is the zero-distance band of the batch
    pipeline's 4x16-bit LSH; band-level streaming suppression would
    drop non-duplicates and is deliberately out of scope (the batch
    verify join is the correct place for hamming<=k)."""
    from gdal_spark.text import dedup as _dedup

    stream = spark.readStream.schema("doc_id long, text string").parquet(
        input_dir
    )
    sig = _dedup.simhash64(stream).withColumn(
        "sim64",
        F.col("sh0").cast("long")
        .bitwiseOR(F.shiftleft(F.col("sh1").cast("long"), 16))
        .bitwiseOR(F.shiftleft(F.col("sh2").cast("long"), 32))
        .bitwiseOR(F.shiftleft(F.col("sh3").cast("long"), 48)),
    )

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        _write_batch_idempotent(
            batch_df.select("doc_id", "sim64"), out_dir, batch_id
        )

    (
        sig.dropDuplicates(["sim64"])
        .writeStream.outputMode("update")
        .foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
