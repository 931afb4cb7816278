"""Streaming distribution-drift monitor.

A production training-data pipeline watches every incoming feature for
drift against a frozen reference profile (yesterday's corpus, the
training snapshot, a golden distribution). This module is the
Structured Streaming form: file source → watermarked per-window value
histograms (append mode, so a window's histogram is emitted exactly
once, finalized) → ``foreachBatch`` scores each finalized window
against the broadcast reference with the exact-integer KS core shared
with the batch scorecard (`events_hourly_ks_drift`,
functions/stats.py::ks_vs_reference) → parquet alert log.

Why foreachBatch for the KS step: the statistic needs the WHOLE
finalized window histogram plus a cumulative pass over the merged
value axis — not an algebra that SUM-merges across micro-batches (the
same boundary stream_expectations_monitor documents for uniqueness).
Append mode guarantees each (window, v) group arrives exactly once,
after the watermark closes the window, so scoring inside the batch is
complete-by-construction; state stays bounded by the watermark.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_validator_github_spark.functions.stats import ks_vs_reference
from etl_validator_github_spark.streaming.events import EVENT_STREAM_SCHEMA


def reference_histogram(df: DataFrame, value_col: str = "value") -> DataFrame:
    """Cents-quantized value histogram — the frozen reference profile.
    Computed once (batch) and persisted; domain-bounded (distinct
    quantized values), so it broadcasts into every scoring batch."""
    return (
        df.select(F.round(F.col(value_col) * 100).cast("long").alias("v"))
        .groupBy("v")
        .agg(F.count(F.lit(1)).cast("long").alias("n_ref"))
    )


def windowed_value_counts(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Per-(event-time window, cents value) counts with a watermark —
    the streaming histogram the KS step consumes."""
    with_ts = events.withColumn("event_time", F.timestamp_seconds("ts_s"))
    return (
        with_ts.withWatermark("event_time", watermark)
        .groupBy(
            F.window("event_time", window).alias("w"),
            F.round(F.col("value") * 100).cast("long").alias("v"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("w.start").alias("window_start"),
            "v", "n",
        )
    )


def score_windows(batch_counts: DataFrame, ref: DataFrame) -> DataFrame:
    """Score finalized window histograms against the reference: one
    row per window — (window_start, n_window, n_ref, ks_micro). Plain
    batch transform (shared by tests and the foreachBatch hook)."""
    return ks_vs_reference(batch_counts, ref, ["window_start"])


def stream_value_drift(
    spark,
    source_dir: str,
    ref_dir: str,
    sink_dir: str,
    checkpoint_dir: str,
    window: str = "1 hour",
    watermark: str = "2 hours",
    available_now: bool = True,
):
    """File-source events → watermarked window histograms → per-window
    KS vs the persisted reference profile → parquet drift log.

    ``ref_dir`` holds the ``reference_histogram`` parquet. Each
    ``foreachBatch`` invocation sees only windows the watermark just
    finalized (append mode), scores them completely, and appends to
    the drift log; batch-id redelivery after a crash rewrites the same
    rows (same finalized input → same output), keeping the log
    idempotent under Spark's at-least-once foreachBatch contract.
    """
    stream = (
        spark.readStream.schema(EVENT_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", 8)
        .json(source_dir)
    )
    counts = windowed_value_counts(stream, window=window,
                                   watermark=watermark)

    def _score(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        ref = spark.read.parquet(ref_dir)
        (score_windows(batch_df, ref)
         .write.mode("append").parquet(sink_dir))

    writer = (
        counts.writeStream.outputMode("append")
        .foreachBatch(_score)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
