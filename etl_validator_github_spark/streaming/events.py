"""Streaming analytics over the events stream: watermarked tumbling
windows and stateful per-user sessionization.

The batch twins of these live in queries/relational.py
(events_hourly_rollup / events_sessionize); these are the Structured
Streaming forms a production pipeline runs: file/kafka source →
event-time windows with a watermark bounding late data and state size →
append-mode sink. At 100 TB/day the watermark is what keeps state
bounded; without it the window store grows monotonically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: Schema for event rows arriving on the stream (ts in epoch seconds —
#: streaming sources deliver typed columns; the batch path normalizes
#: whatever the parquet stores to epoch-µs in load_events).
EVENT_STREAM_SCHEMA = StructType([
    StructField("event_id", LongType()),
    StructField("ts_s", LongType()),
    StructField("user_id", LongType()),
    StructField("event_type", StringType()),
    StructField("value", DoubleType()),
])


def windowed_rollup(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Event-time tumbling-window counts/sums per event_type.

    The watermark lets Spark finalize (and emit, in append mode) windows
    older than max(event time) − watermark, and garbage-collect their
    state — the property that keeps a 100 TB/day stream's state bounded.
    """
    with_ts = events.withColumn("event_time", F.timestamp_seconds("ts_s"))
    return (
        with_ts.withWatermark("event_time", watermark)
        .groupBy(F.window("event_time", window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("value_cents"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            (F.col("value_cents") / F.lit(100.0)).alias("value_total"),
        )
    )


def deduped_events(
    events: DataFrame,
    watermark: str = "2 hours",
) -> DataFrame:
    """Exactly-once event ingestion: drop redelivered events by id.

    ``dropDuplicatesWithinWatermark`` keys state on event_id and expires
    entries past the watermark — at-least-once sources (Kafka, file
    redelivery) become effectively-once downstream while state stays
    bounded by (arrival rate × watermark), not by stream lifetime. The
    batch twin is a plain ``dropDuplicates(["event_id"])``.
    """
    with_ts = events.withColumn("event_time", F.timestamp_seconds("ts_s"))
    return (
        with_ts.withWatermark("event_time", watermark)
        .dropDuplicatesWithinWatermark(["event_id"])
    )


def stream_deduped_ingest(
    spark,
    source_dir: str,
    sink_dir: str,
    checkpoint_dir: str,
    watermark: str = "2 hours",
    available_now: bool = True,
):
    """File-source → watermarked id-dedup → parquet append sink."""
    stream = (
        spark.readStream.schema(EVENT_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", 8)
        .json(source_dir)
    )
    deduped = deduped_events(stream, watermark=watermark)
    writer = (
        deduped.drop("event_time")
        .writeStream.outputMode("append")
        .format("parquet")
        .option("path", sink_dir)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def enriched_rollup(
    events: DataFrame,
    dims: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-STATIC enrichment join + windowed rollup per segment.

    The production shape for joining a firehose against a slowly-
    changing dimension (user → segment): the static side broadcasts to
    every executor and the join is STATELESS — unlike a stream-stream
    join it needs no join-state store or watermark bound, because the
    static side is re-planned at each micro-batch (which is also how
    dim updates between batches get picked up). The watermark here
    bounds only the window-aggregation state. LEFT join: events whose
    user is missing from the dimension surface as segment='unknown'
    instead of silently dropping — at 100 TB/day a dim gap must show
    up in the rollup, not vanish.
    """
    with_ts = events.withColumn("event_time", F.timestamp_seconds("ts_s"))
    d = F.broadcast(dims.select("user_id", "segment"))
    joined = with_ts.withWatermark("event_time", watermark).join(
        d, "user_id", "left"
    )
    return (
        joined.groupBy(
            F.window("event_time", window).alias("w"),
            F.coalesce("segment", F.lit("unknown")).alias("segment"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("value_cents"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "segment",
            "n_events",
            (F.col("value_cents") / F.lit(100.0)).alias("value_total"),
        )
    )


def stream_enriched_rollup(
    spark,
    source_dir: str,
    dim_parquet: str,
    sink_dir: str,
    checkpoint_dir: str,
    window: str = "1 hour",
    watermark: str = "2 hours",
    available_now: bool = True,
):
    """File-source → broadcast static-dim join → windowed per-segment
    rollup → parquet append sink."""
    stream = (
        spark.readStream.schema(EVENT_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", 8)
        .json(source_dir)
    )
    dims = spark.read.parquet(dim_parquet)
    rolled = enriched_rollup(stream, dims, window=window,
                             watermark=watermark)
    writer = (
        rolled.writeStream.outputMode("append")
        .format("parquet")
        .option("path", sink_dir)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_distinct_sketch(
    spark,
    source_dir: str,
    register_dir: str,
    checkpoint_dir: str,
    key_col: str = "user_id",
    available_now: bool = True,
):
    """Streaming HLL maintenance: per micro-batch, append that batch's
    (event_type, bucket, m_reg) registers to a parquet register LOG;
    the live estimate max-merges the log (``sketch_estimate``).

    Why append-a-log instead of rewriting a register table in place:
    register merge is ``max`` — idempotent and commutative — so a
    re-delivered or retried micro-batch appends rows that change
    NOTHING when folded. Exactly-once state maintenance falls out of
    the algebra instead of the sink's transaction machinery, and the
    log compacts at leisure (max-merge + rewrite) without pausing
    ingest. Per batch the appended state is ≤ groups × 64 rows no
    matter how many events streamed through.
    """
    from etl_validator_github_spark.scale.sketches import hll_registers

    stream = (
        spark.readStream.schema(EVENT_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", 8)
        .json(source_dir)
    )

    def _append_registers(batch_df: DataFrame, batch_id: int) -> None:
        hll_registers(batch_df, "event_type", key_col).write.mode(
            "append"
        ).parquet(register_dir)

    writer = stream.writeStream.foreachBatch(_append_registers).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def _merged_registers(spark, register_dir: str) -> DataFrame:
    from pyspark.sql import functions as F2

    log = spark.read.parquet(register_dir)
    return log.groupBy("grp", "bucket").agg(F2.max("m_reg").alias("m_reg"))


def sketch_estimate(spark, register_dir: str) -> DataFrame:
    """Current distinct estimate from the streamed register log:
    max-merge per (grp, bucket), then the standard fold. Columns:
    grp, v_zero, sum_pow, n_est."""
    from etl_validator_github_spark.scale.sketches import fold_registers

    return fold_registers(_merged_registers(spark, register_dir))


def profile_registers(df: DataFrame, spec) -> DataFrame:
    """Per-column HLL registers in ONE pass: stack unpivots the
    profiled columns to (grp=column_name, pkey=value-as-string) — the
    same rows-×-k mid-plan shape the batch profile's exact
    multi-distinct compiles to — nulls drop (distinct counts exclude
    them), and the standard register builder hash-aggs the rest."""
    from etl_validator_github_spark.scale.sketches import hll_registers

    parts = ", ".join(f"'{n}', cast(`{n}` as string)" for n, _ in spec)
    kv = df.selectExpr(
        f"stack({len(spec)}, {parts}) AS (grp, pkey)"
    ).filter("pkey IS NOT NULL")
    return hll_registers(kv, "grp", "pkey")


def stream_table_profile(
    spark,
    source_dir: str,
    schema: str,
    spec,
    profile_dir: str,
    register_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
):
    """Streaming per-column table profile — the validator's
    schema/quality-drift primitive maintained incrementally over an
    unbounded feed, with every piece of state MERGEABLE:

    - null counts and row counts SUM-merge → not idempotent, so each
      append is stamped with batch_id and the read side dedups
      redelivered batches (the ``stream_cms_counters`` convention);
    - min/max MIN/MAX-merge → idempotent;
    - distinct counts cannot merge exactly without per-key state, so
      the stream maintains the HLL register log instead (idempotent
      max merge, ≤ columns × 64 rows per batch — the
      ``stream_distinct_sketch`` convention) and the report carries
      the estimate.

    ``spec`` is the (column, kind) tuple the batch
    ``queries/relational.py::table_profile`` takes; the batch operator
    runs inside each micro-batch, so batch/stream parity is by
    construction (pinned in tests/test_streaming_events.py).
    """
    from etl_validator_github_spark.queries.relational import table_profile

    stream = (
        spark.readStream.schema(schema)
        .option("recursiveFileLookup", "true")
        .option("maxFilesPerTrigger", 8)
        .parquet(source_dir)
    )

    def _append(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.persist()
        try:
            n = batch_df.count()
            (
                table_profile(batch_df, spec)
                .withColumn("n_rows", F.lit(n))
                .withColumn("batch_id", F.lit(batch_id))
                .write.mode("append").parquet(profile_dir)
            )
            profile_registers(batch_df, spec).write.mode("append").parquet(
                register_dir
            )
        finally:
            batch_df.unpersist()

    writer = stream.writeStream.foreachBatch(_append).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def profile_report(spark, profile_dir: str, register_dir: str) -> DataFrame:
    """Fold the streamed profile + register logs to the live
    per-column profile: (column_name, n_rows, n_nulls, n_distinct_est,
    min_num, max_num, min_str, max_str).

    Duplicate appends of one (batch_id, column_name) carry identical
    values, so the dedup stage may take MAX of each field; the
    register fold needs no dedup at all (max merge is idempotent)."""
    from etl_validator_github_spark.scale.sketches import fold_registers

    log = spark.read.parquet(profile_dir)
    once = log.groupBy("batch_id", "column_name").agg(
        *[F.max(c).alias(c) for c in
          ("n_rows", "n_nulls", "min_num", "max_num", "min_str", "max_str")]
    )
    merged = once.groupBy("column_name").agg(
        F.sum("n_rows").alias("n_rows"),
        F.sum("n_nulls").alias("n_nulls"),
        F.min("min_num").alias("min_num"),
        F.max("max_num").alias("max_num"),
        F.min("min_str").alias("min_str"),
        F.max("max_str").alias("max_str"),
    )
    est = fold_registers(_merged_registers(spark, register_dir))
    return (
        merged.join(
            est.select(F.col("grp").alias("column_name"),
                       F.col("n_est").alias("n_distinct_est")),
            "column_name", "left")
        .select("column_name", "n_rows", "n_nulls", "n_distinct_est",
                "min_num", "max_num", "min_str", "max_str")
    )


def compact_registers(spark, register_dir: str) -> int:
    """Collapse the append-only register log to one max-merged
    generation, in place. Compaction IS the merge operator — max per
    (grp, bucket) — so it can run any time without coordinating with
    ingest appends beyond the swap; estimates before and after are
    identical by the merge algebra. Returns the compacted row count.

    The swap is write-aside + replace (the same pattern as
    `sources/io.py::compact_parquet`): never read-and-overwrite the
    same path in one job. The compacted generation is staged NEXT TO
    ``register_dir`` (same filesystem, so the swap is two atomic
    renames, not a copy), and the live log is renamed aside before the
    new generation renames in — a crash at any point leaves a complete
    generation on disk (live, or staged, or aside) rather than losing
    sketch state between an rmtree and a move.
    """
    import os
    import shutil
    import uuid

    merged = _merged_registers(spark, register_dir)
    suffix = uuid.uuid4().hex[:8]
    parent = os.path.dirname(os.path.abspath(register_dir))
    staged = os.path.join(parent, f".hllcompact-staged-{suffix}")
    aside = os.path.join(parent, f".hllcompact-old-{suffix}")
    merged.coalesce(1).write.parquet(staged)
    n = spark.read.parquet(staged).count()
    os.rename(register_dir, aside)   # live → aside (atomic)
    os.rename(staged, register_dir)  # staged → live (atomic)
    shutil.rmtree(aside)             # delete old generation LAST
    return n


#: Attribution lookback: a click joins views by the same user within
#: the preceding this-many seconds.
CLICK_VIEW_LOOKBACK_S = 600


def click_view_attribution(
    clicks: DataFrame,
    views: DataFrame,
    lookback_s: int = CLICK_VIEW_LOOKBACK_S,
    watermark: str = "1 hour",
    join_type: str = "inner",
) -> DataFrame:
    """Stream-stream inner join: each click paired with same-user views
    in the preceding ``lookback_s`` seconds.

    Both sides carry an event-time watermark and the join condition
    bounds view_time to a closed range around click_time — together
    they let Spark evict buffered rows once the watermark passes
    ``click_time`` (view side) / ``click_time + lookback`` (click
    side), so join state is bounded by (rate × (watermark + lookback)),
    not stream lifetime. Inner-join matches emit as soon as both rows
    have arrived; input rows older than the watermark are dropped —
    the late-arrival case the tests pin. The batch twin is the
    events_range_join catalog query (same predicate shape on the
    static table).

    ``join_type="leftOuter"`` adds the unmatched-click rows (null view
    columns): an outer result can only be emitted once the watermark
    proves no matching view can still arrive, so those rows surface in
    a LATER micro-batch than their click — the delayed-null semantics
    the outer-join test pins.
    """
    c = (
        clicks.select(
            F.col("event_id").alias("click_id"),
            "user_id",
            F.timestamp_seconds("ts_s").alias("click_time"),
        )
        .withWatermark("click_time", watermark)
    )
    v = (
        views.select(
            F.col("event_id").alias("view_id"),
            F.col("user_id").alias("view_user"),
            F.timestamp_seconds("ts_s").alias("view_time"),
        )
        .withWatermark("view_time", watermark)
    )
    cond = F.expr(
        "user_id = view_user "
        f"AND view_time >= click_time - INTERVAL {int(lookback_s)} SECOND "
        "AND view_time <= click_time"
    )
    return c.join(v, cond, join_type).select(
        "click_id", "view_id", "user_id", "click_time", "view_time",
        (F.unix_timestamp("click_time") - F.unix_timestamp("view_time"))
        .alias("lag_s"),
    )


def stream_click_view_join(
    spark,
    clicks_dir: str,
    views_dir: str,
    sink_dir: str,
    checkpoint_dir: str,
    lookback_s: int = CLICK_VIEW_LOOKBACK_S,
    watermark: str = "1 hour",
    join_type: str = "inner",
    available_now: bool = True,
):
    """Two file sources → watermarked stream-stream join → parquet sink."""

    def src(d: str) -> DataFrame:
        return (
            spark.readStream.schema(EVENT_STREAM_SCHEMA)
            .option("maxFilesPerTrigger", 8)
            .json(d)
        )

    joined = click_view_attribution(
        src(clicks_dir), src(views_dir),
        lookback_s=lookback_s, watermark=watermark, join_type=join_type,
    )
    writer = (
        joined.writeStream.outputMode("append")
        .format("parquet")
        .option("path", sink_dir)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def session_rollup(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Event-time session windows per user via the NATIVE
    ``F.session_window`` operator — the streaming payoff of the
    batch-proved `events_session_windows` query: merge logic and
    state eviction come from the engine (a session's state drops as
    soon as the watermark passes its end), instead of the hand-rolled
    ``applyInPandasWithState`` bookkeeping in streaming/sessions.py.
    Both live side by side on purpose: the custom op shows the
    arbitrary-state API, this shows the declarative path Spark can
    optimize."""
    with_ts = events.withColumn("event_time", F.timestamp_seconds("ts_s"))
    return (
        with_ts.withWatermark("event_time", watermark)
        .groupBy(F.session_window("event_time", gap).alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_events"),
            F.sum(F.round(F.col("value") * 100).cast("long"))
            .alias("value_cents"),
        )
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "user_id", "n_events", "value_cents",
        )
    )


def stream_session_rollup(
    spark,
    source_dir: str,
    sink_dir: str,
    checkpoint_dir: str,
    gap: str = "30 minutes",
    watermark: str = "1 hour",
    available_now: bool = True,
):
    """File-source → native session-window rollup → parquet append sink.
    Append mode emits a session only once the watermark passes its end
    — the exactly-once finalized-sessions feed."""
    stream = (
        spark.readStream.schema(EVENT_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", 8)
        .json(source_dir)
    )
    rolled = session_rollup(stream, gap=gap, watermark=watermark)
    writer = (
        rolled.writeStream.outputMode("append")
        .format("parquet")
        .option("path", sink_dir)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_windowed_rollup(
    spark,
    source_dir: str,
    sink_dir: str,
    checkpoint_dir: str,
    window: str = "1 hour",
    watermark: str = "2 hours",
    available_now: bool = True,
):
    """File-source → watermarked window rollup → parquet append sink."""
    stream = (
        spark.readStream.schema(EVENT_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", 8)
        .json(source_dir)
    )
    rolled = windowed_rollup(stream, window=window, watermark=watermark)
    writer = (
        rolled.writeStream.outputMode("append")
        .format("parquet")
        .option("path", sink_dir)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_expectations_monitor(
    spark,
    source_dir: str,
    schema: str,
    checks,
    report_dir: str,
    checkpoint_dir: str,
    fmt: str = "json",
    available_now: bool = True,
):
    """Continuous data-quality gate: every micro-batch runs the
    declarative expectation suite (operators/expectations.py — the
    whole suite is ONE aggregation job per batch) and appends one row
    per check, stamped with batch_id.

    Only ROW-LEVEL checks are accepted: their (n_rows, n_violations)
    counters SUM-merge across batches, so the cumulative report is a
    read-side fold (``read_expectations_report``) with the batch_id
    redelivery dedup. Uniqueness is deliberately REJECTED here — it is
    a global property with no mergeable exact form (the same algebra
    boundary stream_table_profile documents; its HLL register log is
    the streaming answer for distinctness).
    """
    from etl_validator_github_spark.operators.expectations import (
        run_expectations,
    )

    if any(c.unique for c in checks):
        raise ValueError(
            "unique() checks don't SUM-merge across micro-batches; "
            "use stream_table_profile's HLL distinct log instead"
        )

    reader = spark.readStream.schema(schema).option(
        "recursiveFileLookup", "true"
    ).option("maxFilesPerTrigger", 8)
    stream = getattr(reader, fmt)(source_dir)

    def _gate(batch_df, batch_id: int) -> None:
        run_expectations(batch_df, checks).withColumn(
            "batch_id", F.lit(batch_id)
        ).write.mode("append").parquet(report_dir)

    writer = stream.writeStream.foreachBatch(_gate).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_expectations_report(spark, report_dir: str) -> DataFrame:
    """Cumulative per-check totals from the monitor log: dedup
    redelivered batches by (batch_id, check) max, then SUM — exactly
    the stream_cms_counters merge discipline."""
    log = spark.read.parquet(report_dir)
    once = log.groupBy("batch_id", "check", "column").agg(
        F.max("n_rows").alias("n_rows"),
        F.max("n_violations").alias("n_violations"),
    )
    return (
        once.groupBy("check", "column")
        .agg(
            F.sum("n_rows").cast("long").alias("n_rows"),
            F.sum("n_violations").cast("long").alias("n_violations"),
        )
        .withColumn(
            "violation_ppm",
            F.expr("cast((1000000 * n_violations) div n_rows as int)"),
        )
    )
