"""Custom stateful streaming operator: gap-based session tracking with
``applyInPandasWithState``.

This is the pattern for operators Spark's built-ins can't express: state
(the open session per user) lives in the state store keyed by user_id,
each micro-batch's events fold into it Arrow-batch-at-a-time, and a
session is emitted exactly once — when a gap closes it. The batch twin
is queries/relational.py::events_sessionize; this form handles unbounded
streams where sessions span micro-batches.

Scale note: state is partitioned by the groupBy key (user_id), so it
shards across executors; per-key state is O(1) (three longs). A
production deployment adds a timeout (GroupStateTimeout) to flush idle
sessions; kept explicit-gap-only here for determinism in tests.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from etl_validator_github_spark.streaming.events import EVENT_STREAM_SCHEMA

SESSION_OUTPUT_SCHEMA = (
    "user_id long, session_start long, session_end long, n_events long"
)
SESSION_STATE_SCHEMA = "last_ts long, start_ts long, n long"

DEFAULT_GAP_S = 1800


def _session_fn(gap_s: int):
    def update(
        key: tuple,
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.exists:
            last_ts, start_ts, n = state.get
        else:
            last_ts, start_ts, n = None, None, 0

        closed: list[tuple] = []
        for pdf in pdfs:
            for ts in sorted(int(t) for t in pdf["ts_s"]):
                if last_ts is not None and ts - last_ts > gap_s:
                    closed.append((user_id, start_ts, last_ts, n))
                    start_ts, n = ts, 0
                if start_ts is None:
                    start_ts = ts
                n += 1
                last_ts = ts

        state.update((last_ts, start_ts, n))
        if closed:
            yield pd.DataFrame(
                closed,
                columns=["user_id", "session_start", "session_end", "n_events"],
            )

    return update


def sessionize_stream(events, gap_s: int = DEFAULT_GAP_S):
    """events stream → closed-session records (append, stateful)."""
    return events.groupBy("user_id").applyInPandasWithState(
        _session_fn(gap_s),
        outputStructType=SESSION_OUTPUT_SCHEMA,
        stateStructType=SESSION_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stream_sessionize(
    spark,
    source_dir: str,
    sink_dir: str,
    checkpoint_dir: str,
    gap_s: int = DEFAULT_GAP_S,
    available_now: bool = True,
):
    """File source → stateful sessionizer → parquet append sink."""
    stream = (
        spark.readStream.schema(EVENT_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(source_dir)
    )
    sessions = sessionize_stream(stream, gap_s=gap_s)
    writer = (
        sessions.writeStream.outputMode("append")
        .format("parquet")
        .option("path", sink_dir)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
