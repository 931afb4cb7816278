"""Streaming validation: the Spark-idiomatic form of the reference's
polling file-watch (DM_bankfile_validate_pipeline.py:1550-1588).

A Structured Streaming file source watches the ready directory; each
discovered bank file flows through the same single-projection rule
evaluation and lands in the error sink via foreachBatch. No watermarks or
stateful operators are needed (SURVEY §2.11) — the workload is stateless
per-file validation. ``trigger(availableNow=True)`` gives catch-up-and-
stop semantics; omit it for a resident watcher.
"""

from __future__ import annotations

import datetime as dt
import json
import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from etl_validator_github_spark.operators.errors import to_error_records
from etl_validator_github_spark.operators.rules import Rule
from etl_validator_github_spark.operators.validate import ERRORS_COL, with_errors
from etl_validator_github_spark.schema import bankdata_schema


class BatchGuard:
    """Two-strikes circuit breaker for the streaming sink — the Spark
    analogue of the reference's pre-upload gate guard
    (DM_bankfile_validate_pipeline.py:93-176): consecutive downstream
    failures accumulate in a JSON state file; at ``threshold`` strikes a
    STOP flag file is written and every later batch is refused until an
    operator clears it (or a batch succeeds after a manual reset).

    File-based on purpose: the flag survives driver restarts (like the
    reference's flag surviving test-runner restarts) and is visible to
    operators as a plain file. With foreachBatch + checkpointing, a
    refused batch is NOT committed, so processing resumes exactly there
    once the flag is cleared — no data loss, exactly-once preserved.
    """

    def __init__(self, guard_dir: str, threshold: int = 2) -> None:
        self.guard_dir = guard_dir
        self.threshold = threshold
        self.state_file = os.path.join(guard_dir, "batch_guard_state.json")
        self.stop_file = os.path.join(guard_dir, "STOP_PROCESSING.flag")

    def tripped(self) -> bool:
        return os.path.exists(self.stop_file)

    def _read(self) -> dict:
        state = {"consecutive_failures": 0, "last_reason": "", "updated_at": ""}
        try:
            with open(self.state_file, encoding="utf-8") as f:
                loaded = json.load(f)
        except FileNotFoundError:
            return state
        except ValueError as exc:
            # Fail CLOSED: corrupt strike state must not silently reset
            # the counter (that would let a crashed guard forget a
            # strike and never trip at the documented threshold).
            raise RuntimeError(
                f"corrupt batch-guard state at {self.state_file}; "
                "refusing to guess the strike count — repair or delete "
                "the file"
            ) from exc
        if isinstance(loaded, dict):
            state.update(loaded)
        return state

    def _write(self, state: dict) -> None:
        # Atomic replace: a crash mid-write must never leave a
        # truncated state file (see the fail-closed read above).
        os.makedirs(self.guard_dir, exist_ok=True)
        tmp = self.state_file + ".tmp"
        with open(tmp, "w", encoding="utf-8") as f:
            json.dump(state, f, indent=2)
        os.replace(tmp, self.state_file)

    def record_success(self) -> None:
        self._write({
            "consecutive_failures": 0,
            "last_reason": "",
            "updated_at": dt.datetime.now(dt.timezone.utc).isoformat(),
        })
        if os.path.exists(self.stop_file):
            os.remove(self.stop_file)

    def record_failure(self, reason: str) -> int:
        state = self._read()
        consecutive = int(state.get("consecutive_failures", 0)) + 1
        now_iso = dt.datetime.now(dt.timezone.utc).isoformat()
        state.update({
            "consecutive_failures": consecutive,
            "last_reason": str(reason),
            "updated_at": now_iso,
        })
        self._write(state)
        if consecutive >= self.threshold:
            os.makedirs(self.guard_dir, exist_ok=True)
            with open(self.stop_file, "w", encoding="utf-8") as f:
                f.write(
                    f"{consecutive} consecutive batch failures; refusing "
                    f"further batches. Last reason: {reason}\n"
                    f"UpdatedAtUtc: {now_iso}\n"
                )
        return consecutive

    def refuse_if_tripped(self) -> None:
        # Read-then-raise tolerates an operator clearing the flag
        # between the exists() check and the open (the refusal must not
        # turn into a FileNotFoundError).
        try:
            with open(self.stop_file, encoding="utf-8") as f:
                detail = f.read().strip()
        except FileNotFoundError:
            return
        raise RuntimeError(
            f"batch refused: circuit breaker tripped ({self.stop_file}). "
            f"{detail}"
        )


def stream_validate(
    spark: SparkSession,
    ready_dir: str,
    error_dir: str,
    checkpoint_dir: str,
    rules: list[Rule] | None = None,
    schema=None,
    available_now: bool = True,
    on_batch: Callable[[DataFrame, int], None] | None = None,
    guard: BatchGuard | None = None,
    reconcile: Callable[[DataFrame, int], bool] | None = None,
) -> StreamingQuery:
    """Watch ``ready_dir`` for parquet bank files; emit pipe-CSV errors.

    At scale this runs continuously on the cluster: file listing is
    incremental (maxFilesPerTrigger bounds batch size), validation is
    map-only, and the error sink appends partitioned CSV. The checkpoint
    directory provides exactly-once file processing — the durable
    equivalent of the reference's ready-folder bookkeeping.

    ``guard``/``reconcile`` wire in the two-strikes circuit breaker
    (reference PIPE:93-176): each batch's outputs are checked by
    ``reconcile`` (return False = unreconciled); after ``threshold``
    consecutive failures the guard trips and the NEXT batch is refused
    before any write happens — the streaming equivalent of the
    reference's stop-testing flag halting uploads.
    """
    stream = (
        spark.readStream.schema(schema or bankdata_schema(dates_as_strings=True))
        # Bank files land either as single .parquet files (the reference's
        # layout) or as Spark output directories; recurse to find leaves.
        .option("recursiveFileLookup", "true")
        .option("maxFilesPerTrigger", 16)
        .parquet(ready_dir)
    )

    validated = with_errors(stream, rules)
    failing = validated.filter(F.size(ERRORS_COL) > 0)
    errors = to_error_records(failing)

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        if guard is not None:
            guard.refuse_if_tripped()
        batch_df.write.mode("append").option("header", True).option("sep", "|").csv(
            error_dir
        )
        if on_batch is not None:
            on_batch(batch_df, batch_id)
        if guard is not None and reconcile is not None:
            if reconcile(batch_df, batch_id):
                guard.record_success()
            else:
                guard.record_failure(f"batch {batch_id} unreconciled")

    writer = errors.writeStream.foreachBatch(_sink).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
