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

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from etl_validator_github_spark.operators.errors import to_error_records
from etl_validator_github_spark.operators.rules import Rule
from etl_validator_github_spark.operators.validate import ERRORS_COL, with_errors
from etl_validator_github_spark.schema import bankdata_schema


def stream_validate(
    spark: SparkSession,
    ready_dir: str,
    error_dir: str,
    checkpoint_dir: str,
    rules: list[Rule] | None = None,
    schema=None,
    available_now: bool = True,
    on_batch: Callable[[DataFrame, int], None] | None = None,
) -> StreamingQuery:
    """Watch ``ready_dir`` for parquet bank files; emit pipe-CSV errors.

    At scale this runs continuously on the cluster: file listing is
    incremental (maxFilesPerTrigger bounds batch size), validation is
    map-only, and the error sink appends partitioned CSV. The checkpoint
    directory provides exactly-once file processing — the durable
    equivalent of the reference's ready-folder bookkeeping.
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
        batch_df.write.mode("append").option("header", True).option("sep", "|").csv(
            error_dir
        )
        if on_batch is not None:
            on_batch(batch_df, batch_id)

    writer = errors.writeStream.foreachBatch(_sink).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
