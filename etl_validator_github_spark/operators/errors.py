"""Error-record model and pipe-CSV error sink.

Output schema mirrors the reference's Glue error file:
``FILENAME|PayeeId|ERROR_DESC`` with multiple violations comma-joined into
one ERROR_DESC string (evidence:
test_output/invalid_values_20260310_142509/.../mtfdm_dev2_dmbankerrorfile_20260310_142832.csv,
parsed by DM_bankfile_validate_pipeline.py:833-867).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_validator_github_spark.operators.validate import ERRORS_COL

ERROR_FILE_COLUMNS = ("FILENAME", "PayeeId", "ERROR_DESC")


def to_error_records(
    failing_df: DataFrame,
    filename: str | None = None,
    errors_col: str = ERRORS_COL,
) -> DataFrame:
    """(failing rows + error array) -> FILENAME|PayeeId|ERROR_DESC records.

    One output row per failing payee record; messages joined with ', '
    in deterministic catalog order. FILENAME defaults to the source file
    of each row (input_file_name), matching the reference's error files
    which carry the originating bank-file name.
    """
    fname = (
        F.lit(filename)
        if filename is not None
        else F.element_at(F.split(F.input_file_name(), "/"), -1)
    )
    return failing_df.select(
        fname.alias("FILENAME"),
        F.col("PayeeID").alias("PayeeId"),
        F.concat_ws(", ", F.col(errors_col)).alias("ERROR_DESC"),
    )


def aggregate_errors_by_payee(error_records: DataFrame) -> DataFrame:
    """Per-payee error aggregation (A1): PayeeId -> sorted distinct tokens.

    Shuffles once on PayeeId. Payee IDs are near-unique in bank files, so
    skew is not expected; if a pathological key appears, AQE's skew-join
    handling covers the join side and the aggregation is already partial
    (map-side combine) before the exchange.
    """
    return (
        error_records.select(
            "PayeeId",
            F.explode(F.split("ERROR_DESC", ",")).alias("token"),
        )
        .select("PayeeId", F.trim(F.regexp_replace("token", r"\s+", " ")).alias("token"))
        .filter(F.length("token") > 0)
        .groupBy("PayeeId")
        .agg(F.sort_array(F.collect_set("token")).alias("error_tokens"))
    )


def write_error_csv(
    error_records: DataFrame,
    path: str,
    single_file: bool = True,
    partition_by: list[str] | None = None,
) -> None:
    """Pipe-delimited error CSV sink.

    ``single_file=True`` mirrors the reference's one-CSV-per-run semantics
    (mtfdm_{env}_dmbankerrorfile_{ts}.csv) via coalesce(1) — correct for
    per-batch error files which are small relative to input. At the 100 TB
    design point pass ``single_file=False`` with ``partition_by`` (e.g.
    batch/date columns, SURVEY §4) so the sink lays out
    ``path/col=value/part-*.csv`` and downstream reads prune partitions.
    """
    cols = list(ERROR_FILE_COLUMNS) + [
        c for c in (partition_by or []) if c not in ERROR_FILE_COLUMNS
    ]
    out = error_records.select(*cols)
    if single_file and not partition_by:
        out = out.coalesce(1)
    writer = out.write.mode("overwrite").option("header", True).option("sep", "|")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.csv(path)
