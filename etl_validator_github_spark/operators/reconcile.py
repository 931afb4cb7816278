"""CSV <-> DB error reconciliation (SURVEY.md §2.4 J3, §2.7 T1/T2, §2.5 A4).

Re-expresses ``compare_csv_and_db_error_desc``
(DM_bankfile_validate_pipeline.py:932-967) as DataFrame joins:

- per-payee ERROR_DESC strings are split on ',', whitespace-normalized and
  compared as unordered token sets (PIPE:817-830);
- ``missing_in_db``  = payees in the CSV with no DB row   -> FATAL
- ``missing_in_csv`` = payees in the DB with no CSV row   -> reported, non-fatal
- ``mismatched``     = payees whose CSV token set is NOT a subset of the
  DB token set (CSV ⊆ DB passes)                           -> FATAL
- count match (A4): total CSV data rows == DB error count  -> FATAL

The asymmetry (CSV ⊆ DB, DB-only payees tolerated) is deliberate and
matches PIPE:953-966.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def error_tokens(df: DataFrame, payee_col: str, desc_col: str) -> DataFrame:
    """payee -> array of normalized distinct error tokens."""
    return (
        df.select(
            F.col(payee_col).alias("payee_id"),
            F.explode(F.split(F.col(desc_col), ",")).alias("token"),
        )
        .select(
            "payee_id",
            F.trim(F.regexp_replace("token", r"\s+", " ")).alias("token"),
        )
        .filter(F.length("token") > 0)
        .groupBy("payee_id")
        .agg(F.sort_array(F.collect_set("token")).alias("tokens"))
    )


@dataclass
class ReconcileResult:
    matched: DataFrame
    mismatched: DataFrame
    missing_in_db: DataFrame
    missing_in_csv: DataFrame
    csv_count: int
    db_count: int

    @property
    def counts_match(self) -> bool:
        return self.csv_count == self.db_count

    @property
    def passed(self) -> bool:
        # missing_in_csv is reported but non-fatal (PIPE:966).
        return (
            self.counts_match
            and self.mismatched.isEmpty()
            and self.missing_in_db.isEmpty()
        )


def reconcile_errors(
    csv_errors: DataFrame,
    db_errors: DataFrame,
    csv_payee_col: str = "PayeeId",
    csv_desc_col: str = "ERROR_DESC",
    db_payee_col: str = "PAYEE_ID",
    db_desc_col: str = "ERROR_DESC",
) -> ReconcileResult:
    """Full reconciliation between the error-CSV side and the DB side.

    One shuffle per side (token aggregation), one join on payee_id. Error
    sets are tiny relative to input data, so the join comfortably
    broadcasts under AQE at any realistic scale.
    """
    csv_tok = error_tokens(csv_errors, csv_payee_col, csv_desc_col).alias("c")
    db_tok = error_tokens(db_errors, db_payee_col, db_desc_col).alias("d")

    joined = csv_tok.join(db_tok, on="payee_id", how="full_outer").select(
        "payee_id",
        F.col("c.tokens").alias("csv_tokens"),
        F.col("d.tokens").alias("db_tokens"),
    )
    missing_in_db = joined.filter(
        F.col("db_tokens").isNull() & F.col("csv_tokens").isNotNull()
    ).select("payee_id", "csv_tokens")
    missing_in_csv = joined.filter(
        F.col("csv_tokens").isNull() & F.col("db_tokens").isNotNull()
    ).select("payee_id", "db_tokens")
    both = joined.filter(
        F.col("csv_tokens").isNotNull() & F.col("db_tokens").isNotNull()
    )
    # CSV ⊆ DB passes (PIPE:953-956): only CSV-side extras are a mismatch.
    extras = F.array_except("csv_tokens", "db_tokens")
    mismatched = both.filter(F.size(extras) > 0).withColumn("csv_only_tokens", extras)
    matched = both.filter(F.size(extras) == 0)

    return ReconcileResult(
        matched=matched,
        mismatched=mismatched,
        missing_in_db=missing_in_db,
        missing_in_csv=missing_in_csv,
        csv_count=csv_errors.count(),
        db_count=db_errors.count(),
    )
