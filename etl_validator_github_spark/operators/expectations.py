"""Declarative table expectations — the Great-Expectations-shaped
surface, built on the rule engine's principle (operators/rules.py):
compile EVERY check into ONE pass instead of one job per check.

Row-level checks (not_null / in_set / between / matches) become
conditional counters inside a single hash-aggregate — a map-only scan
no matter how many checks. Uniqueness is the one check that genuinely
needs a shuffle (exact distinct count); it rides the same aggregate via
count_distinct, so N checks still cost one job.

Output is one row per check: (check, column, n_rows, n_violations,
violation_ppm) — the post-load gate a lakehouse runs instead of the
constraints it can't enforce (star_schema_fk_audit covers the
cross-table edges; this covers the in-table invariants).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Check:
    """One expectation: ``violated`` must be a boolean Column that is
    True on rows violating the check (NULL-safe — write the predicate
    so NULLs land on the intended side)."""

    name: str
    column: str
    violated: Column | None = field(default=None, compare=False)
    #: set for uniqueness checks instead of ``violated``
    unique: bool = False


def expect_not_null(col: str) -> Check:
    return Check(f"not_null({col})", col, F.col(col).isNull())


def expect_unique(col: str) -> Check:
    return Check(f"unique({col})", col, unique=True)


def expect_in_set(col: str, values: tuple) -> Check:
    # NULL is not "in set": treat as violation, same as GE's default.
    return Check(
        f"in_set({col})", col,
        ~F.coalesce(F.col(col).isin(*values), F.lit(False)),
    )


def expect_between(col: str, lo, hi) -> Check:
    return Check(
        f"between({col})", col,
        ~F.coalesce(
            (F.col(col) >= F.lit(lo)) & (F.col(col) <= F.lit(hi)),
            F.lit(False),
        ),
    )


def expect_matches(col: str, pattern: str) -> Check:
    return Check(
        f"matches({col})", col,
        ~F.coalesce(F.col(col).rlike(pattern), F.lit(False)),
    )


def run_expectations(df: DataFrame, checks: list[Check]) -> DataFrame:
    """All checks in ONE aggregation job; one output row per check."""
    aggs = [F.count(F.lit(1)).alias("__n_rows")]
    for i, c in enumerate(checks):
        if c.unique:
            aggs.append(
                F.count_distinct(F.col(c.column)).alias(f"__d_{i}")
            )
            # distinct() drops NULL keys; count nulls separately so a
            # NULL key counts as non-unique rather than vanishing.
            aggs.append(
                F.sum(F.col(c.column).isNull().cast("long"))
                .alias(f"__nn_{i}")
            )
        else:
            aggs.append(
                F.sum(c.violated.cast("long")).alias(f"__v_{i}")
            )
    agg = df.agg(*aggs)

    # Fan the 1-row aggregate out to one row PER CHECK via a single
    # explode — a union of per-check selects would re-derive the
    # aggregate subtree once per branch (observed: one scan per check).
    entries = []
    for i, c in enumerate(checks):
        if c.unique:
            # violations = rows beyond one per distinct value, with
            # NULL counting as one value (count_distinct skips NULLs,
            # so add its slot back when any exist).
            viol = (
                F.col("__n_rows") - F.col(f"__d_{i}")
                - F.when(F.col(f"__nn_{i}") > 0, F.lit(1))
                .otherwise(F.lit(0))
            )
        else:
            viol = F.col(f"__v_{i}")
        entries.append(F.struct(
            F.lit(c.name).alias("check"),
            F.lit(c.column).alias("column"),
            F.col("__n_rows").cast("long").alias("n_rows"),
            viol.cast("long").alias("n_violations"),
        ))
    return (
        agg.select(F.explode(F.array(*entries)).alias("e"))
        .select("e.*")
        # 0-row input: violation counters are vacuously 0 and the ppm
        # denominator is 0 — guard the div (ANSI Spark raises
        # DIVIDE_BY_ZERO, non-ANSI yields NULL; make it NULL in both,
        # callers decide what an empty-table gate means — cli._cmd_expect
        # fails it explicitly).
        .withColumn("n_violations", F.coalesce("n_violations", F.lit(0)))
        .withColumn(
            "violation_ppm",
            F.expr("cast(if(n_rows = 0, NULL,"
                   " (1000000 * n_violations) div n_rows) as int)"),
        )
    )
