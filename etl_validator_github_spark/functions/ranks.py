"""Exact global ranks and running sums WITHOUT a single-partition sort.

``Window.orderBy(...)`` with no (or a low-cardinality) partition spec
funnels every input row through one task — fine over a tiny aggregate,
a scale-killer over anything that grows with the data. This module is
the shared scale-safe replacement: the classic two-pass zipWithIndex
decomposition expressed in DataFrame terms.

How it works (for rows totally ordered by ``order_cols`` within each
``by`` group):

1. ``repartitionByRange(n, *by, *order_cols)`` — Spark's range
   partitioner samples the sort key and splits the rows into ``n``
   BALANCED, range-contiguous partitions (no single task ever holds
   the whole input). The frame is pinned with the repo's standard lazy
   ``localCheckpoint`` barrier so every consumer below sees the SAME
   physical partitioning (partition ids must agree across branches —
   AQE may otherwise re-plan them per branch).
2. A window partitioned by ``(by, partition_id)`` assigns local
   row numbers / running sums — each window partition is one range
   partition's slice of one group, so the sort is fully parallel.
3. Per-``(by, partition_id)`` counts (and sums) form a TINY side table
   (groups × partitions rows); the exclusive prefix over earlier
   partition ids is a broadcast inequality self-join over it (the same
   bounded-fold pattern as the skyline bucket table).
4. global rank = local row number + earlier-partition count offset
   (and likewise for running sums), via one broadcast join back.

The result is bit-identical to ``row_number() OVER (PARTITION BY by
ORDER BY order_cols)`` — the order must be TOTAL within each group
(tie-break with a unique key, per the repo's determinism contract),
otherwise ranks at partition boundaries are nondeterministic.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["global_row_number"]


def _as_columns(cols: Sequence[Column | str]) -> list[Column]:
    return [F.col(c) if isinstance(c, str) else c for c in cols]


def global_row_number(
    df: DataFrame,
    order_cols: Sequence[Column | str],
    *,
    by: Sequence[str] = (),
    rank_col: str = "rnk",
    cumsum: dict[str, str] | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """``row_number()`` (and optional running ``sum``s) over a total
    order, computed with range-partitioned parallelism instead of a
    single-partition sort.

    ``order_cols`` may include ``F.desc(...)`` expressions and MUST be
    a total order within each ``by`` group. ``cumsum`` maps output
    column name -> input column name for inclusive running sums over
    the same order. Output keeps every input column and appends
    ``rank_col`` (int) plus the ``cumsum`` columns (input type's sum).
    """
    cumsum = cumsum or {}
    spark = df.sparkSession
    n = int(
        num_partitions
        or spark.conf.get("spark.sql.shuffle.partitions", "200")
    )
    parts = list(by)
    order = _as_columns(order_cols)
    # Step 1: balanced range partitions + pinned partition ids.
    ranged = (
        df.repartitionByRange(n, *_as_columns(parts), *order)
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=False)
    )
    # Step 2: local window (one range-slice of one group per task).
    w = Window.partitionBy(*parts, "_pid").orderBy(*order)
    w_run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    local = ranged.withColumn("_lrn", F.row_number().over(w))
    for out, src in cumsum.items():
        local = local.withColumn(f"_lcs_{out}", F.sum(src).over(w_run))
    # Step 3: tiny per-(group, pid) totals → exclusive prefix offsets
    # via a broadcast inequality self-join (bounded: groups × n rows).
    gstats = ranged.groupBy(*parts, "_pid").agg(
        F.count(F.lit(1)).alias("_gc"),
        *[F.sum(src).alias(f"_gs_{out}") for out, src in cumsum.items()],
    )
    right = gstats.select(
        *[F.col(c).alias(f"_r_{c}") for c in parts],
        F.col("_pid").alias("_rpid"),
        F.col("_gc").alias("_rgc"),
        *[F.col(f"_gs_{out}").alias(f"_rgs_{out}") for out in cumsum],
    )
    cond = F.col("_rpid") < F.col("_pid")
    for c in parts:
        cond = cond & F.col(c).eqNullSafe(F.col(f"_r_{c}"))
    offs = (
        gstats.join(F.broadcast(right), cond, "left")
        .groupBy(*parts, "_pid")
        .agg(
            F.coalesce(F.sum("_rgc"), F.lit(0)).alias("_off_c"),
            *[
                F.coalesce(F.sum(f"_rgs_{out}"), F.lit(0))
                .alias(f"_off_{out}")
                for out in cumsum
            ],
        )
    )
    # Step 4: broadcast the offsets back and finalize.
    out_df = local.join(F.broadcast(offs), [*parts, "_pid"]).withColumn(
        rank_col, (F.col("_lrn") + F.col("_off_c")).cast("int")
    )
    for out in cumsum:
        out_df = out_df.withColumn(
            out, F.col(f"_lcs_{out}") + F.col(f"_off_{out}")
        )
    drop = ["_pid", "_lrn", "_off_c"]
    drop += [f"_lcs_{out}" for out in cumsum]
    drop += [f"_off_{out}" for out in cumsum]
    return out_df.drop(*drop)
