"""Exact-integer distribution-comparison statistics.

The two-sample Kolmogorov–Smirnov statistic between per-group value
histograms and a fixed reference histogram — the drift metric behind
both the batch scorecard (``events_hourly_ks_drift``,
queries/relational.py) and the streaming monitor
(streaming/drift.py::stream_value_drift). One shared core so the
backfill and the monitor can never disagree.

Everything follows the catalog's determinism contract: values are
pre-quantized integers (cents), counts are exact, the KS ratio is a
single 128-bit div/mod-decomposed division per group AFTER the max
(all |cum_l·n_r − cum_r·n_l| share the denominator n_l·n_r, so
max-then-divide equals divide-then-max).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def ks_vs_reference(
    counts: DataFrame,
    ref: DataFrame,
    group_cols: list[str],
    counts_within_ref: bool = False,
) -> DataFrame:
    """Exact discrete KS per group against a reference histogram.

    ``counts``: ``group_cols`` + ``v`` (integer value grid) + ``n``.
    ``ref``: ``v`` + ``n_ref`` — the reference histogram, assumed
    SMALL relative to the data (domain-bounded: distinct quantized
    values, not rows) and broadcast per group.

    Returns one row per group: ``n_window`` (group total), ``n_ref``
    (reference total), ``ks_micro`` = floor(10⁶ · max|F̂_g − F̂_ref|).

    Scale shape: the merged value axis is a UNION + re-aggregate
    (never a full-outer join — those can't broadcast); cumulative
    counts run under windows partitioned BY GROUP, so the sort
    parallelism is the group count and no task sees more than one
    group's value axis.

    ``counts_within_ref=True`` (r13): when the caller GUARANTEES every
    ``counts`` value appears in ``ref`` (true whenever ref is the
    histogram of a superset of the same data, e.g. the hourly backfill
    whose reference is the global histogram), the dense
    groups × ref-domain grid is skipped entirely and the statistic is
    evaluated only at each group's OWN change points: within a stretch
    between consecutive group values the group CDF is constant and the
    reference CDF monotone, so |cum_l·n_r − cum_r·n_l| is monotone
    there and its maximum sits at a stretch endpoint — both of which
    are evaluated (the value itself, and "just before" the value via
    the lagged cum_l and cum_r − n_ref). Work drops from
    O(|groups| · |ref domain|) to O(|counts| + |ref|) with the SAME
    exact integer result (pinned by test_ks_sparse_equals_dense and
    the unchanged DuckDB oracle, which still computes the dense grid).
    """
    if counts_within_ref:
        return _ks_sparse(counts, ref, group_cols)
    counts = counts.localCheckpoint(eager=False)  # groups + union share
    groups = counts.select(*group_cols).distinct()
    # Documented bounded fold: |groups| × |ref domain| (distinct
    # quantized values, not rows) — the reference side broadcasts.
    ref_per_group = groups.crossJoin(F.broadcast(ref))
    merged = (
        counts.select(
            *group_cols, "v",
            F.col("n").cast("long").alias("c_l"),
            F.lit(0).cast("long").alias("c_r"),
        )
        .unionByName(
            ref_per_group.select(
                *group_cols, "v",
                F.lit(0).cast("long").alias("c_l"),
                F.col("n_ref").cast("long").alias("c_r"),
            )
        )
        .groupBy(*group_cols, "v")
        .agg(F.sum("c_l").alias("c_l"), F.sum("c_r").alias("c_r"))
    )
    w_cum = (
        Window.partitionBy(*group_cols).orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy(*group_cols)
    cum = (
        merged.withColumn("cum_l", F.sum("c_l").over(w_cum))
        .withColumn("cum_r", F.sum("c_r").over(w_cum))
        .withColumn("n_l", F.sum("c_l").over(w_all))
        .withColumn("n_r", F.sum("c_r").over(w_all))
    )
    dmax = (
        cum.select(
            *group_cols,
            F.col("n_l").cast("long").alias("n_window"),
            F.col("n_r").cast("long").alias("n_ref"),
            F.expr(
                "abs(CAST(cum_l AS DECIMAL(38,0)) * n_r"
                " - CAST(cum_r AS DECIMAL(38,0)) * n_l)"
            ).alias("d"),
        )
        .groupBy(*group_cols, "n_window", "n_ref")
        .agg(F.max("d").alias("num"))
    )
    return (
        dmax.withColumn(
            "den",
            F.expr("CAST(n_window AS DECIMAL(38,0))"
                   " * CAST(n_ref AS DECIMAL(38,0))"),
        )
        .select(
            *group_cols, "n_window", "n_ref",
            F.expr("(num div den) * 1000000"
                   " + ((num % den) * 1000000) div den")
            .cast("long").alias("ks_micro"),
        )
    )


def _ks_sparse(
    counts: DataFrame,
    ref: DataFrame,
    group_cols: list[str],
) -> DataFrame:
    """Exact KS evaluated only at each group's own value points —
    requires every counts value to exist in ref (see ks_vs_reference).

    The reference cumulative runs once over the (domain-bounded) ref
    table and broadcasts onto the counts rows; per group, candidate
    a = |cum_l·n_r − cum_r·n_l| covers the point itself and candidate
    b = |(cum_l−n)·n_r − (cum_r−n_ref)·n_l| covers the supremum over
    the open stretch before it (group CDF still at its previous level,
    reference CDF one ref-bin below). The stretch after the last group
    value decays monotonically to 0, so it is dominated by its start,
    which candidate a of the last value already covers.
    """
    w_ref = (
        Window.orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ref_cum = (
        ref.select("v", F.col("n_ref").cast("long").alias("nr"))
        .withColumn("cum_r", F.sum("nr").over(w_ref))
    )
    ref_tot = ref.agg(F.sum("n_ref").cast("long").alias("n_r"))
    w_cum = (
        Window.partitionBy(*group_cols).orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy(*group_cols)
    # LEFT join + loud premise check (ADVICE r13): an inner join would
    # silently DROP any counts value absent from ref, corrupting both
    # n_window and ks_micro. The guard costs nothing when the premise
    # holds (cum_r is non-null on every row) and fails the job with a
    # clear message when a caller passes counts_within_ref=True
    # wrongly. It rides the cum_r read, so column pruning can't elide
    # it.
    cum_r_checked = F.when(
        F.col("cum_r").isNull(),
        F.raise_error(F.concat(
            F.lit("ks_vs_reference(counts_within_ref=True): counts "
                  "value v="),
            F.col("v").cast("string"),
            F.lit(" is missing from the reference — the premise is "
                  "violated; call with counts_within_ref=False"),
        )).cast("long"),
    ).otherwise(F.col("cum_r"))
    cum = (
        counts.join(F.broadcast(ref_cum), "v", "left")
        .withColumn("cum_r", cum_r_checked)
        .withColumn("cum_l", F.sum("n").over(w_cum).cast("long"))
        .withColumn("n_l", F.sum("n").over(w_all).cast("long"))
        .crossJoin(F.broadcast(ref_tot))  # documented 1-row fold
    )
    d = F.greatest(
        F.expr(
            "abs(CAST(cum_l AS DECIMAL(38,0)) * n_r"
            " - CAST(cum_r AS DECIMAL(38,0)) * n_l)"
        ),
        F.expr(
            "abs(CAST(cum_l - n AS DECIMAL(38,0)) * n_r"
            " - CAST(cum_r - nr AS DECIMAL(38,0)) * n_l)"
        ),
    )
    dmax = (
        cum.select(
            *group_cols,
            F.col("n_l").alias("n_window"),
            F.col("n_r").alias("n_ref"),
            d.alias("d"),
        )
        .groupBy(*group_cols, "n_window", "n_ref")
        .agg(F.max("d").alias("num"))
    )
    return (
        dmax.withColumn(
            "den",
            F.expr("CAST(n_window AS DECIMAL(38,0))"
                   " * CAST(n_ref AS DECIMAL(38,0))"),
        )
        .select(
            *group_cols, "n_window", "n_ref",
            F.expr("(num div den) * 1000000"
                   " + ((num % den) * 1000000) div den")
            .cast("long").alias("ks_micro"),
        )
    )
