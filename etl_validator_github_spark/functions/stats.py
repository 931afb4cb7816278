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
    """
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
