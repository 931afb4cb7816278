"""functions/ranks.py — exact global ranks without a global sort.

Pins bit-identity against the plain global-window formulation (the
thing the helper replaces) on grouped and ungrouped inputs, running
sums, desc orders, ties broken by unique key, and the plan property
that no SinglePartition exchange appears anywhere.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from etl_validator_github_spark.functions.ranks import global_row_number


def _frame(spark, n=2000):
    rows = [(i, f"g{i % 3}", (i * 37) % 101, (i * 53) % 7)
            for i in range(n)]
    return spark.createDataFrame(
        rows, "id long, grp string, v long, s long")


def test_matches_global_window_rank_and_cumsum(spark):
    df = _frame(spark)
    got = global_row_number(
        df, [F.desc("v"), F.asc("id")], rank_col="rnk",
        cumsum={"cum_s": "s"}, num_partitions=7,
    )
    w = Window.orderBy(F.desc("v"), F.asc("id"))
    want = (
        df.withColumn("rnk", F.row_number().over(w))
        .withColumn("cum_s", F.sum("s").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    )
    g = {r.id: (r.rnk, r.cum_s) for r in got.collect()}
    e = {r.id: (r.rnk, r.cum_s) for r in want.collect()}
    assert g == e


def test_matches_grouped_window_rank(spark):
    df = _frame(spark)
    got = global_row_number(
        df, ["v", "id"], by=["grp"], rank_col="i", num_partitions=5)
    w = Window.partitionBy("grp").orderBy("v", "id")
    want = df.withColumn("i", F.row_number().over(w))
    assert ({r.id: r.i for r in got.collect()}
            == {r.id: r.i for r in want.collect()})


def test_ties_broken_by_unique_key_are_deterministic(spark):
    # many duplicate v values: rank must follow the id tie-break
    rows = [(i, 5, 1) for i in range(400)]
    df = spark.createDataFrame(rows, "id long, v long, s long")
    got = sorted(
        (r.id, r.rnk)
        for r in global_row_number(
            df, ["v", "id"], rank_col="rnk", num_partitions=6).collect()
    )
    assert got == [(i, i + 1) for i in range(400)]


def test_plan_has_no_single_partition_exchange(spark):
    df = _frame(spark)
    got = global_row_number(df, [F.desc("v"), F.asc("id")])
    p = got._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in p, p
    # the local window is partitioned by the pinned range-partition id
    assert "_pid" in p


def test_empty_and_single_row_inputs(spark):
    empty = spark.createDataFrame([], "id long, v long")
    assert global_row_number(empty, ["v", "id"]).count() == 0
    one = spark.createDataFrame([(1, 9)], "id long, v long")
    [r] = global_row_number(one, ["v", "id"], rank_col="rnk").collect()
    assert r.rnk == 1
