"""Bucketed co-located joins (plans/bucketing.py): after paying one
shuffle at write time, joins on the bucket key must run with NO exchange
on either side — asserted from the physical plan with broadcast disabled
so the shuffle-free property is what's actually proven.
"""

from __future__ import annotations

import pytest

from etl_validator_github_spark.plans.bucketing import co_located_join, save_bucketed
from etl_validator_github_spark.plans.session import explain_str


@pytest.fixture()
def bucketed_tables(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet").withColumnRenamed(
        "c_custkey", "o_custkey"
    )
    save_bucketed(orders, "b_orders", "o_custkey", n_buckets=8)
    save_bucketed(cust, "b_customer", "o_custkey", n_buckets=8)
    yield "b_orders", "b_customer"
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_customer")


def test_bucketed_join_is_shuffle_free(spark, bucketed_tables):
    left, right = bucketed_tables
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = co_located_join(spark, left, right, "o_custkey")
        p = explain_str(joined)
        assert "SortMergeJoin" in p
        assert "Exchange" not in p, "bucketed join must not shuffle"
        # And it computes the right thing.
        assert joined.count() == spark.table(left).count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_aggregation_is_shuffle_free(spark, bucketed_tables):
    left, _ = bucketed_tables
    agg = spark.table(left).groupBy("o_custkey").count()
    p = explain_str(agg)
    assert "Exchange" not in p, "aggregation on the bucket key must not shuffle"
