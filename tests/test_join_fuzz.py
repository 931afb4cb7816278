"""Property-based cross-checks of the custom join operators.

The grid-bucketed range join and the union+window as-of join re-express
semantics Spark lacks natively; each is fuzzed against an independent
reference implementation (naive cross-join filter; pandas merge_asof)
so a bucketing boundary or tie-ordering bug can't survive."""

from __future__ import annotations

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from etl_validator_github_spark.plans.range_join import bucketed_range_join

_slow = settings(
    max_examples=12,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# Quarter-steps exercise bucket boundaries exactly (floats are exact).
_point = st.integers(min_value=-40, max_value=120).map(lambda i: i / 4.0)


@_slow
@given(
    points=st.lists(_point, min_size=1, max_size=20),
    spans=st.lists(st.tuples(_point, st.integers(0, 40)), min_size=1, max_size=8),
    width=st.sampled_from([0.25, 1.0, 3.0, 7.5]),
)
def test_range_join_matches_naive_cross_join(spark, points, spans, width):
    pdf = spark.createDataFrame(
        [(i, p) for i, p in enumerate(points)], "pid: long, p: double"
    )
    idf = spark.createDataFrame(
        [(i, lo, lo + w / 4.0) for i, (lo, w) in enumerate(spans)],
        "iid: long, lo: double, hi: double",
    )
    got = sorted(
        (r.pid, r.iid)
        for r in bucketed_range_join(pdf, idf, "p", "lo", "hi", width).collect()
    )
    naive = sorted(
        (r.pid, r.iid)
        for r in pdf.crossJoin(idf).filter("p BETWEEN lo AND hi").collect()
    )
    assert got == naive


@_slow
@given(
    events=st.lists(
        st.tuples(
            st.integers(0, 3),        # user_id
            st.integers(0, 50),       # ts
            st.booleans(),            # is purchase?
        ),
        min_size=1,
        max_size=30,
    ),
)
def test_asof_join_matches_pandas_merge_asof(spark, events):
    rows = [
        (i, int(ts) * 1000, int(uid), "purchase" if is_p else "click", 0.0, "{}")
        for i, (uid, ts, is_p) in enumerate(events)
    ]
    # Mirror the engine's load_events contract: ts as epoch-nanos BIGINT.
    df = spark.createDataFrame(
        rows,
        "event_id: long, ts: long, user_id: long, event_type: string, "
        "value: double, props: string",
    )

    # Drive the same dataflow the catalog query uses, but on the fuzz df.
    ev = df.withColumn("ts_us", F.expr("ts div 1000"))
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts_us")
        .agg(F.max("event_id").alias("event_id"))
        .select("user_id", "ts_us", "event_id", F.lit(0).alias("is_p"))
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts_us", "event_id", F.lit(1).alias("is_p")
    )
    from pyspark.sql import Window

    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us", "is_p", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    click_only = lambda c: F.when(F.col("is_p") == 0, c)  # noqa: E731
    tagged = (
        clicks.unionAll(purchases)
        .withColumn("last_click_id",
                    F.last(click_only(F.col("event_id")), ignorenulls=True).over(w))
    )
    got = {
        r.event_id: r.last_click_id
        for r in tagged.filter(F.col("is_p") == 1).collect()
    }

    # pandas reference: merge_asof per user on the deduped click side.
    pdf = pd.DataFrame(
        [(i, int(ts), int(uid), bool(is_p))
         for i, (uid, ts, is_p) in enumerate(events)],
        columns=["event_id", "ts", "user_id", "is_p"],
    )
    clicks_pd = (
        pdf[~pdf.is_p].groupby(["user_id", "ts"], as_index=False)["event_id"]
        .max().rename(columns={"event_id": "click_id"})
    )
    purch_pd = pdf[pdf.is_p].sort_values("ts", kind="stable")
    if clicks_pd.empty:
        expected = {int(e): None for e in purch_pd.event_id}
    else:
        merged = pd.merge_asof(
            purch_pd,
            clicks_pd.sort_values("ts", kind="stable"),
            on="ts", by="user_id", direction="backward",
        )
        expected = {
            int(r.event_id): (None if pd.isna(r.click_id) else int(r.click_id))
            for r in merged.itertuples()
        }
    assert got == expected
