"""Grouped-map ``applyInPandas``: the fourth Pandas API surface.

The repo's UDF matrix is deliberately minimal — scalar ``pandas_udf``
(scale/text.py), ``mapInPandas`` (the multimodal codecs), and
``applyInPandasWithState`` (streaming sessions) each demonstrate one
sanctioned escape hatch. This module adds the remaining one, plain
grouped-map ``applyInPandas``, with the use-case that actually
justifies it: a PER-GROUP DYNAMIC PROGRAM. Longest-increasing-
subsequence needs the patience-sorting DP over the group's ordered
history — each step depends on an evolving per-prefix state, which is
exactly what one-pass SQL windows cannot express and what recursive
SQL can only express by enumerating exponentially many chains. (That
is also why this operator is pinned by a pure-Python mirror test
rather than a DuckDB oracle — the catalog keeps its 100% oracle
coverage for everything SQL can state.)

Scale shape: one shuffle on user_id; per-group work is O(n log n) in
the group's own history length inside an Arrow batch. The LIS of a
user's value stream is a real curation/analytics primitive (monotone
engagement-run length — how long a user's spend kept strictly
climbing).
"""

from __future__ import annotations

from bisect import bisect_left

from pyspark.sql import DataFrame
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StructField,
    StructType,
)

LIS_SCHEMA = StructType([
    StructField("user_id", LongType()),
    StructField("n_events", IntegerType()),
    StructField("lis_len", IntegerType()),
])


def lis_length(values: "list[int]") -> int:
    """Patience-sorting LIS (strictly increasing), O(n log n)."""
    tails: list[int] = []
    for v in values:
        i = bisect_left(tails, v)
        if i == len(tails):
            tails.append(v)
        else:
            tails[i] = v
    return len(tails)


def user_lis_report(events: DataFrame) -> DataFrame:
    """Per user: event count and the longest STRICTLY increasing run
    (subsequence, not contiguous) of value-cents over time order
    (ts_us, event_id) — grouped-map applyInPandas, one user_id
    shuffle."""
    import pandas as pd
    from pyspark.sql import functions as F

    def per_user(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values(["ts_us", "event_id"])
        return pd.DataFrame({
            "user_id": pdf["user_id"].iloc[:1],
            "n_events": pd.Series([len(pdf)], dtype="int32"),
            "lis_len": pd.Series(
                [lis_length(list(pdf["c"]))], dtype="int32"),
        })

    prepared = events.select(
        "user_id", "ts_us", "event_id",
        F.round(F.col("value") * 100).cast("long").alias("c"),
    )
    return prepared.groupBy("user_id").applyInPandas(per_user, LIS_SCHEMA)
