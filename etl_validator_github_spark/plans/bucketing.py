"""Bucketing utilities: pre-shuffle once, join forever without shuffles.

The reference has no physical layer; on Spark the equivalent of its
"co-located" lookups at 100 TB is bucketed tables: both sides are
written pre-hashed into the same number of buckets on the join key, so
every subsequent equi-join or aggregation on that key runs with NO
exchange — the single biggest shuffle saving available to a recurring
pipeline (e.g. nightly bank-file batches joined against a payee master).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def save_bucketed(
    df: DataFrame,
    table: str,
    key: str | list[str],
    n_buckets: int = 32,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed+sorted managed table on ``key``.

    Pays one shuffle at write time; joins/aggregations on ``key`` between
    tables bucketed with the same ``n_buckets`` are then exchange-free.
    """
    keys = [key] if isinstance(key, str) else key
    (
        df.write.mode(mode)
        .bucketBy(n_buckets, *keys)
        .sortBy(*keys)
        .format("parquet")
        .saveAsTable(table)
    )


def co_located_join(
    spark: SparkSession, left_table: str, right_table: str, key: str | list[str],
    how: str = "inner",
) -> DataFrame:
    """Join two same-bucketed tables on their bucket key (no shuffle)."""
    return spark.table(left_table).join(
        spark.table(right_table), on=key, how=how
    )
