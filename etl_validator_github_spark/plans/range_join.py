"""Grid-bucketed range (interval) join.

Spark has no range-join operator: ``points JOIN intervals ON p BETWEEN
lo AND hi`` plans as a BroadcastNestedLoopJoin (O(|points| × |intervals|)
comparisons) — fine for a handful of intervals, fatal at scale. The
scale-out re-expression is the standard grid-bucketing trick:

- points map to ONE grid bucket: ``floor(p / width)``;
- each interval explodes to EVERY bucket it overlaps:
  ``sequence(floor(lo / width), floor(hi / width))``;
- the join becomes an equi-join on the bucket key (hash join, shuffle or
  broadcast — Catalyst's choice), with the exact ``BETWEEN`` kept as a
  post-join filter.

Work is O(|points| + Σ interval-spans + true-match candidates). Pick
``bucket_width`` near the median interval length: too small explodes the
interval side, too large degrades candidate selectivity.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

BUCKET_COL = "__range_bucket"


def _bucket(c: Column, width: float) -> Column:
    return F.floor(c / F.lit(width)).cast("long")


def bucketed_range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    bucket_width: float,
    how: str = "inner",
) -> DataFrame:
    """Join rows of ``points`` to rows of ``intervals`` where
    ``lo_col <= point_col <= hi_col`` (bounds inclusive), via a grid-
    bucket equi-join. Column sets must be disjoint apart from the join
    semantics; the internal bucket column is dropped from the result.
    """
    p = points.withColumn(BUCKET_COL, _bucket(F.col(point_col), bucket_width))
    iv = intervals.withColumn(
        BUCKET_COL,
        F.explode(
            F.sequence(
                _bucket(F.col(lo_col), bucket_width),
                _bucket(F.col(hi_col), bucket_width),
            )
        ),
    )
    joined = p.join(iv, BUCKET_COL, how).filter(
        F.col(point_col).between(F.col(lo_col), F.col(hi_col))
    )
    return joined.drop(BUCKET_COL)
