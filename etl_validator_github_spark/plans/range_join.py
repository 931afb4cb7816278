"""Grid-bucketed range (interval) join.

Spark has no range-join operator: ``points JOIN intervals ON p BETWEEN
lo AND hi`` plans as a BroadcastNestedLoopJoin (O(|points| × |intervals|)
comparisons) — fine for a handful of intervals, fatal at scale. The
scale-out re-expression is the standard grid-bucketing trick:

- points map to ONE grid bucket: ``floor(p / width)``;
- each interval explodes to EVERY bucket it overlaps:
  ``sequence(floor(lo / width), floor(hi / width))``;
- the join becomes an equi-join on the bucket key (hash join, shuffle or
  broadcast — Catalyst's choice) with the exact ``BETWEEN`` folded into
  the join condition, so outer semantics stay correct (an unmatched
  point null-extends exactly once instead of being dropped by a
  post-join filter).

Work is O(|points| + Σ interval-spans + true-match candidates). Pick
``bucket_width`` near the median interval length: too small explodes the
interval side, too large degrades candidate selectivity.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

BUCKET_COL = "__range_bucket"
_P_BUCKET = "__range_bucket_p"
_I_BUCKET = "__range_bucket_i"

#: Join types whose semantics survive the interval-side bucket explode.
#: right/full would null-extend a never-matched interval once PER bucket
#: row it exploded into — silently duplicated rows — so they are refused.
_SUPPORTED_HOW = frozenset(
    {"inner", "cross", "left", "leftouter", "left_outer", "semi",
     "leftsemi", "left_semi", "anti", "leftanti", "left_anti"}
)


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
    semantics; the internal bucket columns are dropped from the result.

    ``how`` accepts inner and the left-side family (left outer, semi,
    anti): a point maps to exactly one bucket, so left rows match each
    interval at most once and unmatched left rows null-extend exactly
    once. right/full are rejected — the interval side is exploded to one
    row per overlapped bucket, so outer semantics on that side would
    duplicate unmatched intervals.
    """
    if how.lower().replace("_", "") not in {
        h.replace("_", "") for h in _SUPPORTED_HOW
    }:
        raise ValueError(
            f"bucketed_range_join: how={how!r} is not supported; the "
            "interval side is bucket-exploded, so right/full outer "
            "semantics would duplicate unmatched intervals. Use inner, "
            "left, left_semi, or left_anti (swap sides for right-ish "
            "semantics)."
        )
    p = points.withColumn(_P_BUCKET, _bucket(F.col(point_col), bucket_width))
    iv = intervals.withColumn(
        _I_BUCKET,
        F.explode(
            F.sequence(
                _bucket(F.col(lo_col), bucket_width),
                _bucket(F.col(hi_col), bucket_width),
            )
        ),
    )
    cond = (F.col(_P_BUCKET) == F.col(_I_BUCKET)) & F.col(point_col).between(
        F.col(lo_col), F.col(hi_col)
    )
    joined = p.join(iv, cond, how)
    drop = [c for c in (_P_BUCKET, _I_BUCKET) if c in joined.columns]
    return joined.drop(*drop)
