"""Z-order layout (plans/layout.py): the Morton key must be correct
bit math, and the clustered write must actually produce row groups
that parquet statistics can prune in BOTH dimensions — measured from
the files' own metadata, not asserted by construction."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from etl_validator_github_spark.plans.layout import (
    write_zordered,
    zorder_key,
)


def _py_morton(a: int, b: int, bits: int = 16) -> int:
    out = 0
    for i in range(bits):
        out |= ((a >> i) & 1) << (2 * i)
        out |= ((b >> i) & 1) << (2 * i + 1)
    return out


def test_zorder_key_matches_pure_python(spark):
    rows = [(0, 0), (1, 0), (0, 1), (3, 5), (1023, 1), (777, 888),
            (65535, 65535)]
    df = spark.createDataFrame(rows, "a long, b long").withColumn(
        "z", zorder_key("a", "b")
    )
    got = {(r["a"], r["b"]): r["z"] for r in df.collect()}
    for a, b in rows:
        assert got[(a, b)] == _py_morton(a, b), (a, b)


def _skippable_fraction(path: str, col: str, lo: int, hi: int) -> float:
    """Fraction of row groups whose [min, max] stats are disjoint from
    [lo, hi] — exactly what a stats-based reader skips."""
    total = skippable = 0
    for f in glob.glob(f"{path}/*.parquet"):
        md = pq.ParquetFile(f).metadata
        idx = md.schema.to_arrow_schema().get_field_index(col)
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            total += 1
            if st.max < lo or st.min > hi:
                skippable += 1
    assert total > 0
    return skippable / total


def test_zordered_layout_prunes_both_dimensions(spark, tmp_path):
    """Same rows, two layouts: x-sorted prunes x-predicates but not
    y-predicates; z-ordered prunes BOTH. Measured from the written
    files' row-group min/max statistics."""
    n, side = 40_000, 1024
    # Deterministic scatter over a side×side grid: x and y come from
    # DISJOINT md5 hex digits, so they are independent (two linear
    # functions of id mod side would be perfectly correlated and make
    # any single-column sort accidentally prune both).
    df = spark.range(n).select(
        F.expr("cast(conv(substring(md5(cast(id as string)), 1, 4), 16, 10) "
               f"as bigint) % {side}").alias("x"),
        F.expr("cast(conv(substring(md5(cast(id as string)), 5, 4), 16, 10) "
               f"as bigint) % {side}").alias("y"),
        F.col("id").alias("payload"),
    )
    xsorted, zordered = str(tmp_path / "xsorted"), str(tmp_path / "zorder")
    (
        df.repartitionByRange(32, "x").sortWithinPartitions("x")
        .write.mode("overwrite").parquet(xsorted)
    )
    write_zordered(df, zordered, "x", "y", n_files=32, bits=10)

    # Narrow y-band predicate: y in [0, 31] — 1/32 of the domain.
    y_x = _skippable_fraction(xsorted, "y", 0, 31)
    y_z = _skippable_fraction(zordered, "y", 0, 31)
    # x-sorted layout can prune essentially nothing on y.
    assert y_x < 0.1, y_x
    # z-order must prune most row groups on y (expected ~7/8 with a
    # 5-bit Morton prefix per file: the top interleaved bits pin y to
    # an eighth and x to a quarter of the domain per tile).
    assert y_z > 0.7, y_z

    # And x-predicates must still prune under z-order (the trade:
    # slightly worse than a pure x-sort, far better than nothing —
    # expected ~3/4).
    x_z = _skippable_fraction(zordered, "x", 0, 31)
    assert x_z > 0.6, x_z

    # Layouts hold identical data.
    a = spark.read.parquet(xsorted).agg(F.sum("payload")).collect()[0][0]
    b = spark.read.parquet(zordered).agg(F.sum("payload")).collect()[0][0]
    assert a == b == n * (n - 1) // 2


def test_compaction_reduces_files_and_preserves_data(spark, tmp_path):
    """compact_parquet with order_by: a fragmented 64-file directory
    rewrites to the byte-sized file count, rows identical, and the
    output is RE-CLUSTERED — each file covers a disjoint key range."""
    from etl_validator_github_spark.sources.io import compact_parquet

    src, dst = str(tmp_path / "frag"), str(tmp_path / "compact")
    df = spark.range(20_000).selectExpr(
        "id", "id % 97 as k", "repeat('x', 50) as pad"
    )
    df.repartition(64).write.parquet(src)

    stats = compact_parquet(spark, src, dst, order_by="id")
    assert stats.files_before == 64
    assert stats.files_after < 8
    back = spark.read.parquet(dst)
    assert stats.rows == 20_000 and back.count() == 20_000
    assert back.selectExpr("sum(id) s").first()["s"] == \
        df.selectExpr("sum(id) s").first()["s"]

    # order_by clustering: per-file id ranges must not overlap.
    import os
    import pyarrow.parquet as pq
    ranges = []
    for root, _, names in os.walk(dst):
        for f in names:
            if f.endswith(".parquet") and not f.startswith(("_", ".")):
                md = pq.ParquetFile(os.path.join(root, f)).metadata
                lo = min(md.row_group(i).column(0).statistics.min
                         for i in range(md.num_row_groups))
                hi = max(md.row_group(i).column(0).statistics.max
                         for i in range(md.num_row_groups))
                ranges.append((lo, hi))
    ranges.sort()
    for (l1, h1), (l2, h2) in zip(ranges, ranges[1:]):
        assert h1 <= l2, ranges
