"""Multi-dimensional data layout: Z-order (Morton) clustering.

The 100 TB problem this solves: parquet skips row groups via min/max
statistics, but a table sorted by column A has useless stats for
column B — every row group spans B's whole range, so a B-predicate
scans everything. Interleaving the bits of A and B into one Morton key
and sorting by THAT bounds every row group in BOTH dimensions: a range
predicate on either column prunes most row groups (the technique
behind Delta/Iceberg `OPTIMIZE ZORDER BY`; public method, Morton 1966).

The key is pure integer bit arithmetic (shift/and/or), identical in
any engine — the same cross-engine determinism contract as the rest of
the repo (`contract.py`). tests/test_layout.py measures the claim
directly: it writes the same rows x-sorted and z-ordered, reads the
parquet row-group statistics back through pyarrow, and counts how many
row groups a y-range predicate could skip under each layout.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Bits interleaved per dimension (16 + 16 → a 32-bit Morton key).
ZORDER_BITS = 16


def zorder_key(a: Column | str, b: Column | str,
               bits: int = ZORDER_BITS) -> Column:
    """Morton key of two non-negative ints: bit i of ``a`` lands at
    position 2i, bit i of ``b`` at 2i+1. Values must fit in ``bits``
    bits (callers bucket/clamp first); the expression is a flat sum of
    shift/and terms — whole-stage-codegen friendly, no UDF."""
    ca = F.col(a) if isinstance(a, str) else a
    cb = F.col(b) if isinstance(b, str) else b
    parts = []
    for i in range(bits):
        parts.append(
            F.shiftleft(F.shiftright(ca.cast("long"), i).bitwiseAND(1), 2 * i)
        )
        parts.append(
            F.shiftleft(F.shiftright(cb.cast("long"), i).bitwiseAND(1),
                        2 * i + 1)
        )
    out = parts[0]
    for p in parts[1:]:
        out = out + p
    return out


def write_zordered(df: DataFrame, path: str, col_a: str, col_b: str,
                   n_files: int = 8, bits: int = ZORDER_BITS) -> None:
    """Write ``df`` clustered by the Morton key of (col_a, col_b):
    range-partition on the key (so files tile the Z-curve) and sort
    within partitions (so row groups inside each file tile it too).
    One shuffle — the same cost as any global sort-write — after which
    every future range scan on EITHER column prunes."""
    keyed = df.withColumn("__z", zorder_key(col_a, col_b, bits))
    (
        keyed.repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )
