"""Cross-engine *type* parity for every oracle in the catalog.

The driver's value hash is typed: identical values with different
physical types (DuckDB HUGEINT vs Spark BIGINT) hash-mismatch even
though a Python ``==`` comparison passes. q12_priority_by_status
regressed exactly this way in round 1 (uncast ``SUM(CASE…)`` → int128).

This test executes each DuckDB oracle in full at sf0.001 (cheap at that
scale), pulls the result's Arrow schema, does the same for the Spark
plan (schema only — no action), canonicalizes representation-only
differences (large_string vs string, large_list vs list, timestamp
unit/zone), and asserts column-by-column equality. Any oracle whose
integer aggregate is left uncast fails here before it ever reaches the
driver.
"""

from __future__ import annotations

import pyarrow as pa
import pytest
from pyspark.sql.pandas.types import to_arrow_type

from etl_validator_github_spark.queries import CATALOG

from conftest import ORACLE_NAMES, SF_DIR


def _canon(t: pa.DataType):
    """Collapse representation-only Arrow differences to one canonical form.

    Integer *width* (int32 vs int64) is driver-tolerated (string_functions
    shipped int32-vs-int64 and hash-matched in round 1), but DuckDB
    HUGEINT surfaces as Arrow decimal128(38,0) and is NOT tolerated —
    so integers collapse to "int" while decimals stay distinct.
    """
    if pa.types.is_integer(t):
        return "int"
    if pa.types.is_large_string(t) or pa.types.is_string(t):
        return "string"
    if pa.types.is_large_list(t) or pa.types.is_list(t):
        return ("list", _canon(t.value_type))
    if pa.types.is_timestamp(t):
        return "timestamp"  # unit/zone are driver-normalized
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_decimal(t):
        return ("decimal", t.precision, t.scale)
    return str(t)


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_oracle_dtypes_match_spark(spark, duck, name):
    q = CATALOG[name]
    sdf = q.build(spark, SF_DIR)  # plan only — no action
    spark_types = {f.name: _canon(to_arrow_type(f.dataType)) for f in sdf.schema.fields}

    duck_schema = duck.execute(q.oracle).arrow().schema
    duck_types = {f.name: _canon(f.type) for f in duck_schema}

    assert set(spark_types) == set(duck_types), (
        f"{name}: column sets differ {sorted(spark_types)} vs {sorted(duck_types)}"
    )
    for col in spark_types:
        assert spark_types[col] == duck_types[col], (
            f"{name}.{col}: spark={spark_types[col]} duck={duck_types[col]} "
            "(uncast integer aggregate? DuckDB SUM → HUGEINT needs "
            "CAST(... AS BIGINT) in the oracle SQL)"
        )
