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


def _has_decimal(t) -> bool:
    """Recurse through nested Arrow types looking for any decimal."""
    if pa.types.is_decimal(t):
        return True
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return _has_decimal(t.value_type)
    if pa.types.is_struct(t):
        return any(_has_decimal(f.type) for f in t)
    if pa.types.is_map(t):
        return _has_decimal(t.key_type) or _has_decimal(t.item_type)
    return False


@pytest.mark.parametrize("name", sorted(CATALOG))
def test_no_decimal_in_final_schema(spark, name):
    """The contract.py decimal-free rule, pinned catalog-wide: no
    query's FINAL schema may contain DecimalType (the driver's value
    hasher canonicalizes Spark DECIMAL(38,0) and DuckDB HUGEINT
    differently above int64 range — r11's only red row). Internal
    decimal accumulation is fine; outputs must be cast to STRING (or
    fit BIGINT). Schema-only: no action is triggered."""
    sdf = CATALOG[name].build(spark, SF_DIR)
    offending = [
        f.name for f in sdf.schema.fields
        if _has_decimal(to_arrow_type(f.dataType))
    ]
    assert not offending, (
        f"{name}: DecimalType in final schema columns {offending} — "
        "emit CAST(x AS STRING) on both engine sides (contract.py)"
    )
