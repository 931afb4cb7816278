"""Local mirror of the driver's correctness gate.

Runs every CATALOG query at sf0.001 on Spark AND its DuckDB oracle, then
compares row count, column names, and values (columns sorted by name,
rows sorted by all columns) — the same shape of check the driver records
in CORRECTNESS_r{N}.json, so a failure here predicts a driver failure.
"""

from __future__ import annotations

import math

import pytest

from etl_validator_github_spark.queries import CATALOG

from conftest import ORACLE_NAMES, SF_DIR


def _norm(v):
    # Exact comparison by design (integer-quantized aggregates; see
    # contract.py). NaN normalized so tuples stay comparable.
    if isinstance(v, float) and math.isnan(v):
        return "NaN"
    return v


def _rows(schema_names, rows):
    order = sorted(range(len(schema_names)), key=lambda i: schema_names[i])
    out = [tuple(_norm(r[i]) for i in order) for r in rows]
    # None-safe total order (NULLs sort first, typed by repr).
    return sorted(out, key=lambda t: tuple((v is None, repr(v)) for v in t))


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_query_matches_oracle(spark, duck, name):
    q = CATALOG[name]
    sdf = q.build(spark, SF_DIR)
    spark_rows = [tuple(r) for r in sdf.collect()]
    spark_cols = sdf.columns

    res = duck.execute(q.oracle)
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column mismatch {spark_cols} vs {duck_cols}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count {len(spark_rows)} vs {len(duck_rows)}"
    )
    left, right = _rows(spark_cols, spark_rows), _rows(duck_cols, duck_rows)
    for i, (a, b) in enumerate(zip(left, right)):
        assert a == b, f"{name}: first differing row #{i}: spark={a} duck={b}"


def test_rows_only_queries_run(spark):
    for name, q in CATALOG.items():
        if q.oracle is None:
            df = q.build(spark, SF_DIR)
            assert df.count() >= 0, name


# Queries that were once vacuously green (both engines returned 0 rows, so
# the hash match proved nothing — VERDICT r6). Pin non-emptiness so a
# fixture or constant drift can't silently re-vacuate them.
_MUST_BE_NONEMPTY = [
    "q8_market_share",
    "q22_idle_rich_customers",
    "customers_without_orders",
]


@pytest.mark.parametrize("name", _MUST_BE_NONEMPTY)
def test_devacuated_queries_return_rows(spark, name):
    df = CATALOG[name].build(spark, SF_DIR)
    assert df.count() > 0, f"{name} is vacuous again (0 rows at sf0.001)"


def test_entry_smoke(spark):
    import __spark_entry__ as entry_mod

    df = entry_mod.entry(spark)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_catalog_and_oracle_keys_align():
    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    assert set(oracles) <= set(qs)
    assert len(qs) == len(CATALOG)


def test_queries_self_configure_timezone(spark, duck):
    """The driver owns the SparkSession; a non-UTC session must not shift
    epoch outputs. The contract wrapper resets the tz at build time."""
    import __spark_entry__ as e

    original = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        q = e.queries()["date_functions"]
        sdf = q(spark, SF_DIR)
        assert spark.conf.get("spark.sql.session.timeZone") == "UTC"
        got = {r.o_orderkey: r.epoch_s for r in sdf.limit(50).collect()}
        res = duck.execute(
            "SELECT o_orderkey, CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s "
            "FROM orders LIMIT 50"
        ).fetchall()
        expected = dict(res)
        for k, v in got.items():
            assert expected[k] == v
    finally:
        spark.conf.set("spark.sql.session.timeZone", original)
