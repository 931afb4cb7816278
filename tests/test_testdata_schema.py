"""Testdata schema guard.

Round 3 shipped with a silent driver-side testdata regeneration that
changed ``events.ts`` from TIMESTAMP(NANOS) to timestamp[us]; the drift
surfaced as six scattered AnalysisExceptions instead of one diagnostic.
This test pins the expected arrow dtype of every column in every table,
so the NEXT regeneration fails as a single assertion naming the drifted
column(s).

Columns with a known-acceptable set of storage types (``events.ts`` —
``load_events`` normalizes both shapes to one epoch-µs basis) list every
member of that set.
"""

from __future__ import annotations

import os

import pyarrow.parquet as pq
import pytest

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_SMALL", "/root/testdata/sf0.001")

# table -> column -> allowed arrow type strings
EXPECTED: dict[str, dict[str, set[str]]] = {
    "region": {"r_regionkey": {"int32"}, "r_name": {"string"}},
    "nation": {
        "n_nationkey": {"int32"},
        "n_name": {"string"},
        "n_regionkey": {"int32"},
    },
    "customer": {
        "c_custkey": {"int64"},
        "c_name": {"string"},
        "c_nationkey": {"int32"},
        "c_acctbal": {"double"},
        "c_mktsegment": {"string"},
    },
    "supplier": {
        "s_suppkey": {"int64"},
        "s_name": {"string"},
        "s_nationkey": {"int32"},
        "s_acctbal": {"double"},
    },
    "part": {
        "p_partkey": {"int64"},
        "p_name": {"string"},
        "p_brand": {"string"},
        "p_type": {"string"},
        "p_size": {"int32"},
        "p_retailprice": {"double"},
    },
    "orders": {
        "o_orderkey": {"int64"},
        "o_custkey": {"int64"},
        "o_orderstatus": {"string"},
        "o_totalprice": {"double"},
        # µs ONLY: there is no load-path normalization for date columns
        # (unlike events.ts) — nanos storage would load as BIGINT under
        # the session's nanosAsLong flag and break every to_date().
        # If regeneration changes this, it must fail HERE, loudly.
        "o_orderdate": {"timestamp[us]"},
        "o_orderpriority": {"string"},
    },
    "lineitem": {
        "l_orderkey": {"int64"},
        "l_partkey": {"int64"},
        "l_suppkey": {"int64"},
        "l_linenumber": {"int32"},
        "l_quantity": {"double"},
        "l_extendedprice": {"double"},
        "l_discount": {"double"},
        "l_tax": {"double"},
        "l_returnflag": {"string"},
        "l_linestatus": {"string"},
        "l_shipdate": {"timestamp[us]"},  # µs ONLY — see o_orderdate
    },
    "events": {
        "event_id": {"int64"},
        # Both shapes seen across driver regenerations; load_events
        # normalizes either to canonical epoch-µs BIGINT ts_us.
        "ts": {"timestamp[us]", "timestamp[ns]"},
        "user_id": {"int64"},
        "event_type": {"string"},
        "value": {"double"},
        "props": {"string"},
    },
    "documents": {
        "doc_id": {"int64"},
        "text": {"string"},
        "lang": {"string"},
        "source": {"string"},
        "n_chars": {"int64"},
    },
    "embeddings": {
        "vec_id": {"int64"},
        "embedding": {"list<element: float>", "list<item: float>"},
        "label": {"int32"},
    },
}


@pytest.mark.skipif(not os.path.isdir(SF_DIR), reason="testdata absent")
def test_testdata_schemas_unchanged():
    drift: list[str] = []
    for table, cols in EXPECTED.items():
        path = f"{SF_DIR}/{table}.parquet"
        schema = pq.read_schema(path)
        actual = {f.name: str(f.type) for f in schema}
        for col, allowed in cols.items():
            got = actual.pop(col, None)
            if got is None:
                drift.append(f"{table}.{col}: MISSING (expected {sorted(allowed)})")
            elif got not in allowed:
                drift.append(f"{table}.{col}: {got} (expected {sorted(allowed)})")
        for col, got in actual.items():
            drift.append(f"{table}.{col}: UNEXPECTED new column of type {got}")
    assert not drift, (
        "testdata schema drift detected — update load-path normalization "
        "(see queries/relational.py:load_events) and this pin:\n  "
        + "\n  ".join(drift)
    )
