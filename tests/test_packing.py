"""Unit invariants for the training-batch construction operators
(scale/packing.py) — properties the oracle comparison can't state
directly: conservation, budget discipline, determinism of replication.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_validator_github_spark.contract import load
from etl_validator_github_spark.scale.packing import (
    SEQ_BUDGET,
    mixture_upsample,
    pack_sequences,
)


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return load(spark, sf_dir, "documents")


def test_pack_conserves_docs_and_tokens(spark, docs):
    packed = pack_sequences(docs)
    total = packed.agg(
        F.sum("n_docs").alias("docs"), F.sum("n_tokens").alias("toks")
    ).first()
    src = docs.select(
        F.count(F.lit(1)).alias("docs"),
        F.sum(F.size(F.split("text", " "))).alias("toks"),
    ).first()
    assert total["docs"] == src["docs"]
    assert total["toks"] == src["toks"]


def test_pack_sequences_are_contiguous_per_shard(spark, docs):
    """seq_ids per (lang, shard) run 0..max with no gaps — the running
    sum can't skip a budget window that documents started in."""
    packed = pack_sequences(docs)
    per_shard = packed.groupBy("lang", "shard").agg(
        F.min("seq_id").alias("lo"),
        F.max("seq_id").alias("hi"),
        F.count(F.lit(1)).alias("n"),
    )
    bad = per_shard.filter(
        (F.col("lo") != 0) | (F.col("n") != F.col("hi") + 1)
    )
    assert bad.isEmpty(), bad.collect()


def test_pack_matches_independent_python_recomputation(spark, docs):
    """seq_id assignment recomputed in plain Python from the raw docs:
    per (lang, shard) in doc_id order, a doc belongs to the sequence
    where it STARTS (preceding-token running sum // budget). Catches
    off-by-one variants (inclusive running sum, wrong divisor) that the
    conservation/contiguity properties cannot see."""
    from collections import defaultdict

    raw = docs.select(
        "doc_id", "lang", F.size(F.split("text", " ")).alias("n")
    ).collect()
    expected = defaultdict(lambda: [0, 0, None])  # n_docs, n_tokens, first
    running: dict = defaultdict(int)
    for r in sorted(raw, key=lambda r: r["doc_id"]):
        shard = r["doc_id"] % 8
        key = (r["lang"], shard)
        seq = running[key] // SEQ_BUDGET
        running[key] += r["n"]
        slot = expected[(r["lang"], shard, seq)]
        slot[0] += 1
        slot[1] += r["n"]
        slot[2] = r["doc_id"] if slot[2] is None else min(slot[2], r["doc_id"])

    got = {
        (r["lang"], r["shard"], r["seq_id"]):
            [r["n_docs"], r["n_tokens"], r["first_doc_id"]]
        for r in pack_sequences(docs).collect()
    }
    assert got == dict(expected)


def test_mixture_rows_match_copy_counts(spark, docs):
    """n_rows_out per source equals the sum of the per-doc copy counts —
    replication is exact, not sampled."""
    out = {r["source"]: r for r in mixture_upsample(docs).collect()}
    n_docs = {
        r["source"]: r["n"]
        for r in docs.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    for src, row in out.items():
        # every retained doc contributes >=1 row; epoch factor <= 3 here
        assert row["n_docs_in"] <= n_docs[src]
        assert row["n_rows_out"] >= row["n_docs_in"]
        assert row["n_rows_out"] <= 3 * n_docs[src]


def test_mixture_is_deterministic(spark, docs):
    a = sorted(map(tuple, mixture_upsample(docs).collect()))
    b = sorted(map(tuple, mixture_upsample(docs).collect()))
    assert a == b
