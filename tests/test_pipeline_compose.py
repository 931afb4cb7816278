"""End-to-end curation-pipeline composition over the real fixture.

The scale operators are not just individually oracle-green — they
compose into THE training-data pipeline: dedup (exact copies out) →
span strip (duplicated runs cut) → domain cap → DSIR resample →
sequence packing. This test runs the whole chain on the sf0.001
documents table (with injected duplicates) and asserts the conservation
invariants a pipeline owner relies on at every stage: monotone row
counts, exact token accounting across the span strip, per-source caps
actually enforced, and the packer conserving every surviving token.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_validator_github_spark.contract import load
from etl_validator_github_spark.scale.dedup import (
    exact_dedup_groups,
    strip_duplicated_spans,
    with_copies,
)
from etl_validator_github_spark.scale.packing import pack_sequences
from etl_validator_github_spark.scale.text import (
    DOMAIN_CAP,
    domain_cap_select,
    importance_resample,
)

SF_DIR = "/root/testdata/sf0.001"


def test_curation_pipeline_composes(spark):
    # Stage 0: corpus with injected exact duplicates (every doc copied).
    raw = load(spark, SF_DIR, "documents")
    corpus = with_copies(raw).join(
        raw.select("doc_id", "source"), "doc_id", "left"
    ).withColumn("source", F.coalesce("source", F.lit("copyfeed")))
    n0 = corpus.count()
    assert n0 == 2 * raw.count()

    # Stage 1: exact dedup — every injected copy collapses onto its
    # original, so survivors == original corpus size.
    keep_ids = exact_dedup_groups(corpus).select(
        F.col("keep_id").alias("doc_id")
    )
    # Each stage is materialized once (the production persist-between-
    # stages pattern) — without it every downstream action re-executes
    # the whole upstream lineage.
    deduped = corpus.join(keep_ids, "doc_id", "left_semi").localCheckpoint()
    n1 = deduped.count()
    assert n1 == raw.count()

    # Stage 2: span strip — token accounting must be exact:
    # n_tokens == n_kept + n_removed per doc, and total kept tokens
    # equals total minus total removed.
    stripped = strip_duplicated_spans(deduped)
    bad = stripped.filter(
        F.col("n_tokens") != F.col("n_kept") + F.col("n_removed")
    ).count()
    assert bad == 0
    totals = stripped.agg(
        F.sum("n_tokens").alias("t"), F.sum("n_kept").alias("k"),
        F.sum("n_removed").alias("r"),
    ).collect()[0]
    assert totals.t == totals.k + totals.r and totals.r > 0
    cleaned = (
        deduped.drop("text")
        .join(stripped.filter(F.col("n_kept") > 0)
              .select("doc_id", F.col("clean_text").alias("text")),
              "doc_id")
        .localCheckpoint()
    )
    n2 = cleaned.count()
    assert 0 < n2 <= n1

    # Stage 3: domain cap — no source may exceed the cap by more than
    # one histogram bucket's population (whole-bucket semantics).
    capped_ids = domain_cap_select(cleaned).filter(F.col("cap_keep") == 1)
    worst = (
        capped_ids.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
        .agg(F.max("n")).collect()[0][0]
    )
    assert worst <= DOMAIN_CAP
    capped = cleaned.join(capped_ids.select("doc_id"), "doc_id",
                          "left_semi").localCheckpoint()
    n3 = capped.count()
    assert 0 < n3 <= n2

    # Stage 4: DSIR resample — deterministic subset.
    accepted = importance_resample(capped).filter(F.col("accepted") == 1)
    sampled = capped.join(accepted.select("doc_id"), "doc_id",
                          "left_semi").localCheckpoint()
    n4 = sampled.count()
    assert 0 < n4 <= n3

    # Stage 5: packing — every surviving token lands in exactly one
    # packed sequence (conservation), and no doc is dropped.
    packed = pack_sequences(sampled)
    sums = packed.agg(
        F.sum("n_docs").alias("docs"), F.sum("n_tokens").alias("toks")
    ).collect()[0]
    expect_toks = sampled.select(
        F.sum(F.size(F.split("text", " ")))
    ).collect()[0][0]
    assert sums.docs == n4
    assert sums.toks == expect_toks

    # The pipeline is monotone and genuinely selective end to end.
    assert n0 > n1 >= n2 >= n3 >= n4 > 0
