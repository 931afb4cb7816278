"""Physical-plan quality gates: the properties that matter at 100 TB.

These assert, from ``explain("formatted")`` output, that:
- parquet scans receive pushed filters and pruned schemas,
- small dimension joins broadcast (no shuffle of the fact table for dims),
- the rule engine compiles to a single projection (no shuffle before the
  final aggregation),
so a regression that silently de-optimizes a plan fails CI rather than
showing up as a 10× slowdown on a cluster.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_validator_github_spark.operators.validate import with_errors
from etl_validator_github_spark.plans.session import explain_str
from etl_validator_github_spark.queries import CATALOG


def plan(spark, sf_dir, name: str) -> str:
    return explain_str(CATALOG[name].build(spark, sf_dir))


def test_q1_scan_prunes_and_pushes(spark, sf_dir):
    p = plan(spark, sf_dir, "q1_pricing_summary")
    # Column pruning: the scan must not read l_orderkey/l_suppkey etc.
    assert "ReadSchema" in p
    read_schema = next(ln for ln in p.splitlines() if "ReadSchema" in ln)
    assert "l_orderkey" not in read_schema
    assert "l_quantity" in read_schema
    # The shipdate filter reaches the parquet reader.
    assert "PushedFilters: [IsNotNull(l_shipdate)" in p or "PushedFilters" in p


def test_q3_broadcasts_customer_side(spark, sf_dir):
    p = plan(spark, sf_dir, "q3_shipping_priority")
    assert "BroadcastHashJoin" in p
    # mktsegment filter is pushed to the customer scan.
    assert "BUILDING" in p


def test_q5_broadcasts_all_dims(spark, sf_dir):
    p = plan(spark, sf_dir, "q5_local_supplier")
    assert p.count("BroadcastHashJoin") >= 3


def test_semi_and_anti_join_operators(spark, sf_dir):
    assert "LeftSemi" in plan(spark, sf_dir, "customers_with_high_value_orders")
    assert "LeftAnti" in plan(spark, sf_dir, "customers_without_orders")


def test_rule_engine_is_single_projection(spark, sf_dir):
    """The 50-rule catalog must evaluate as one map-only Project over the
    scan — no Exchange (shuffle) anywhere in the validation stage."""
    from etl_validator_github_spark.generator import generate_bankdata

    bank = generate_bankdata(spark, 10, seed=246)
    p = explain_str(with_errors(bank).filter(F.size("__errors") > 0))
    assert "Exchange" not in p, "rule evaluation must not shuffle"


def test_whole_stage_codegen_covers_q1(spark, sf_dir):
    # Under AQE the codegen spans only appear in the FINAL plan, so run
    # the query first and then inspect the executed plan.
    df = CATALOG["q1_pricing_summary"].build(spark, sf_dir)
    df.collect()
    p = explain_str(df)
    assert "isFinalPlan=true" in p
    # Formatted mode marks whole-stage-codegen participation per operator.
    assert "codegen id" in p


def test_pii_scrub_is_map_only(spark, sf_dir):
    """Regex redaction must stay a pure per-row projection — no Exchange
    anywhere (the shape that streams through 100 TB without a shuffle)."""
    p = plan(spark, sf_dir, "text_pii_scrub")
    assert "Exchange" not in p


def test_decontaminate_broadcasts_benchmark_set(spark, sf_dir):
    """The corpus side must never shuffle on shingles: the (small)
    benchmark shingle set is broadcast into a hash join."""
    p = plan(spark, sf_dir, "decontaminate")
    assert "BroadcastHashJoin" in p
    assert "CartesianProduct" not in p


@pytest.mark.parametrize(
    "name", ["text_gopher_quality", "dedup_chunk_global"]
)
def test_repetition_stats_use_hash_aggregates(spark, sf_dir, name):
    """Top-token / chunk-count rollups run as two-level hash aggregates
    (map-side partial combine) joined back — never nested loops."""
    p = plan(spark, sf_dir, name)
    assert "HashAggregate" in p
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


@pytest.mark.parametrize(
    "name",
    ["dedup_minhash_lsh", "embed_ann_lsh", "dedup_simhash",
     "dedup_fuzzy_keep", "dedup_embedding_cosine"],
)
def test_lsh_paths_avoid_cartesian_products(spark, sf_dir, name):
    """LSH candidate generation must join on bucket keys, never via a
    nested-loop over all pairs."""
    p = plan(spark, sf_dir, name)
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


def test_ivf_assignment_is_map_side(spark, sf_dir):
    """IVF cell assignment must never shuffle the corpus: the centroid
    table folds to one broadcast row and each vector ranks its cells
    in-row, so no Exchange is keyed on vec_id and the only Window is the
    final per-query top-k. (Round-5 verdict: the old shape exchanged the
    corpus × n_cells expansion through a vec_id window.)"""
    import re

    p = plan(spark, sf_dir, "embed_ivf_topk")
    assert "hashpartitioning(vec_id" not in p, p
    assert "cell_rank" not in p, "per-vector ranking window resurfaced"
    # \b excludes WindowGroupLimit (the top-k pushdown of the same window)
    assert len(re.findall(r"\(\d+\) Window\b", p)) == 1, p


@pytest.mark.parametrize(
    "name", ["dedup_semantic_keep", "dedup_semantic_incremental"]
)
def test_semantic_dedup_pairs_join_on_cell_key(spark, sf_dir, name):
    """SemDeDup candidate generation must join on the cell id (hash or
    sort-merge on a key), never as an all-pairs nested loop; the only
    nested-loop joins in the plan are the single-row broadcast centroid
    folds of the map-side assignment."""
    p = plan(spark, sf_dir, name)
    assert "CartesianProduct" not in p
    assert "hashpartitioning(cell" in p or "BroadcastHashJoin" in p, p


def test_token_fertility_single_shuffle(spark, sf_dir):
    """The fertility report is a map-only projection into ONE hash-agg
    on the tiny (lang, source) key space — exactly one exchange."""
    p = plan(spark, sf_dir, "text_token_fertility")
    assert _n_exchanges(p) == 1, p
    assert "Join" not in p


def test_quality_drift_has_no_join_between_versions(spark, sf_dir):
    """Both corpus versions stream through one conditional hash-agg —
    a version-keyed join (the naive diff shape) must never appear."""
    p = plan(spark, sf_dir, "corpus_quality_drift")
    assert "Join" not in p, p
    assert "Union" in p
    assert _n_exchanges(p) == 1, p


def test_hourly_anomalies_broadcasts_stats(spark, sf_dir):
    """Per-type stats broadcast back onto the hourly rows: the hourly
    table never re-shuffles for the flag join."""
    p = plan(spark, sf_dir, "events_hourly_anomalies")
    assert "BroadcastHashJoin" in p
    assert "CartesianProduct" not in p


def test_split_assign_single_shuffle(spark, sf_dir):
    """Split assignment is map-only until the (lang, source, split)
    rollup — exactly one exchange."""
    p = plan(spark, sf_dir, "docs_split_assign")
    assert _n_exchanges(p) == 1, p


def test_snapshot_diff_joins_hashes_not_text(spark, sf_dir):
    """The version diff shuffles only (doc_id, md5) pairs: the full-outer
    join's exchanges carry the hash projection, never document text, and
    nothing plans as a nested loop."""
    import re

    p = plan(spark, sf_dir, "corpus_snapshot_diff")
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p
    # One join → at most two exchanges (one per side).
    assert _n_exchanges(p) <= 2, p
    # The load-bearing property: no Exchange carries the text column.
    # Formatted explain lists each node's detail section; split on node
    # headers and inspect the Exchange sections' Input/Output columns.
    sections = re.split(r"\n(?=\(\d+\) )", p)
    exchange_sections = [s for s in sections if re.match(r"\(\d+\) Exchange", s)]
    assert exchange_sections, "expected Exchange detail sections in the plan"
    for s in exchange_sections:
        assert "text#" not in s, f"document text shuffled through:\n{s}"


def test_events_funnel_joins_on_user_key(spark, sf_dir):
    p = plan(spark, sf_dir, "events_funnel")
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p


def test_token_budget_select_broadcasts_cutoffs(spark, sf_dir):
    """Curation must stay histogram-shaped: the per-lang cutoff table
    broadcasts back (no corpus re-shuffle for the final filter)."""
    p = plan(spark, sf_dir, "docs_token_budget_select")
    assert "BroadcastHashJoin" in p
    assert _n_exchanges(p) <= 2, p


def test_jaccard_candidates_come_from_lsh_not_length_buckets(spark, sf_dir):
    """dedup_ngram_jaccard takes candidates from the MinHash band buckets
    and verifies with exact Jaccard — the (lang, length-bucket) self-join
    (whose bucket populations grow linearly with the corpus) must be gone
    from the plan."""
    p = plan(spark, sf_dir, "dedup_ngram_jaccard")
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    # The old blocking joined on a `bucket` column derived from
    # floor(n_tokens / 10); neither may appear anywhere in the plan.
    assert "bucket#" not in p, "length-bucket blocking column resurfaced"
    # The LSH band pipeline (band_key hash-agg) must feed the candidates.
    assert "band_key" in p


def test_bucketed_range_join_matches_naive_between(spark):
    from etl_validator_github_spark.plans.range_join import bucketed_range_join

    points = spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate([0.0, 5.0, 9.99, 10.0, 17.5, 30.0, 99.9])],
        "pid: long, p: double",
    )
    intervals = spark.createDataFrame(
        [(1, 0.0, 10.0), (2, 10.0, 20.0), (3, 5.0, 35.0), (4, 90.0, 95.0)],
        "iid: long, lo: double, hi: double",
    )
    got = sorted(
        (r.pid, r.iid)
        for r in bucketed_range_join(
            points, intervals, "p", "lo", "hi", bucket_width=7.0
        ).collect()
    )
    naive = sorted(
        (r.pid, r.iid)
        for r in points.crossJoin(intervals)
        .filter("p BETWEEN lo AND hi")
        .collect()
    )
    assert got == naive
    # bounds are inclusive on both ends: p=10.0 hits [0,10] AND [10,20]
    assert (3, 1) in got and (3, 2) in got


def test_bucketed_range_join_left_join_null_extends(spark):
    """Left-outer semantics: a point matching no interval survives
    null-extended exactly once (the BETWEEN is part of the join
    condition, not a post-join filter that would drop the row)."""
    import pytest

    from etl_validator_github_spark.plans.range_join import bucketed_range_join

    points = spark.createDataFrame(
        [(1, 5.0), (2, 50.0), (3, 500.0)], "pid: long, p: double"
    )
    intervals = spark.createDataFrame(
        [(1, 0.0, 10.0), (2, 40.0, 60.0)], "iid: long, lo: double, hi: double"
    )
    rows = sorted(
        (r.pid, r.iid)
        for r in bucketed_range_join(
            points, intervals, "p", "lo", "hi", bucket_width=10.0, how="left"
        ).collect()
    )
    assert rows == [(1, 1), (2, 2), (3, None)]
    semi = bucketed_range_join(
        points, intervals, "p", "lo", "hi", bucket_width=10.0, how="left_semi"
    )
    assert sorted(r.pid for r in semi.collect()) == [1, 2]
    anti = bucketed_range_join(
        points, intervals, "p", "lo", "hi", bucket_width=10.0, how="left_anti"
    )
    assert [r.pid for r in anti.collect()] == [3]
    # interval-side outer semantics are refused, not silently wrong
    for bad in ("right", "full", "full_outer"):
        with pytest.raises(ValueError, match="bucket-exploded"):
            bucketed_range_join(
                points, intervals, "p", "lo", "hi", bucket_width=10.0, how=bad
            )


def test_bucketed_range_join_plans_as_hash_join(spark):
    from etl_validator_github_spark.plans.range_join import bucketed_range_join

    points = spark.range(100).selectExpr("id AS pid", "CAST(id AS DOUBLE) AS p")
    intervals = spark.range(5).selectExpr(
        "id AS iid", "CAST(id * 20 AS DOUBLE) AS lo", "CAST(id * 20 + 30 AS DOUBLE) AS hi"
    )
    plan = explain_str(
        bucketed_range_join(points, intervals, "p", "lo", "hi", bucket_width=20.0)
    )
    assert "NestedLoop" not in plan
    assert "HashJoin" in plan


def test_any_violation_gate_stays_in_codegen(spark, sf_dir):
    """Regression guard for a measured finding: the pure-boolean OR of
    all ~50 violation predicates compiles into whole-stage codegen
    (`*(n) Filter`), while the array/lambda error projection cannot.
    If this assertion breaks, someone added a codegen-unsupported
    primitive (higher-order function, lambda) to a rule predicate."""
    from etl_validator_github_spark.generator import generate_bankdata
    from etl_validator_github_spark.operators.rules import (
        bankdata_rules,
        compile_any_violation,
    )

    bank = generate_bankdata(spark, 10, seed=246).localCheckpoint(eager=True)
    gated = bank.filter(compile_any_violation(bankdata_rules())).select("PayeeID")
    p = gated._jdf.queryExecution().executedPlan().toString()
    assert "*(1) Filter" in p or "WholeStageCodegen" in p


def _n_exchanges(p: str) -> int:
    import re

    return len(re.findall(r"\(\d+\) Exchange", p))


def test_pack_sequences_single_shuffle(spark, sf_dir):
    """Packing must shuffle ONCE on (lang, shard) — hashpartitioning on
    (lang, shard) already satisfies the (lang, shard, seq_id) rollup's
    clustered distribution, so the agg must not add a second Exchange."""
    p = plan(spark, sf_dir, "pack_sequences")
    assert _n_exchanges(p) == 1, p


def test_mixture_upsample_is_map_then_agg(spark, sf_dir):
    """Replication (explode) is map-side; shuffles only for the final
    per-source aggregate (count-distinct expands to two)."""
    p = plan(spark, sf_dir, "mixture_upsample")
    assert "Generate" in p
    assert _n_exchanges(p) <= 2
    assert "CartesianProduct" not in p and "NestedLoop" not in p


def test_changelog_compaction_single_key_shuffle(spark, sf_dir):
    """CDC compaction: one shuffle for the key window, one for the small
    final agg; the latest-record filter stays in-partition."""
    p = plan(spark, sf_dir, "changelog_latest_state")
    assert "Window" in p
    assert _n_exchanges(p) <= 2


def test_substring_spans_two_real_shuffles(spark, sf_dir):
    """Sliding-window span dedup: windowing is map-only, so the only
    real Exchanges are the hash-agg on the window hash and the per-doc
    interval-union window. Count-side and per-doc joins broadcast at
    test scale; no all-pairs fallback may appear."""
    p = plan(spark, sf_dir, "dedup_substring_spans")
    assert _n_exchanges(p) <= 2, p
    assert "CartesianProduct" not in p and "NestedLoop" not in p
    assert "Window" in p


def test_importance_resample_bucket_tables_broadcast(spark, sf_dir):
    """DSIR: both hashed-bucket distribution tables are bounded by
    DSIR_BUCKETS, so they must broadcast — the corpus-sized feature
    stream is never shuffled on bucket. The 1-row stats fold joins as a
    BNLJ by design (the semantic-dedup convention); no CartesianProduct
    may appear."""
    p = plan(spark, sf_dir, "docs_importance_resample")
    assert p.count("BroadcastHashJoin") >= 4, p
    assert "CartesianProduct" not in p
    # Two per-doc rollups (output + stats scalar — documented recompute)
    # plus two B-bounded bucket aggs per subtree and the scalar fold.
    assert _n_exchanges(p) <= 7, p


def test_dhash_pipeline_runs_once_and_stays_blocked(spark, sf_dir):
    """dHash near-dup: the groupBy-bucket pair expansion must keep the
    decode+hash pipeline to ONE execution per corpus branch (4
    MapInPandas: payload+hash for base and for copies — a bucket
    self-join would double that), with only the bucket-key shuffle and
    the distinct; never a cartesian fallback."""
    import re

    p = plan(spark, sf_dir, "multimodal_dhash_neardup")
    assert len(re.findall(r"\(\d+\) MapInPandas", p)) == 4, p
    assert _n_exchanges(p) <= 2, p
    assert "CartesianProduct" not in p


def test_span_strip_bounded_shuffles_no_cartesian(spark, sf_dir):
    """Span removal: window hashing and token positions are map-only;
    real Exchanges only for the window-hash agg, the covered-position
    distinct, and the per-doc rebuild. The rebuild must use in-group
    sort_array, never a global Sort."""
    import re

    p = plan(spark, sf_dir, "dedup_span_strip")
    assert _n_exchanges(p) <= 3, p
    assert "CartesianProduct" not in p
    assert not re.search(r"\(\d+\) Sort\b", p), p


def test_domain_cap_histogram_stays_tiny(spark, sf_dir):
    """Per-domain cap: the ONLY Window/Sort runs over the (source,
    bucket) histogram — sources x 64 rows at any corpus size — and the
    per-doc side is a map-only broadcast-join filter. A row_number over
    documents (the per-domain-sort scale-killer) would show as more
    exchanges and a Sort feeding from the scan."""
    p = plan(spark, sf_dir, "docs_domain_cap")
    assert _n_exchanges(p) <= 2, p
    assert "BroadcastHashJoin" in p  # cutoffs broadcast onto docs
    assert "CartesianProduct" not in p


def test_embed_outliers_broadcasts_cells(spark, sf_dir):
    """Outlier flags: the centroid table (one row per label) must
    broadcast; the only real shuffles are the label x dim centroid
    aggs. The vector side never exchanges."""
    p = plan(spark, sf_dir, "embed_outliers")
    assert _n_exchanges(p) <= 2, p
    assert "BroadcastHashJoin" in p
    assert "CartesianProduct" not in p


def test_span_probe_semi_join_bounded(spark, sf_dir):
    """Incremental span probe: batch windows SEMI-join the index (no
    fan-out), coverage union + per-doc rollup are the only other real
    shuffles; never a cartesian fallback."""
    p = plan(spark, sf_dir, "dedup_span_probe")
    assert "LeftSemi" in p
    assert _n_exchanges(p) <= 3, p
    assert "CartesianProduct" not in p


def test_temperature_mixture_two_corpus_scans(spark, sf_dir):
    """Alpha-temperature sampling needs one stats pass and one decision
    pass over the corpus — never a third (the min-rate fold must run as
    a window over the tiny per-lang aggregate, not re-derive it). The
    rate table broadcasts onto the decision pass; the keep test is
    map-side md5 arithmetic."""
    import re
    p = plan(spark, sf_dir, "docs_temperature_mixture")
    assert len(re.findall(r"\(\d+\) Scan parquet", p)) == 2, p
    assert _n_exchanges(p) <= 3, p
    assert "BroadcastHashJoin" in p
    assert "CartesianProduct" not in p and "NestedLoop" not in p


def test_distinct_sketch_registers_partial_aggregate(spark, sf_dir):
    """HLL sketch: both register passes are two-level hash aggregates
    (map-side partial max / partial distinct) over tiny key spaces —
    never a sort-based aggregate or a nested loop. The register table
    is group × 64 no matter the input size."""
    p = plan(spark, sf_dir, "events_distinct_sketch")
    assert "HashAggregate" in p
    assert "SortAggregate" not in p
    assert "CartesianProduct" not in p and "NestedLoop" not in p


def test_cms_grid_hash_aggregates_probe_broadcast(spark, sf_dir):
    """Count-min: the d×w counter grid builds as a hash-agg on ≤32
    keys (map-side partial sums); the 40-row probe table broadcasts
    onto it — the token stream itself is never joined."""
    p = plan(spark, sf_dir, "text_cms_topk_counts")
    assert "HashAggregate" in p
    assert "BroadcastHashJoin" in p
    assert "CartesianProduct" not in p


def test_quantile_sketch_single_corpus_agg(spark, sf_dir):
    """DDSketch: ONE hash-agg pass over the values builds the ≤64-row
    histogram; everything after (cumulative walk, rank pick) runs on
    bucket-cardinality rows. No sort or window ever touches the corpus."""
    import re
    p = plan(spark, sf_dir, "orders_quantile_sketch")
    assert len(re.findall(r"\(\d+\) Scan parquet", p)) == 1, p
    assert "HashAggregate" in p
    assert "CartesianProduct" not in p


def test_pq_encode_and_score_stay_map_side(spark, sf_dir):
    """PQ: the checkpointed 32-row codebook folds into one broadcast
    row, so corpus encoding and ADC scoring are in-row expressions —
    the corpus × codes expansion never leaves the map stage and the
    only corpus-keyed shuffle is the final per-query top-k window.
    (Without the codebook lineage barrier this plan had 9 exchanges and
    6 scans from re-deriving the refinement per consumer.)"""
    import re
    p = plan(spark, sf_dir, "embed_pq_topk")
    assert _n_exchanges(p) <= 3, p
    assert len(re.findall(r"\(\d+\) Scan parquet", p)) == 2, p
    assert "CartesianProduct" not in p
    assert "SortMergeJoin" not in p


def test_q2_single_lineitem_pass_two_shuffles(spark, sf_dir):
    """Q2's per-part argmin must run as ONE pass over lineitem: a
    (part, supplier) hash-agg, broadcast join to the regional supplier
    dim, then a partkey window min — two real Exchanges total. The
    naive self-join form (supply joined back to its own per-part min)
    scans lineitem twice and sort-merges the duplicated aggregates, so
    pin: one scan per table, no SortMergeJoin."""
    p = plan(spark, sf_dir, "q2_min_cost_supplier")
    assert _n_exchanges(p) == 2, p
    assert "SortMergeJoin" not in p, p
    assert "CartesianProduct" not in p
    # lineitem + supplier + nation + region + part, each scanned once.
    import re
    assert len(re.findall(r"\(\d+\) Scan parquet", p)) == 5, p
    assert "BroadcastHashJoin" in p
    assert "Window" in p


def test_aqe_splits_skewed_join_partitions(spark):
    """Scale evidence: the session's AQE skew-join config actually
    splits a hot-key partition at runtime (SortMergeJoin(skew=true)).
    At 100 TB this is the safety net under every fact-fact join; the
    thresholds are lowered here only to reproduce the behavior at test
    scale."""
    from pyspark.sql import functions as F

    tuned = {
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "100KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "50KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.autoBroadcastJoinThreshold": "-1",  # force SMJ
    }
    saved = {k: spark.conf.get(k, None) for k in tuned}
    try:
        for k, v in tuned.items():
            spark.conf.set(k, v)
        # 80% of rows share one key; the rest spread over 10k keys.
        left = spark.range(200_000).select(
            F.when(F.col("id") % 5 != 0, F.lit(7))
            .otherwise(F.col("id") % 10_000).alias("k"),
            F.concat(F.lit("x" * 100), F.col("id").cast("string")).alias("pad"),
        )
        right = spark.range(10_000).select(
            F.col("id").alias("k"), F.lit("r").alias("rv")
        )
        j = left.join(right, "k").select(F.length("pad").alias("n"))
        assert len(j.collect()) == 200_000
        p = j._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in p, p
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_partitioned_write_enables_partition_pruning(spark, sf_dir, tmp_path):
    """Lake layout evidence: writing partitionBy(lang) and filtering on
    lang must prune partitions at the scan (PartitionFilters), reading
    only the matching directory — the layout that turns a 100 TB scan
    into a per-language one."""
    from etl_validator_github_spark.contract import load

    out = str(tmp_path / "docs_by_lang")
    load(spark, sf_dir, "documents").write.partitionBy("lang").parquet(out)
    df = spark.read.parquet(out).filter(F.col("lang") == "en")
    p = explain_str(df)
    pf = next(ln for ln in p.splitlines() if "PartitionFilters" in ln)
    assert "lang" in pf and "en" in pf, pf
    n_en = df.count()
    n_all = spark.read.parquet(out).count()
    assert 0 < n_en < n_all


def test_bloom_probe_is_map_side_after_register_fold(spark, sf_dir):
    """Bloom decontamination: the corpus reaches the per-doc agg through
    the 1-row register fold (BNLJ by design, the semantic-dedup
    convention) with map-side membership arithmetic — the only
    exchanges are the build side's ≤2048-group word agg + the two-step
    scalar fold and the probe side's distinct + doc agg. No
    CartesianProduct, and never a shuffle of corpus shingles on a
    bloom key."""
    p = plan(spark, sf_dir, "docs_bloom_decontaminate")
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" in p, p
    assert _n_exchanges(p) <= 5, p


def test_audio_vad_single_decode_pass_no_join(spark, sf_dir):
    """Audio VAD: the decoded frame stream is consumed in ONE pass —
    exactly one MapInPandas (a base⋈runs formulation would decode every
    payload twice), no join, and every exchange keys on doc_id (window,
    island agg, doc agg)."""
    import re

    p = plan(spark, sf_dir, "multimodal_audio_vad")
    # Exactly two MapInPandas: payload synthesis + the frame fan-out —
    # the decode pipeline appears ONCE, not once per output branch.
    assert len(re.findall(r"\(\d+\) MapInPandas", p)) == 2, p
    assert "Join" not in p, p
    assert "Window" in p
    # The window's doc_id partitioning satisfies BOTH downstream
    # groupings ((doc,island) and doc are clustered subsets), so the
    # whole report runs on a single exchange.
    assert _n_exchanges(p) == 1, p
    for ln in re.findall(r"Arguments: hashpartitioning\([^)]*", p):
        assert "doc_id" in ln, ln


def test_gapfill_aggregates_before_grid_and_broadcasts_rollup(spark, sf_dir):
    """Gap-fill: both event passes collapse to hash-aggs (the span agg
    folds straight onto the scan — no materialized intermediate), the
    tiny rollup broadcasts onto the grid, and the forward-fill window
    reuses the span exchange's event_type partitioning — two exchanges
    total, nothing input-sized after the rollup."""
    import re

    p = plan(spark, sf_dir, "events_hourly_gapfill")
    assert len(re.findall(r"\(\d+\) Scan parquet", p)) == 2, p
    assert "BroadcastHashJoin" in p
    assert "CartesianProduct" not in p
    assert "Window" in p
    assert _n_exchanges(p) <= 2, p


def test_winsorize_clamp_branch_avoids_the_window(spark, sf_dir):
    """Winsorized stats: only the cutoff branch pays the per-type sort
    window; Catalyst prunes rn/n off the clamp branch, which re-scans
    raw events map-side into the broadcast join + 5-key agg. Two
    exchanges total (window + final agg), both Windows on the cutoff
    subtree, never a sort-merge self-join of the fact table."""
    import re

    p = plan(spark, sf_dir, "events_winsorized_stats")
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p and "CartesianProduct" not in p
    assert _n_exchanges(p) <= 2, p
    assert len(re.findall(r"\(\d+\) Window\b", p)) == 2, p
    assert len(re.findall(r"\(\d+\) Sort\b", p)) == 1, p


def test_trend_reuses_rollup_partitioning(spark, sf_dir):
    """Hourly trend: one input-sized hash-agg, then the min-window and
    the final agg reuse its event_type partitioning — two exchanges at
    most (rollup on (type, hour) + re-key on type), no join."""
    p = plan(spark, sf_dir, "events_hourly_trend")
    assert "Join" not in p, p
    assert "Window" in p
    assert _n_exchanges(p) <= 2, p


def test_exact_k_sample_pushes_group_limit(spark, sf_dir):
    """Exact-k sampling must plan a WindowGroupLimit: no stratum sorts
    beyond the top-k frontier."""
    p = plan(spark, sf_dir, "docs_sample_exact_k")
    assert "WindowGroupLimit" in p, p
    assert _n_exchanges(p) == 1, p


def test_runtime_bloom_filter_reduces_shuffle_join(spark, sf_dir):
    """Spark's runtime row-level filtering: with a selective dimension
    side and a shuffle join, the optimizer injects a bloom filter
    (might_contain over xxhash64) into the FACT side's scan filter —
    the engine-native semi-join reduction that drops non-matching
    lineitem rows before the exchange. Default size thresholds target
    cluster scale (10 GB probe side), so the test lowers the
    application-side threshold to fixture scale and restores it."""
    from pyspark.sql import functions as F

    conf = spark.conf
    old_bc = conf.get("spark.sql.autoBroadcastJoinThreshold")
    old_app = conf.get(
        "spark.sql.optimizer.runtime.bloomFilter"
        ".applicationSideScanSizeThreshold")
    try:
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        conf.set("spark.sql.optimizer.runtime.bloomFilter"
                 ".applicationSideScanSizeThreshold", "0")
        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        od = spark.read.parquet(f"{sf_dir}/orders.parquet").filter(
            F.col("o_orderpriority") == "1-URGENT")
        j = (li.join(od, li.l_orderkey == od.o_orderkey)
             .groupBy("o_orderpriority").count())
        p = explain_str(j)
        assert "might_contain" in p, p
        # The filter sits on the lineitem branch, upstream of its join
        # exchange — i.e. in a Filter node over the l_orderkey scan.
        flt = next(ln for ln in p.splitlines()
                   if "might_contain" in ln and "l_orderkey" in ln)
        assert "xxhash64" in flt
    finally:
        conf.set("spark.sql.autoBroadcastJoinThreshold", old_bc)
        conf.set("spark.sql.optimizer.runtime.bloomFilter"
                 ".applicationSideScanSizeThreshold", old_app)


def test_prefix_filter_join_keys_on_shingles(spark, sf_dir):
    """The exact similarity join must generate candidates through a
    keyed join on the prefix shingles — never a cartesian/BNLJ pass —
    and select prefixes through the doc-keyed window."""
    p = plan(spark, sf_dir, "dedup_prefix_filter_join")
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    assert "Window" in p


def test_scd2_single_key_shuffle_no_self_join(spark, sf_dir):
    """SCD2 build: ONE exchange (hashpartitioning on o_custkey) feeding
    an in-partition lead() window — never the naive changelog self-join
    (quadratic per key), no extra shuffle after the window."""
    p = plan(spark, sf_dir, "changelog_scd2")
    assert "Join" not in p, p
    assert "Window" in p
    assert _n_exchanges(p) == 1, p
    assert "o_custkey" in p


def test_ewma_shares_one_window_with_grid_shape(spark, sf_dir):
    """The 8 EWMA lags share ONE window spec, so the feature pass adds
    exactly one Window operator and NO exchange beyond the gap-fill
    grid's own shape (same exchange count as events_lag_features,
    which consumes the identical grid)."""
    import re
    p = plan(spark, sf_dir, "events_ewma")
    ref = plan(spark, sf_dir, "events_lag_features")
    assert len(re.findall(r"\(\d+\) Window", p)) == 1, p
    assert _n_exchanges(p) == _n_exchanges(ref), (p, ref)


def test_pagerank_iterations_are_fact_free(spark, sf_dir):
    """The checkpointed edge fold is the lineage barrier: the explained
    plan must contain NO fact-table parquet scans (lineitem/orders are
    inside the one-shot edge build RDD) — iteration cost is joins over
    <= N^2 rows, independent of the fact tables."""
    import re
    p = plan(spark, sf_dir, "nation_trade_pagerank")
    locs = re.findall(r"Location:[^\n]*", p)
    assert locs and all("nation.parquet" in s for s in locs), locs
    assert "SortMergeJoin" not in p
    assert "CartesianProduct" not in p


def test_merge_upsert_single_key_shuffle(spark, sf_dir):
    """MERGE apply = ONE full-outer join on the key (an exchange per
    side, nothing after) + map-side CASE routing — no window, no
    second pass over the snapshot."""
    import re
    p = plan(spark, sf_dir, "orders_merge_upsert")
    assert _n_exchanges(p) == 2, p
    assert "Window" not in p
    assert len(re.findall(r"\(\d+\) SortMergeJoin", p)) == 1, p


def test_basket_pairs_map_side_fanout(spark, sf_dir):
    """Pair generation is the in-codegen array comprehension exploded
    map-side — never a lineitem self-join. The checkpointed basket
    frame is built once (no parquet scans remain in the plan), support
    joins broadcast."""
    import re
    p = plan(spark, sf_dir, "basket_part_pairs")
    assert len(re.findall(r"\(\d+\) Scan parquet", p)) == 0, p
    assert "SortMergeJoin" not in p
    assert "CartesianProduct" not in p
    assert "BroadcastHashJoin" in p
    assert "Generate" in p  # the explode fan-out


def test_triangles_checkpointed_edges_broadcast_joins(spark, sf_dir):
    """Triangle counting: the edge list is built once behind the lazy
    checkpoint (no parquet scans remain), and both closure joins
    broadcast — the wedge join never SortMergeJoins the graph against
    itself."""
    import re
    p = plan(spark, sf_dir, "basket_pair_triangles")
    assert len(re.findall(r"\(\d+\) Scan parquet", p)) == 0, p
    assert "SortMergeJoin" not in p
    assert "CartesianProduct" not in p
    assert "BroadcastHashJoin" in p


def test_rfm_ranks_have_no_single_partition_sort(spark, sf_dir):
    """RFM: the quintile ranks are range-partitioned exact ranks
    (functions/ranks.py), so the final plan has NO SinglePartition
    exchange — no task ever sorts the whole customer aggregate — and
    every Window is partitioned by the range-partition id. (The
    pre-checkpoint lineage — agg below rank, pruned fact scan — sits
    behind the helper's pid-pinning localCheckpoint barrier and is
    pinned separately by tests/test_ranks.py.)"""
    p = plan(spark, sf_dir, "customers_rfm_segments")
    assert "SinglePartition" not in p, p
    assert "Window" in p
    assert "_pid" in p


def test_hhi_single_fact_pass_broadcast_part(spark, sf_dir):
    """HHI: the (brand, supplier) revenue aggregate is pinned behind the
    lazy checkpoint, so the final plan holds NO parquet scans (the one
    fact pass runs below the barrier and is never re-run for the two
    consumers), and the totals join broadcasts — no sort-merge."""
    import re
    p = plan(spark, sf_dir, "brand_supplier_hhi")
    assert len(re.findall(r"\(\d+\) Scan parquet", p)) == 0, p
    assert "SortMergeJoin" not in p
    assert "BroadcastHashJoin" in p


def test_rrf_fusion_no_smj_no_cartesian(spark, sf_dir):
    """Hybrid RRF: both branch joins broadcast (BM25 postings join on
    the broadcast query set; cosine's documented 1-row-side BNLJ), the
    fusion is union + hash-agg — never a SortMergeJoin (an outer join
    formulation could not broadcast) and never a CartesianProduct."""
    p = plan(spark, sf_dir, "retrieval_rrf_fusion")
    assert "SortMergeJoin" not in p
    assert "CartesianProduct" not in p
    assert "BroadcastHashJoin" in p
    assert "HashAggregate" in p


def test_ngram_novelty_semi_complement_on_hash_key(spark, sf_dir):
    """Novelty must flow as the h-keyed LEFT SEMI complement
    (n_novel = n_windows − n_overlap) against the distinct reference
    set — never a LEFT ANTI (whose stream side Spark's runtime bloom
    filter can never prune, and whose output is ~every window on
    mostly-novel corpora) and never an all-pairs comparison."""
    p = plan(spark, sf_dir, "text_ngram_novelty")
    assert "LeftSemi" in p
    assert "LeftAnti" not in p
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


def test_fuzzy_match_blocks_on_gram_key(spark, sf_dir):
    """The fuzzy join must generate candidates through the bigram
    block (a key-equality join), never an all-pairs nested loop, and
    levenshtein runs only above the candidate join."""
    p = plan(spark, sf_dir, "part_name_fuzzy_matches")
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    assert "levenshtein" in p


def test_ivfpq_corpus_never_shuffles_for_assignment(spark, sf_dir):
    """IVF-PQ: cell id and all four PQ codes are computed IN-ROW against
    broadcast 1-row folds (no Exchange keyed on vec_id), the probe join
    is a broadcast hash join on the cell key, and the only Window is
    the final per-query top-k."""
    import re

    p = plan(spark, sf_dir, "embed_ivfpq_topk")
    assert "hashpartitioning(vec_id" not in p, p
    assert "CartesianProduct" not in p
    assert "BroadcastHashJoin" in p
    assert len(re.findall(r"\(\d+\) Window\b", p)) == 1, p


def test_derepeat_is_map_only(spark, sf_dir):
    """De-repetition must stream through with no Exchange anywhere —
    one filter/transform projection per row."""
    p = plan(spark, sf_dir, "text_derepeat")
    assert "Exchange" not in p


def test_expectations_compile_to_one_aggregation_job(spark, sf_dir):
    """N expectations over one table must plan as ONE aggregate over
    ONE scan (conditional counters + count_distinct in the same agg) —
    never one job per check."""
    import re
    p = plan(spark, sf_dir, "orders_expectations")
    assert len(re.findall(r"\(\d+\) Scan parquet", p)) == 1, p
    assert "Join" not in p


def test_attribution_single_user_shuffle(spark, sf_dir):
    """Attribution: carry-forward window over ONE user_id exchange, no
    join anywhere (the naive per-purchase inequality join is the shape
    this query exists to avoid)."""
    p = plan(spark, sf_dir, "events_attribution")
    assert "Join" not in p
    assert p.count("hashpartitioning(user_id") >= 1


def test_cusum_no_second_scan(spark, sf_dir):
    """CUSUM: one events scan feeds rollup → window → argmax; the
    change point must not trigger a re-scan join-back."""
    import re
    p = plan(spark, sf_dir, "events_cusum_changepoint")
    assert len(re.findall(r"\(\d+\) Scan parquet", p)) == 1, p
    assert "Join" not in p


def test_fk_audit_counts_in_one_pass(spark, sf_dir):
    """FK audit (r13 shape): each edge is ONE pass over the child — a
    1:1 LEFT join against the key-only parent projection with a hit
    marker, counting child rows and orphans in the same aggregate.
    The old count × LeftAnti shape scanned every child twice and folded
    through a per-edge 1-row BNLJ."""
    p = plan(spark, sf_dir, "star_schema_fk_audit")
    assert p.count("BroadcastHashJoin LeftOuter") >= 6, p
    assert "LeftAnti" not in p, "two-scan orphan check resurfaced"
    assert "BroadcastNestedLoopJoin" not in p
    assert "CartesianProduct" not in p


def test_hard_negatives_anti_join_on_list_keys(spark, sf_dir):
    """Hard negatives: the dense list is removed via a (query_id,
    doc_id)-keyed LeftAnti — never a per-query nested loop."""
    p = plan(spark, sf_dir, "retrieval_hard_negatives")
    assert "LeftAnti" in p
    assert "CartesianProduct" not in p


def test_split_leakage_is_join_free_hash_agg(spark, sf_dir):
    """Split leakage: one content-hash aggregation + a 1-row fold
    exploded into pair rows — no join anywhere, text never shuffles
    (the exchange carries only the 32-char content hash + counters)."""
    p = plan(spark, sf_dir, "docs_split_leakage")
    assert "Join" not in p, p
    assert "CartesianProduct" not in p


def test_gini_windows_partition_by_segment(spark, sf_dir):
    """Gini: the rank window must be PARTITIONED by market segment
    (never a single global sort) over the customer aggregate."""
    p = plan(spark, sf_dir, "customers_revenue_gini")
    assert "Window" in p
    win = next(ln for ln in p.splitlines()
               if "Arguments" in ln and "row_number" in ln)
    assert "c_mktsegment" in win, win
    assert "CartesianProduct" not in p


def test_mad_outliers_windows_keyed_by_type(spark, sf_dir):
    """MAD outliers: two rank windows partitioned by event_type and
    type-keyed broadcast joins back — no global sort, no cartesian."""
    p = plan(spark, sf_dir, "events_mad_outliers")
    assert "Window" in p
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


def test_seasonal_naive_joins_on_calendar_keys(spark, sf_dir):
    """Seasonal naive: the h−1/h−24 lags are keyed equi-joins over the
    HOURLY ROLLUP (post-aggregate), never windows over raw events and
    never a nested loop."""
    p = plan(spark, sf_dir, "events_seasonal_naive")
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    assert "Window" not in p


def test_backlog_single_bounded_window(spark, sf_dir):
    """Backlog: the cumulative sum runs over the month axis AFTER the
    monthly aggregation (window input is bounded by calendar span)."""
    p = plan(spark, sf_dir, "orders_backlog_timeline")
    assert "Window" in p
    assert "CartesianProduct" not in p


def test_unpivot_plans_expand_without_join(spark, sf_dir):
    """UNPIVOT/melt: the wide→long reshape is a zero-shuffle Expand;
    only the rollup exchanges. No join of any kind."""
    p = plan(spark, sf_dir, "part_metrics_unpivot")
    assert "Expand" in p, p
    assert "Join" not in p
    assert _n_exchanges(p) <= 1, p


def test_vocab_coverage_windows_over_types_only(spark, sf_dir):
    """Coverage curve: the rank window's input is the (token) vocab
    AGGREGATE — the explode of raw tokens must sit below a
    HashAggregate, not feed the window directly."""
    p = plan(spark, sf_dir, "corpus_vocab_coverage")
    assert "Window" in p
    assert "CartesianProduct" not in p


def test_grouping_sets_single_expand_pass(spark, sf_dir):
    """Explicit GROUPING SETS must plan as ONE Expand over one scan —
    never a union of per-set aggregates re-scanning the input."""
    import re

    p = plan(spark, sf_dir, "lineitem_grouping_sets")
    assert "Expand" in p
    assert len(re.findall(r"\(\d+\) Scan parquet", p)) == 1, p
    assert "Join" not in p


def test_percentile_ranks_windows_by_segment(spark, sf_dir):
    """Percentile ranks: every window partitioned by segment over the
    customer aggregate; no global sort, no cartesian."""
    p = plan(spark, sf_dir, "customers_percentile_ranks")
    assert "Window" in p
    win = next(ln for ln in p.splitlines()
               if "Arguments" in ln and "row_number" in ln)
    assert "c_mktsegment" in win, win
    assert "CartesianProduct" not in p


def test_order_streaks_customer_partitioned(spark, sf_dir):
    """Streaks: the island window partitions by customer; the whole op
    is distinct → window → two hash-aggs, no join."""
    p = plan(spark, sf_dir, "customers_order_streaks")
    assert "Window" in p
    win = next(ln for ln in p.splitlines()
               if "Arguments" in ln and "row_number" in ln)
    assert "o_custkey" in win, win
    assert "Join" not in p


def test_bm25_recall_bounds_its_broadcast(spark, sf_dir):
    """Self-retrieval eval: scoring stays a term-keyed postings join
    (no corpus cross-join); the only nested-loop is the
    probe-count-bounded phrase broadcast for the relevance pass."""
    p = plan(spark, sf_dir, "retrieval_bm25_recall")
    assert "CartesianProduct" not in p
    assert p.count("BroadcastNestedLoopJoin") <= 2, p


def test_threshold_sweep_single_pair_pass(spark, sf_dir):
    """The sweep must not multiply the pair join per threshold: the
    thresholds are conditional counters over ONE per-vector max-cos
    aggregate (join count independent of the threshold list)."""
    p = plan(spark, sf_dir, "dedup_semantic_threshold_sweep")
    assert "CartesianProduct" not in p
    # One candidate-pair self-join however many thresholds are swept.
    assert p.count("SortMergeJoin") + p.count(
        "BroadcastHashJoin") <= 6, p


def test_doc_keywords_uses_group_limit(spark, sf_dir):
    """Per-doc top-k must plan a WindowGroupLimit (rank pushdown), and
    the df side broadcasts — the postings table never re-shuffles for
    the idf join."""
    p = plan(spark, sf_dir, "text_doc_keywords")
    assert "WindowGroupLimit" in p, p
    assert "CartesianProduct" not in p


def test_audio_zcr_is_map_only_python_stage(spark, sf_dir):
    """ZCR: decode + feature stay one Arrow-batched Python stage over
    the scan — no exchange anywhere (the per-clip answer needs no
    shuffle)."""
    p = plan(spark, sf_dir, "multimodal_audio_zcr")
    assert "Exchange" not in p, p
    assert "ArrowEvalPython" in p or "MapInPandas" in p, p


def test_user_deciles_bin_after_user_aggregate(spark, sf_dir):
    """Deciles: the rank window's input is the per-user aggregate
    (bounded), and binning is floor arithmetic — no ntile anywhere."""
    p = plan(spark, sf_dir, "events_user_deciles")
    assert "Window" in p
    assert "ntile" not in p
    assert "CartesianProduct" not in p


def test_skyline_has_no_global_sort(spark, sf_dir):
    """The skyline must never sort every part row through one task:
    the prefix max is decomposed over price buckets, so the plan has
    NO SinglePartition exchange (no unpartitioned window, no global
    sort) and no part×part pairwise test. The only joins allowed are
    the broadcast of the tiny bucket table (domain-bounded) — the
    inequality self-join over it is a BroadcastNestedLoopJoin by
    construction, never a CartesianProduct."""
    p = plan(spark, sf_dir, "part_price_size_skyline")
    assert "SinglePartition" not in p, p
    assert "CartesianProduct" not in p, p
    assert "Window" in p
    assert "BroadcastHashJoin" in p  # bucket prefix-max joined back


def _single_partition_consumers(p: str) -> list[str]:
    """Node names that directly consume a SinglePartition exchange in a
    formatted plan (nodes are listed in execution order, so the line
    ``(N) <Name>`` right after the exchange's block is its consumer).
    A SinglePartition exchange feeding a grand-total HashAggregate
    moves one pre-combined row per upstream partition — fine at any
    scale; feeding a Sort/Window it funnels the DATA through one task."""
    import re as _re

    nodes = _re.findall(r"^\((\d+)\) ([A-Za-z]+)", p, flags=_re.M)
    sp_ids = set()
    cur = None
    for line in p.splitlines():
        m = _re.match(r"^\((\d+)\) ", line)
        if m:
            cur = int(m.group(1))
        elif "SinglePartition" in line and cur is not None:
            sp_ids.add(cur)
    out = []
    for i, (nid, name) in enumerate(nodes):
        if int(nid) in sp_ids and i + 1 < len(nodes):
            out.append(nodes[i + 1][1])
    return out


def test_exact_quartiles_have_no_single_partition_sort(spark, sf_dir):
    """Global quartiles over the FACT table run through the
    range-partitioned rank decomposition (functions/ranks.py): the
    only SinglePartition exchange allowed is the 1-row-per-partition
    grand-total count reduce — never a Sort or Window over the rows."""
    p = plan(spark, sf_dir, "lineitem_exact_quartiles")
    assert set(_single_partition_consumers(p)) <= {"HashAggregate"}, p
    assert "CartesianProduct" not in p, p
    assert "BroadcastHashJoin" in p  # 3-row target table


def test_ks_drift_has_no_single_partition_cumsum(spark, sf_dir):
    """The KS cumulative counts run over the value axis (grows with
    data) — they must use the range-partitioned cumsum, never an
    unpartitioned running-sum window; SinglePartition may appear only
    as grand-total aggregate reduces."""
    p = plan(spark, sf_dir, "events_ks_drift")
    assert set(_single_partition_consumers(p)) <= {"HashAggregate"}, p
    assert "CartesianProduct" not in p, p


def test_cohort_ltv_window_partitioned_by_cohort(spark, sf_dir):
    """The LTV cumsum windows over the calendar-bounded aggregate,
    partitioned by cohort; the fact-sized work is hash-aggs and one
    custkey-keyed join."""
    p = plan(spark, sf_dir, "customers_cohort_ltv")
    assert "SinglePartition" not in p, p
    assert "ntile" not in p


def test_order_gaps_lag_is_customer_partitioned(spark, sf_dir):
    p = plan(spark, sf_dir, "customers_order_gaps")
    assert "SinglePartition" not in p, p
    assert "Window" in p


def test_discount_elasticity_is_one_hash_agg(spark, sf_dir):
    """The regression aggregate is a single hash-agg over the scan —
    no window, no join, no sort before aggregation."""
    p = plan(spark, sf_dir, "lineitem_discount_elasticity")
    assert "Window" not in p, p
    assert "Join" not in p, p
    assert "HashAggregate" in p


def test_pmi_pairs_are_map_side(spark, sf_dir):
    """PMI pair generation must be the map-side comprehension over each
    doc's filtered token set — never a self-join of the token stream.
    The only BNLJ allowed is the documented 1-row n_docs fold."""
    p = plan(spark, sf_dir, "text_pmi_collocations")
    assert "CartesianProduct" not in p, p
    assert "Generate" in p  # explode of the pair comprehension


def test_dup_rate_by_length_is_two_hash_aggs(spark, sf_dir):
    p = plan(spark, sf_dir, "docs_dup_rate_by_length")
    assert "Window" not in p, p
    assert "CartesianProduct" not in p, p
    assert "HashAggregate" in p


def test_peak_hour_uses_argmax_not_window(spark, sf_dir):
    """max_by carries the argument through the hash-agg — the plan has
    no Window and no Sort (the row_number-=-1 formulation needs a sort
    per group)."""
    p = plan(spark, sf_dir, "events_peak_hour")
    assert "Window" not in p, p
    assert "max_by" in p


def test_burstiness_is_two_hash_aggs(spark, sf_dir):
    p = plan(spark, sf_dir, "events_burstiness")
    assert "Window" not in p, p
    assert "Join" not in p, p
    assert "HashAggregate" in p


def test_fulfillment_latency_windows_partition_by_priority(spark, sf_dir):
    """The latency percentiles come from the (priority, days) histogram
    — every window is priority-partitioned over that bounded grid, and
    the fact-sized work is the order-grain min-shipdate agg plus one
    co-keyed join."""
    p = plan(spark, sf_dir, "orders_fulfillment_latency")
    assert "SinglePartition" not in p, p
    assert "CartesianProduct" not in p, p
    assert "HashAggregate" in p


def test_hourly_autocorr_broadcasts_shifted_series(spark, sf_dir):
    """One fact-table rollup; each lag is a broadcast self-join of the
    bounded hourly series — no sort-merge of the raw events, no
    window."""
    p = plan(spark, sf_dir, "events_hourly_autocorr")
    assert "BroadcastHashJoin" in p, p
    assert "CartesianProduct" not in p, p
    assert "Window" not in p, p


def test_returnflag_anova_is_one_hash_agg(spark, sf_dir):
    """Both sums of squares reduce from a single (status, flag) grain
    hash-agg — no window, no join, no second fact pass."""
    p = plan(spark, sf_dir, "lineitem_returnflag_anova")
    assert "Window" not in p, p
    assert "Join" not in p, p
    assert "HashAggregate" in p


def test_quality_classifier_broadcasts_vocab(spark, sf_dir):
    """Scoring joins the exploded corpus against the PRUNED vocabulary
    — that side must broadcast (it's vocabulary-bounded); the only
    nested-loop join is the documented 1-row prior fold; and the
    doc-grain corpus ⟕ hits join is allowed to be the co-keyed
    shuffle join (hits is corpus-sized — broadcasting it would be the
    wrong plan at 100 TB, even if fixture stats permit it)."""
    p = plan(spark, sf_dir, "text_quality_classifier")
    assert "BroadcastHashJoin" in p, p
    assert "CartesianProduct" not in p, p


def test_epoch_shuffle_has_no_single_partition_sort(spark, sf_dir):
    """The seeded permutation ranks through the range-partitioned
    decomposition — the corpus must never sort through one task;
    SinglePartition may appear only as tiny aggregate reduces."""
    p = plan(spark, sf_dir, "docs_epoch_shuffle")
    assert set(_single_partition_consumers(p)) <= {"HashAggregate"}, p
    assert "CartesianProduct" not in p, p
