"""Driver-contract query catalog: every implemented operator from
SURVEY.md §2 plus the scale extensions, each paired with a DuckDB oracle
where SQL-expressible.

Ordering is load-bearing: the driver's correctness gate checks the FIRST
50 catalog entries in insertion order. Since round 6 the gate window is
an EXPLICIT list (``_R9_GATE``) rather than a composition of module
dicts, so each round's rotation is a single visible edit.

Rotation policy (highest priority first):
1. queries that have never received a driver verdict,
2. queries added or semantically changed this round,
3. back-fill with the queries whose last green verdict is oldest.

Round-10 window under that policy (the r9 verdict's explicit ask — the
final freshness pass): the sixteen r9 additions that have never held a
driver verdict (with the three most-novel-oracle entries — the
semantic-threshold sweep's shared pair join, the BM25 self-retrieval
recall's derived qrels, the TF-IDF doc keywords — placed FIRST so any
cross-engine drift surfaces at round start), then ``text_ngram_novelty``
(its r8 verdict predates the r9 semi-complement rework, so its current
plan has never been driver-checked), then the twenty r6-stale entries,
then back-fill with the thirteen earliest r7-verdict queries in catalog
order (validate_customer_rules … dedup_chunk_global). After this window
lands green, zero catalog entries are never-driver-checked and nothing
is staler than r7 — the freshness program the r8/r9 verdicts prescribed
is complete. Queries added new in r10 sit past the window and lead the
r11 rotation as never-driver-checked.
"""

from __future__ import annotations

from etl_validator_github_spark.contract import (
    Query,
    catalog_to_oracles,
    catalog_to_queries,
)
from etl_validator_github_spark.queries.relational import (
    RELATIONAL_EXTRA_QUERIES,
    RELATIONAL_QUERIES,
)
from etl_validator_github_spark.queries.validation import VALIDATION_QUERIES
from etl_validator_github_spark.scale.dedup import DEDUP_EXTRA_QUERIES, DEDUP_QUERIES
from etl_validator_github_spark.scale.multimodal import MULTIMODAL_QUERIES
from etl_validator_github_spark.scale.packing import PACKING_QUERIES
from etl_validator_github_spark.scale.retrieval import RETRIEVAL_QUERIES
from etl_validator_github_spark.scale.similarity import SIMILARITY_QUERIES
from etl_validator_github_spark.scale.sketches import SKETCH_QUERIES
from etl_validator_github_spark.scale.snapshots import SNAPSHOT_QUERIES
from etl_validator_github_spark.scale.text import TEXT_EXTRA_QUERIES, TEXT_QUERIES

_DRIVER_GATE = 50

_ALL: dict[str, Query] = {
    **VALIDATION_QUERIES,
    **TEXT_QUERIES,
    **DEDUP_QUERIES,
    **SIMILARITY_QUERIES,
    **RETRIEVAL_QUERIES,
    **SKETCH_QUERIES,
    **MULTIMODAL_QUERIES,
    **PACKING_QUERIES,
    **TEXT_EXTRA_QUERIES,
    **DEDUP_EXTRA_QUERIES,
    **SNAPSHOT_QUERIES,
    **RELATIONAL_QUERIES,
    **RELATIONAL_EXTRA_QUERIES,
}

#: The round-10 driver gate window, in gate-priority order (see module
#: docstring for the rotation rationale of each block).
# A name collision between module dicts would silently drop a query in
# the merge above — fail loudly instead.
_MODULE_DICTS = (
    VALIDATION_QUERIES, TEXT_QUERIES, DEDUP_QUERIES, SIMILARITY_QUERIES,
    RETRIEVAL_QUERIES, SKETCH_QUERIES, MULTIMODAL_QUERIES, PACKING_QUERIES, TEXT_EXTRA_QUERIES,
    DEDUP_EXTRA_QUERIES, SNAPSHOT_QUERIES, RELATIONAL_QUERIES,
    RELATIONAL_EXTRA_QUERIES,
)
assert sum(len(d) for d in _MODULE_DICTS) == len(_ALL), (
    "duplicate query name across module catalogs"
)

_R10_GATE = (
    # -- added in r9, never driver-checked (16); the three with the
    #    most novel oracle SQL lead so cross-engine drift surfaces at
    #    round start (r9 verdict item 5).
    "dedup_semantic_threshold_sweep",
    "retrieval_bm25_recall",
    "text_doc_keywords",
    "multimodal_audio_zcr",
    "corpus_vocab_coverage",
    "docs_split_leakage",
    "customers_revenue_gini",
    "events_mad_outliers",
    "events_seasonal_naive",
    "orders_backlog_timeline",
    "part_metrics_unpivot",
    "lineitem_grouping_sets",
    "customers_percentile_ranks",
    "customers_order_streaks",
    "events_user_deciles",
    "part_price_size_skyline",
    # -- reworked in r9 (semi-complement plan): the r8 verdict covered
    #    the old LEFT-ANTI plan, so the current plan is driver-unchecked.
    "text_ngram_novelty",
    # -- last green verdict r6 (20)
    "text_token_fertility",
    "corpus_quality_drift",
    "q5_local_supplier",
    "q6_forecast_revenue",
    "q18_large_volume_orders",
    "top_customers",
    "customers_with_high_value_orders",
    "latest_order_per_customer",
    "duplicate_customer_priority",
    "priorities_per_customer",
    "events_hourly_rollup",
    "min_balance_suppliers",
    "order_value_percentiles",
    "status_priority_cube",
    "trailing_30d_window",
    "sql_api_segment_balances",
    "null_safe_tier_join",
    "status_rollup",
    "rollup_order_counts",
    "events_hourly_anomalies",
    # -- back-fill: the 13 earliest r7-verdict entries in catalog order
    "validate_customer_rules",
    "validate_error_summary",
    "reconcile_error_sets",
    "text_lang_id",
    "text_bigram_vocab",
    "text_tfidf",
    "text_pandas_udf_score",
    "text_gopher_quality",
    "text_pii_scrub",
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "dedup_clusters",
    "dedup_chunk_global",
)

assert len(_R10_GATE) == _DRIVER_GATE, (
    f"gate window must hold exactly {_DRIVER_GATE} entries, "
    f"got {len(_R10_GATE)}"
)
assert len(set(_R10_GATE)) == len(_R10_GATE), "duplicate names in the gate"
assert set(_R10_GATE) <= set(_ALL), (
    f"gate names missing from the catalog: {set(_R10_GATE) - set(_ALL)}"
)

CATALOG: dict[str, Query] = {
    **{name: _ALL[name] for name in _R10_GATE},
    # Past-gate remainder (every entry here is r7/r8/r9-driver-green
    # and parity-mirrored): module registration order.
    **{name: q for name, q in _ALL.items() if name not in set(_R10_GATE)},
}

__all__ = ["CATALOG", "Query", "catalog_to_oracles", "catalog_to_queries"]
