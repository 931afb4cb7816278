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

Round-9 window under that policy (per the r8 verdict's explicit ask):
the twenty-three r8-late queries that have never held a driver verdict
(IVF-PQ topk + both new recall evals, hard negatives, curation-pipeline
capstone, derepeat, lang-ID confusion matrix, Zipf slope, vocab stats,
keep-longest, expectations, triangles, Benford, skew report,
chi-square, ABC, k-anonymity, universe sample, CUSUM, attribution,
FK audit, variant props, reachability), then 27 of the 47 queries whose
last green verdict is r6. The r8 verdict's backfill enumeration names
28 queries for those 27 slots (TPC-H q4/q7/q9/q10/q11/q13-q17/q19-q21
= 13, seven events queries, embed_kmeans, embed_ivf_topk, two
multimodal, two dedup_semantic, date/string_functions = 28); we keep
the 27 earliest in catalog order and the 28th, events_hourly_anomalies,
leads the r10 rotation with the remaining 19 r6-stale entries
(events_hourly_rollup, q5, q6, q18, top_customers,
customers_with_high_value_orders, latest_order_per_customer,
duplicate_customer_priority, priorities_per_customer,
min_balance_suppliers, order_value_percentiles, status_priority_cube,
trailing_30d_window, sql_api_segment_balances, null_safe_tier_join,
status_rollup, rollup_order_counts, text_token_fertility,
corpus_quality_drift). After this window lands green, zero catalog
entries are never-driver-checked and 20 r6-stale remain for r10 —
exactly the two-round clearance the r8 verdict prescribed. Queries
added new in r9 sit past the window and join the r10 rotation as
never-driver-checked (r10 then holds 20 + new ≤ 50).
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

#: The round-9 driver gate window, in gate-priority order (see module
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

_R9_GATE = (
    # -- added late in r8, never driver-checked (verdict item 2's 23)
    "embed_ivfpq_topk",
    "embed_ivfpq_recall",
    "embed_matryoshka_recall",
    "retrieval_hard_negatives",
    "corpus_curation_pipeline",
    "text_derepeat",
    "text_lang_confusion",
    "corpus_zipf_slope",
    "corpus_vocab_stats",
    "dedup_keep_longest",
    "orders_expectations",
    "basket_pair_triangles",
    "orders_benford_digits",
    "lineitem_skew_report",
    "orders_chi2_independence",
    "customers_abc_classes",
    "customers_k_anonymity",
    "warehouse_universe_sample",
    "events_cusum_changepoint",
    "events_attribution",
    "star_schema_fk_audit",
    "events_variant_props",
    "nation_trade_reachability",
    # -- last green verdict r6: the 27 earliest (catalog order) of
    #    the r8 verdict's enumerated backfill; events_hourly_anomalies
    #    (the 28th name) leads r10 with the other 19 r6-stale entries.
    "embed_ivf_topk",
    "dedup_semantic_keep",
    "embed_kmeans",
    "dedup_semantic_incremental",
    "multimodal_features",
    "multimodal_resize",
    "q10_returned_items",
    "q14_promo_share",
    "q4_late_orders",
    "q13_order_count_distribution",
    "q19_disjunctive_predicates",
    "string_functions",
    "date_functions",
    "events_sessionize",
    "events_asof_join",
    "events_range_join",
    "q7_bilateral_trade",
    "q9_product_profit",
    "events_type_pivot",
    "q20_brand_volume_suppliers",
    "q21_sole_late_supplier",
    "q11_important_balances",
    "q15_top_supplier",
    "q16_supplier_variety",
    "q17_small_quantity_revenue",
    "events_retention",
    "events_transitions",
)

assert len(_R9_GATE) == _DRIVER_GATE, (
    f"gate window must hold exactly {_DRIVER_GATE} entries, "
    f"got {len(_R9_GATE)}"
)
assert len(set(_R9_GATE)) == len(_R9_GATE), "duplicate names in the gate"
assert set(_R9_GATE) <= set(_ALL), (
    f"gate names missing from the catalog: {set(_R9_GATE) - set(_ALL)}"
)

CATALOG: dict[str, Query] = {
    **{name: _ALL[name] for name in _R9_GATE},
    # Past-gate remainder (every entry here is r6/r7/r8-driver-green
    # and parity-mirrored): module registration order.
    **{name: q for name, q in _ALL.items() if name not in set(_R9_GATE)},
}

__all__ = ["CATALOG", "Query", "catalog_to_oracles", "catalog_to_queries"]
