"""Driver-contract query catalog: every implemented operator from
SURVEY.md §2 plus the scale extensions, each paired with a DuckDB oracle
where SQL-expressible.

Ordering is load-bearing: the driver's correctness gate checks the FIRST
50 catalog entries in insertion order. The scale extensions (validation,
text, dedup, similarity, multimodal) are the highest-risk, least
SQL-textbook queries, so they come first, followed by relational queries
in operator-evidence priority order (one representative per operator
family / join shape). The long tail of near-redundant TPC-H variants
sits past the gate window; those remain fully covered by the repo-local
parity tests (tests/test_oracle_parity.py, tests/test_oracle_dtypes.py)
and carry green driver verdicts from rounds 1-2.
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
from etl_validator_github_spark.scale.similarity import SIMILARITY_QUERIES
from etl_validator_github_spark.scale.snapshots import SNAPSHOT_QUERIES
from etl_validator_github_spark.scale.text import TEXT_EXTRA_QUERIES, TEXT_QUERIES

_DRIVER_GATE = 50

_SCALE: dict[str, Query] = {
    **VALIDATION_QUERIES,
    **TEXT_QUERIES,
    **DEDUP_QUERIES,
    **SIMILARITY_QUERIES,
    **MULTIMODAL_QUERIES,
}

# Relational queries ranked by operator-evidence value: each name up to
# the gate boundary is the sole (or best) catalog witness for a SURVEY
# §2 operator family; later names are additional TPC-H shapes whose
# operator families are already represented above.
#
# Gate ROTATION (round 5): the five catalog queries that have never had
# a green driver verdict (pack_sequences, mixture_upsample,
# text_unigram_lm_score, dedup_incremental — all landed past the gate in
# r4 — plus changelog_latest_state, which sat last in this list every
# round) move INSIDE the window: the four r4 modules now register right
# after _SCALE, and changelog_latest_state leads this list. The three
# operators reworked this round (dedup_ngram_jaccard, dedup_simhash,
# dedup_embedding_cosine) stay in-gate via _SCALE so their new shapes
# get official verdicts, and the new r5 operators (dedup_fuzzy_keep,
# dedup_lsh_recall, docs_token_budget_select, multimodal_frame_dedup)
# register with _SCALE/extras (events_funnel, also new, slots in right
# after changelog_latest_state). Rotated OUT to make room (all
# driver-green in r4): nation_balance_setops, window_functions,
# skew_salted_rollup, schema_drift, events_type_pivot, date_functions,
# and the events quartet (hourly_rollup/sessionize/asof_join/
# range_join).
_RELATIONAL_PRIORITY = (
    "changelog_latest_state",           # CDC compaction (r5 rotation IN)
    "events_funnel",                    # staged funnel (new in r5)
    "q1_pricing_summary",               # flagship scan→agg (A-family)
    "q3_shipping_priority",             # broadcast join + deterministic top-k
    "customers_with_high_value_orders", # J2 IN-list semi-join
    "latest_order_per_customer",        # O2 window dedup
    "duplicate_customer_priority",      # J4/R23 duplicate detection
    "q12_priority_by_status",           # A2/A4 conditional counts
    "string_functions",                 # §2.9 string fns + F-filters
    "date_functions",                   # §2.9 date fns
    "events_hourly_rollup",             # F3 time-window + json extraction
    "events_sessionize",                # custom sessionize operator
    "events_asof_join",                 # custom as-of join operator
    "events_range_join",                # custom bucketed range join
    "nation_balance_setops",            # T1-T3 set ops (r5 rotation OUT)
    "window_functions",                 # window family (r5 rotation OUT)
    "skew_salted_rollup",               # skew-salting (r5 rotation OUT)
    "schema_drift",                     # R24 schema check (r5 rotation OUT)
    "events_type_pivot",                # pivot operator (r5 rotation OUT)
    "top_customers",                    # J1 lookup join
    "customers_without_orders",         # anti-join
    "priorities_per_customer",          # A1 collect_list
    "status_rollup",                    # grouping-sets representative
    "q5_local_supplier",                # 6-way all-broadcast join shape
    "order_value_percentiles",          # percentile functions
    "null_safe_tier_join",              # null-safe equality join
    "trailing_30d_window",              # range-frame window
    "sql_api_segment_balances",         # spark.sql() API surface
    "q6_forecast_revenue",              # pushdown scan-filter-agg
    "min_balance_suppliers",
    "q4_late_orders",
    "q7_bilateral_trade",
    "q8_market_share",
    "q9_product_profit",
    "q10_returned_items",
    "q11_important_balances",
    "q13_order_count_distribution",
    "q14_promo_share",
    "q15_top_supplier",
    "q16_supplier_variety",
    "q17_small_quantity_revenue",
    "q18_large_volume_orders",
    "q19_disjunctive_predicates",
    "q20_brand_volume_suppliers",
    "q21_sole_late_supplier",
    "q22_idle_rich_customers",
    "status_priority_cube",
    "rollup_order_counts",
)

assert set(_RELATIONAL_PRIORITY) == set(RELATIONAL_QUERIES), (
    "relational priority list out of sync with RELATIONAL_QUERIES: "
    f"{set(_RELATIONAL_PRIORITY) ^ set(RELATIONAL_QUERIES)}"
)

CATALOG: dict[str, Query] = {
    **_SCALE,
    # r5 rotation IN: the r4 modules and the new r5 operators register
    # directly after _SCALE so they sit inside the driver's 50-entry
    # window this round.
    **PACKING_QUERIES,
    **TEXT_EXTRA_QUERIES,
    **DEDUP_EXTRA_QUERIES,
    **SNAPSHOT_QUERIES,
    **{name: RELATIONAL_QUERIES[name] for name in _RELATIONAL_PRIORITY},
    # Past-gate additions: registered LAST so the 50-entry gate window
    # composition above is untouched.
    **RELATIONAL_EXTRA_QUERIES,
}

# The _SCALE block (validation/text/dedup/similarity/multimodal) must fit
# the driver's 50-entry gate window so the gate composition stays as
# documented above.
assert len(_SCALE) <= _DRIVER_GATE, "_SCALE block overflows the driver gate"

# The r5 rotation's whole point: every query that has never received a
# green driver verdict, plus every operator reworked or added this
# round, must sit INSIDE the gate window. A reordering that silently
# pushes one past the boundary defeats the rotation — fail loudly.
_R5_MUST_GATE = {
    "changelog_latest_state", "pack_sequences", "mixture_upsample",
    "text_unigram_lm_score", "dedup_incremental",            # never green
    "dedup_ngram_jaccard", "dedup_simhash", "dedup_embedding_cosine",
    "dedup_fuzzy_keep", "dedup_lsh_recall", "docs_token_budget_select",
    "multimodal_frame_dedup", "events_funnel",
    "corpus_snapshot_diff", "docs_split_assign",
    "text_normalize", "dedup_cluster_sizes",
    "embed_quantize_int8",                                   # r5 work
}
_GATE = set(list(CATALOG)[:_DRIVER_GATE])
assert _R5_MUST_GATE <= _GATE, (
    f"r5 rotation targets fell out of the gate: {_R5_MUST_GATE - _GATE}"
)

__all__ = ["CATALOG", "Query", "catalog_to_oracles", "catalog_to_queries"]
