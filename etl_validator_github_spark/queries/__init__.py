"""Driver-contract query catalog: every implemented operator from
SURVEY.md §2 plus the scale extensions, each paired with a DuckDB oracle
where SQL-expressible.

Ordering is load-bearing: the driver's correctness gate checks the FIRST
50 catalog entries in insertion order. From round 6 the gate window is an
EXPLICIT list (``_R6_GATE``) rather than a composition of module dicts,
so each round's rotation is a single visible edit.

Rotation policy (highest priority first):
1. queries that have never received a driver verdict,
2. queries added or semantically changed this round,
3. back-fill with the queries whose last green verdict is oldest.

Round-6 window under that policy: the two r5 stragglers
(events_retention / events_transitions — the only catalog entries never
driver-checked), the six new r6 queries (dedup_semantic_keep,
dedup_semantic_incremental, embed_kmeans, text_token_fertility,
corpus_quality_drift, events_hourly_anomalies), the three whose plan
or oracle changed this round (embed_ivf_topk map-side assignment;
multimodal_features / multimodal_resize real netpbm decode), then
every query whose last green verdict is r2 (26) or r3 (3), and 10 of
the 15 r4-verdict queries.
Everything rotated out carries a green r5 verdict and stays covered by
the repo-local parity mirror (tests/test_oracle_parity.py,
tests/test_oracle_dtypes.py) over the FULL catalog.
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

_ALL: dict[str, Query] = {
    **VALIDATION_QUERIES,
    **TEXT_QUERIES,
    **DEDUP_QUERIES,
    **SIMILARITY_QUERIES,
    **MULTIMODAL_QUERIES,
    **PACKING_QUERIES,
    **TEXT_EXTRA_QUERIES,
    **DEDUP_EXTRA_QUERIES,
    **SNAPSHOT_QUERIES,
    **RELATIONAL_QUERIES,
    **RELATIONAL_EXTRA_QUERIES,
}

#: The round-6 driver gate window, in gate-priority order (see module
#: docstring for the rotation rationale of each block).
# A name collision between module dicts would silently drop a query in
# the merge above — fail loudly instead.
_MODULE_DICTS = (
    VALIDATION_QUERIES, TEXT_QUERIES, DEDUP_QUERIES, SIMILARITY_QUERIES,
    MULTIMODAL_QUERIES, PACKING_QUERIES, TEXT_EXTRA_QUERIES,
    DEDUP_EXTRA_QUERIES, SNAPSHOT_QUERIES, RELATIONAL_QUERIES,
    RELATIONAL_EXTRA_QUERIES,
)
assert sum(len(d) for d in _MODULE_DICTS) == len(_ALL), (
    "duplicate query name across module catalogs"
)

_R6_GATE = (
    # -- never driver-checked (added past the gate late in r5)
    "events_retention",
    "events_transitions",
    # -- new in r6
    "dedup_semantic_keep",
    "dedup_semantic_incremental",
    "embed_kmeans",
    "text_token_fertility",
    "corpus_quality_drift",
    "events_hourly_anomalies",
    # -- plan/oracle changed in r6
    "embed_ivf_topk",
    "multimodal_features",
    "multimodal_resize",
    # -- last green verdict r2 (oldest on record)
    "q4_late_orders",
    "q5_local_supplier",
    "q6_forecast_revenue",
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
    "min_balance_suppliers",
    "order_value_percentiles",
    "status_priority_cube",
    "status_rollup",
    "rollup_order_counts",
    "trailing_30d_window",
    "sql_api_segment_balances",
    "null_safe_tier_join",
    # -- last green verdict r3
    "top_customers",
    "customers_without_orders",
    "priorities_per_customer",
    # -- last green verdict r4 (10 of 15 — the newest verdicts are the
    #    displacement pool: q12_priority_by_status, skew_salted_rollup,
    #    schema_drift, window_functions and nation_balance_setops sit
    #    past the gate, their operator families already
    #    well-represented in-window)
    "customers_with_high_value_orders",
    "latest_order_per_customer",
    "duplicate_customer_priority",
    "string_functions",
    "date_functions",
    "events_hourly_rollup",
    "events_sessionize",
    "events_asof_join",
    "events_range_join",
    "events_type_pivot",
)

assert len(_R6_GATE) == _DRIVER_GATE, (
    f"gate window must hold exactly {_DRIVER_GATE} entries, "
    f"got {len(_R6_GATE)}"
)
assert len(set(_R6_GATE)) == len(_R6_GATE), "duplicate names in the gate"
assert set(_R6_GATE) <= set(_ALL), (
    f"gate names missing from the catalog: {set(_R6_GATE) - set(_ALL)}"
)

CATALOG: dict[str, Query] = {
    **{name: _ALL[name] for name in _R6_GATE},
    # Past-gate remainder (every entry here is r5-driver-green and
    # parity-mirrored): module registration order.
    **{name: q for name, q in _ALL.items() if name not in set(_R6_GATE)},
}

__all__ = ["CATALOG", "Query", "catalog_to_oracles", "catalog_to_queries"]
