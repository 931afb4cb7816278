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

Round-11 window under that policy (the r10 verdict's explicit ask):
the twenty-two r10 additions that have never held a driver verdict —
with the three most-novel-oracle entries FIRST (the learned quality
classifier's NB weight/prior folds, the embedding split-leakage audit's
per-cell gram counting, the churn hazard's survival-table reverse
cumulative) so cross-engine drift surfaces at round start — then
back-fill with the twenty-eight oldest r7-verdict queries in catalog
order (decontaminate … customers_without_orders). After this window
lands green, zero catalog entries are never-driver-checked and nothing
is staler than r8 except the nine r7 entries that did not fit
(events_funnel … orders_zorder_cells), which lead the r12 back-fill.
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

_R11_GATE = (
    # -- added in r10, never driver-checked (22); the three with the
    #    most novel oracle SQL lead so cross-engine drift surfaces at
    #    round start (r10 verdict item 1).
    "text_quality_classifier",
    "embed_split_leakage",
    "customers_churn_hazard",
    "retrieval_bm25_mrr",
    "text_classifier_calibration",
    "text_pmi_collocations",
    "docs_dup_rate_by_length",
    "docs_epoch_shuffle",
    "lineitem_exact_quartiles",
    "events_ks_drift",
    "customers_cohort_ltv",
    "customers_order_gaps",
    "supplier_part_degrees",
    "lineitem_discount_elasticity",
    "orders_seasonality_index",
    "events_hourly_ks_drift",
    "events_peak_hour",
    "customers_balance_corr",
    "events_burstiness",
    "orders_fulfillment_latency",
    "events_hourly_autocorr",
    "lineitem_returnflag_anova",
    # -- back-fill: the 28 oldest r7-verdict entries in catalog order
    #    (the remaining 9 r7 entries lead the r12 back-fill).
    "decontaminate",
    "embed_pq_topk",
    "embed_pq_recall",
    "embed_ann_lsh",
    "embed_outliers",
    "dedup_embedding_cosine",
    "embed_quantize_int8",
    "events_distinct_sketch",
    "text_cms_topk_counts",
    "orders_quantile_sketch",
    "multimodal_frame_sample",
    "multimodal_frame_dedup",
    "multimodal_dhash_neardup",
    "pack_sequences",
    "docs_temperature_mixture",
    "text_unigram_lm_score",
    "docs_token_budget_select",
    "docs_importance_resample",
    "docs_domain_cap",
    "dedup_incremental",
    "dedup_fuzzy_keep",
    "dedup_substring_spans",
    "dedup_span_strip",
    "dedup_span_probe",
    "corpus_snapshot_diff",
    "q2_min_cost_supplier",
    "q12_priority_by_status",
    "customers_without_orders",
)

assert len(_R11_GATE) == _DRIVER_GATE, (
    f"gate window must hold exactly {_DRIVER_GATE} entries, "
    f"got {len(_R11_GATE)}"
)
assert len(set(_R11_GATE)) == len(_R11_GATE), "duplicate names in the gate"
assert set(_R11_GATE) <= set(_ALL), (
    f"gate names missing from the catalog: {set(_R11_GATE) - set(_ALL)}"
)

CATALOG: dict[str, Query] = {
    **{name: _ALL[name] for name in _R11_GATE},
    # Past-gate remainder (every entry here is r8/r9/r10-driver-green
    # and parity-mirrored, except the nine r7 stragglers noted above):
    # module registration order.
    **{name: q for name, q in _ALL.items() if name not in set(_R11_GATE)},
}

__all__ = ["CATALOG", "Query", "catalog_to_oracles", "catalog_to_queries"]
