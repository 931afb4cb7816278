"""Driver-contract query catalog: every implemented operator from
SURVEY.md §2 plus the scale extensions, each paired with a DuckDB oracle
where SQL-expressible.

Ordering is load-bearing: the driver's correctness gate checks the FIRST
50 catalog entries in insertion order. Since round 6 the gate window is
an EXPLICIT list (``_R12_GATE``) rather than a composition of module
dicts, so each round's rotation is a single visible edit.

Rotation policy (highest priority first):
1. queries that have never received a driver verdict,
2. queries added or semantically changed this round,
3. back-fill with the queries whose last green verdict is oldest.

Round-12 window under that policy (the r11 verdict's explicit ask):
the fourteen entries without a driver verdict — the thirteen r11
additions (led by orders_mann_whitney and docs_contamination_13gram,
the two with the most novel oracle SQL: tie-corrected histogram
rank-sum and the 6/7-train distinct-hash contamination index) plus
lineitem_returnflag_anova, r11's one red row, re-checked after its
DECIMAL output columns became STRING (the values were already
bit-identical; only the driver's decimal hashing diverged) — then
embed_external_topk and multimodal_bmp_stats (added this round: the
ivf_topk_for_queries serve contract and the BMP decode path as oracled
queries), then the three queries the round-12 int64-overflow audit
semantically changed (events_hourly_anomalies / events_hourly_trend /
lineitem_discount_elasticity — DECIMAL accumulators, trend's exact
pair now STRING), then the nine r7-stale entries, then back-fill with
the twenty-two oldest r8-verdict queries in catalog order
(bankdata_validate … docs_sample_exact_k). After this window lands
green, zero catalog entries are never-driver-checked and nothing is
staler than r8; 26 r8 rows remain for the r13 back-fill.
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

_R12_GATE = (
    # -- never driver-checked (14): the 13 r11 additions, the two most
    #    novel oracles first, plus the anova re-check after the
    #    decimal-free schema fix.
    "orders_mann_whitney",
    "docs_contamination_13gram",
    "lineitem_returnflag_anova",
    "text_winnow_fingerprints",
    "retrieval_bm25_ndcg",
    "text_code_detect",
    "text_readability_ari",
    "dedup_band_stats",
    "embed_centroid_drift",
    "embed_ivf_nprobe_sweep",
    "orders_runs_test",
    "events_rate_shift",
    "docs_shard_balance",
    "customers_segment_priority_lift",
    # -- added this round (never driver-checked): the external-query
    #    ANN serve contract and the BMP decode path as oracled queries.
    "embed_external_topk",
    "multimodal_bmp_stats",
    # -- semantically changed this round (the int64-overflow audit):
    #    DECIMAL/HUGEINT accumulators; trend also emits its exact
    #    (num, den) pair as STRING now.
    "events_hourly_anomalies",
    "events_hourly_trend",
    "lineitem_discount_elasticity",
    # -- the nine r7-stale entries (oldest verdicts in the catalog).
    "events_funnel",
    "q8_market_share",
    "q22_idle_rich_customers",
    "nation_balance_setops",
    "window_functions",
    "skew_salted_rollup",
    "schema_drift",
    "changelog_latest_state",
    "orders_zorder_cells",
    # -- back-fill: the 22 oldest r8-verdict entries in catalog order
    #    (26 r8 rows remain; they lead the r13 back-fill).
    "bankdata_validate",
    "text_stats",
    "text_quality_embeddings",
    "text_fingerprint",
    "text_top_terms",
    "text_chunks",
    "docs_sample_stratified",
    "dedup_exact",
    "dedup_minhash_lsh",
    "corpus_clean",
    "embed_cosine_topk",
    "embed_hamming_topk",
    "embed_label_centroids",
    "embed_ann_recall",
    "retrieval_rrf_fusion",
    "docs_bloom_decontaminate",
    "events_user_overlap_sketch",
    "multimodal_audio_stats",
    "multimodal_audio_downsample",
    "multimodal_audio_vad",
    "mixture_upsample",
    "docs_sample_exact_k",
)

assert len(_R12_GATE) == _DRIVER_GATE, (
    f"gate window must hold exactly {_DRIVER_GATE} entries, "
    f"got {len(_R12_GATE)}"
)
assert len(set(_R12_GATE)) == len(_R12_GATE), "duplicate names in the gate"
assert set(_R12_GATE) <= set(_ALL), (
    f"gate names missing from the catalog: {set(_R12_GATE) - set(_ALL)}"
)

CATALOG: dict[str, Query] = {
    **{name: _ALL[name] for name in _R12_GATE},
    # Past-gate remainder (every entry here is r8/r9/r10/r11-driver-
    # green and parity-mirrored): module registration order.
    **{name: q for name, q in _ALL.items() if name not in set(_R12_GATE)},
}

__all__ = ["CATALOG", "Query", "catalog_to_oracles", "catalog_to_queries"]
