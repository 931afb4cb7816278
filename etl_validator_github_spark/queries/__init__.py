"""Driver-contract query catalog: every implemented operator from
SURVEY.md §2 plus the scale extensions, each paired with a DuckDB oracle
where SQL-expressible.

Ordering is load-bearing: the driver's correctness gate checks the FIRST
50 catalog entries in insertion order. Since round 6 the gate window is
an EXPLICIT list (``_R8_GATE``) rather than a composition of module
dicts, so each round's rotation is a single visible edit.

Rotation policy (highest priority first):
1. queries that have never received a driver verdict,
2. queries added or semantically changed this round,
3. back-fill with the queries whose last green verdict is oldest.

Round-8 window under that policy (per the r7 verdict's explicit ask):
the fourteen late-r7 queries that have never held a driver verdict
(docs_bloom_decontaminate, events_user_overlap_sketch, the three
multimodal_audio_* queries, embed_hamming_topk, the six events_*
time-series queries, docs_sample_exact_k, dedup_prefix_filter_join),
then the twenty queries whose last green verdict is r5 — including the
eight benched headliners that sat out r7 under bench.py scrutiny
(q1_pricing_summary, q3_shipping_priority, bankdata_validate,
text_stats, dedup_exact, dedup_minhash_lsh, corpus_clean,
embed_cosine_topk) and the twelve displaced-by-family-representation
entries — exactly the 34 the verdict enumerates. Eleven slots go to
the queries NEW early this round (rotation priority 2: the BPE pair,
BM25, bigram-LM score, table profile, perplexity buckets, SCD2, EWMA,
PageRank, MERGE upsert, basket pairs); the final 5 slots, initially
r6-verdict back-fill, were re-taken mid-round by newer priority-2
queries (RRF fusion, n-gram novelty, fuzzy record linkage, RFM,
brand HHI) — the displaced back-fill (embed_ivf_topk,
dedup_semantic_keep, embed_kmeans, q5, q6) and the other r6-green
entries all keep their r6 verdicts, so after this window lands green
no catalog entry's latest driver verdict is older than r6. The many
mid/late-r8 additions past the window (hard negatives, IVF-PQ +
Matryoshka recalls, curation capstone, expectations, FK audit,
attribution, CUSUM, Benford, skew report, vocab stats, derepeat,
keep-longest, variant/recursive-CTE/UDTF surfaces, triangles) lead
the r9 rotation as never-driver-checked.
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

#: The round-8 driver gate window, in gate-priority order (see module
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

_R8_GATE = (
    # -- added late in r7, never driver-checked (verdict item 1's 14)
    "docs_bloom_decontaminate",
    "events_user_overlap_sketch",
    "multimodal_audio_stats",
    "multimodal_audio_downsample",
    "multimodal_audio_vad",
    "embed_hamming_topk",
    "events_hourly_gapfill",
    "events_hourly_trend",
    "events_winsorized_stats",
    "events_lag_features",
    "events_session_windows",
    "events_sliding_windows",
    "docs_sample_exact_k",
    "dedup_prefix_filter_join",
    # -- new in r8, never driver-checked (rotation priority 2)
    "text_bpe_merges",
    "text_bpe_segment",
    "text_bm25_topk",
    "text_bigram_lm_score",
    "orders_table_profile",
    "docs_perplexity_buckets",
    "changelog_scd2",
    "events_ewma",
    "nation_trade_pagerank",
    "orders_merge_upsert",
    "basket_part_pairs",
    # -- last green verdict r5 (verdict item 1's 20): the 8 benched
    #    headliners that sat out r7 plus the 12 family-represented
    #    entries displaced in r7's rotation. All rotate in here now.
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
    "embed_label_centroids",
    "embed_ann_recall",
    "mixture_upsample",
    "text_normalize",
    "dedup_lsh_recall",
    "dedup_cluster_sizes",
    "docs_split_assign",
    "q1_pricing_summary",
    "q3_shipping_priority",
    # -- added mid-r8 (rotation priority 2 outranks r6 back-fill: the
    #    displaced embed_ivf_topk / dedup_semantic_keep / embed_kmeans /
    #    q5 / q6 all hold r6-green verdicts already). One mid-r8 query,
    #    basket_pair_triangles, didn't fit the 50-slot window and leads
    #    the r9 rotation instead.
    "retrieval_rrf_fusion",
    "text_ngram_novelty",
    "part_name_fuzzy_matches",
    "customers_rfm_segments",
    "brand_supplier_hhi",
)

assert len(_R8_GATE) == _DRIVER_GATE, (
    f"gate window must hold exactly {_DRIVER_GATE} entries, "
    f"got {len(_R8_GATE)}"
)
assert len(set(_R8_GATE)) == len(_R8_GATE), "duplicate names in the gate"
assert set(_R8_GATE) <= set(_ALL), (
    f"gate names missing from the catalog: {set(_R8_GATE) - set(_ALL)}"
)

CATALOG: dict[str, Query] = {
    **{name: _ALL[name] for name in _R8_GATE},
    # Past-gate remainder (every entry here is r6-or-r7-driver-green
    # and parity-mirrored): module registration order.
    **{name: q for name, q in _ALL.items() if name not in set(_R8_GATE)},
}

__all__ = ["CATALOG", "Query", "catalog_to_oracles", "catalog_to_queries"]
