"""Driver-contract query catalog: every implemented operator from
SURVEY.md §2 plus the scale extensions, each paired with a DuckDB oracle
where SQL-expressible.

Ordering is load-bearing: the driver's correctness gate checks the FIRST
50 catalog entries in insertion order. Since round 6 the gate window is
an EXPLICIT list (``_R13_GATE``) rather than a composition of module
dicts, so each round's rotation is a single visible edit.

Rotation policy (highest priority first):
1. queries that have never received a driver verdict,
2. queries added or semantically changed this round,
3. back-fill with the queries whose last green verdict is oldest.

Round-13 window under that policy (the r12 verdict's explicit ask,
adjusted for the seven queries added this round): the seven
never-checked r13 additions (multimodal_png_stats — the stdlib-zlib
PNG decoder with all five unfilter branches; multimodal_adpcm_stats —
the IMA-ADPCM state-machine decoder whose oracle re-runs the decode in
a recursive CTE; multimodal_gif_stats — the LZW decompressor;
multimodal_mulaw_stats — the G.711 expansion; multimodal_jpeg_stats —
the baseline-JPEG coefficient-domain decoder; multimodal_flac_stats —
the lossless FLAC decoder over a stereo mid/side fixture;
multimodal_avi_stats — the MJPEG AVI container with per-frame JPEG
decode and the frame-axis IDCT oracle), then the twenty-six r8-stale
queries in their r8-gate order (events_hourly_gapfill …
brand_supplier_hhi; the r12 judge pre-verified 8 of these green at
sf0.01), then back-fill with the seventeen oldest r9-verdict queries
in their r9-gate order (embed_ivfpq_topk … customers_k_anonymity).
After this window lands green, nothing in the catalog is staler than
r9, and the 33 remaining r9 rows lead the r14 back-fill.
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

#: The round-13 driver gate window, in gate-priority order (see module
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

_R13_GATE = (
    # -- never driver-checked (7): the r13 codec additions.
    "multimodal_png_stats",
    "multimodal_adpcm_stats",
    "multimodal_gif_stats",
    "multimodal_mulaw_stats",
    "multimodal_jpeg_stats",
    "multimodal_flac_stats",
    "multimodal_avi_stats",
    # -- the 26 r8-stale queries (oldest verdicts in the catalog), in
    #    their r8-gate order.
    "events_hourly_gapfill",
    "events_winsorized_stats",
    "events_lag_features",
    "events_session_windows",
    "events_sliding_windows",
    "dedup_prefix_filter_join",
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
    "text_normalize",
    "dedup_lsh_recall",
    "dedup_cluster_sizes",
    "docs_split_assign",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "part_name_fuzzy_matches",
    "customers_rfm_segments",
    "brand_supplier_hhi",
    # -- back-fill: the 17 oldest r9-verdict queries in their r9-gate
    #    order (33 r9 rows remain; they lead the r14 back-fill).
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
)

assert len(_R13_GATE) == _DRIVER_GATE, (
    f"gate window must hold exactly {_DRIVER_GATE} entries, "
    f"got {len(_R13_GATE)}"
)
assert len(set(_R13_GATE)) == len(_R13_GATE), "duplicate names in the gate"
assert set(_R13_GATE) <= set(_ALL), (
    f"gate names missing from the catalog: {set(_R13_GATE) - set(_ALL)}"
)

CATALOG: dict[str, Query] = {
    **{name: _ALL[name] for name in _R13_GATE},
    # Past-gate remainder (every entry here is r9/r10/r11/r12-driver-
    # green and parity-mirrored): module registration order.
    **{name: q for name, q in _ALL.items() if name not in set(_R13_GATE)},
}

__all__ = ["CATALOG", "Query", "catalog_to_oracles", "catalog_to_queries"]
