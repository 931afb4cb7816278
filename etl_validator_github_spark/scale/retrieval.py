"""Hybrid retrieval: reciprocal-rank fusion of the lexical (BM25) and
dense (embedding-cosine) ranked lists (Cormack et al. 2009).

The two branches already exist as catalog operators — ``text.bm25_topk``
(inverted postings, term-keyed join) and ``similarity.cosine_topk``
(quantized exact dot products) — so this module only contributes the
fusion: per (query, doc), RRF = Σ_lists 1/(K + rank). A document's dense
representation is the embedding with ``vec_id = doc_id`` (the testdata
tables share the 0..N-1 key space), and a query's dense stand-in is the
embedding with ``vec_id = query_id`` — exactly the shape a production
system has after embedding the query string.

Determinism: the true 1/(K+r) is an infinite binary fraction, and a
float Σ over a variable number of lists is summation-order-dependent —
so the contribution is the INTEGER ``1000000 div (K + rank)`` (floor
micro-units). Monotone in rank, therefore order-equivalent to the real
formula for any fixed list count, and the per-pair sum is exact under
any partitioning or engine.

Scale shape: each branch bounds its own work (postings join / bucketed
ANN); the fusion input is ≤ (k_lex + k_dense) rows per query — a
union + one hash-agg + one per-query top-k window. At 100 TB the fusion
cost is O(queries × k), independent of corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window

from etl_validator_github_spark.contract import Query, load
from etl_validator_github_spark.scale.similarity import _TOPK_SQL, cosine_topk
from etl_validator_github_spark.scale.text import _bm25_sql, bm25_topk

#: Standard RRF smoothing constant (Cormack et al. 2009 use k=60).
RRF_K = 60
#: Per-branch list depth fed into the fusion.
RRF_BRANCH_K = 10
#: Fused list depth returned per query.
RRF_TOP_K = 10
#: Dense-branch query ids: the BM25 query ids (text.BM25_QUERIES uses
#: 1..3), each standing for the embedded form of that query string.
RRF_QUERY_IDS = (1, 2, 3)


def rrf_fuse(lex: DataFrame, dense: DataFrame, k_const: int = RRF_K,
             k_out: int = RRF_TOP_K) -> DataFrame:
    """Fuse two (query_id, doc_id, rnk) ranked lists by reciprocal-rank
    fusion in integer micro-units.

    Union + hash-agg (never a full-outer join: outer joins can't
    broadcast, and the agg keeps the tiny fusion input shuffle-free
    under AQE). ``lex_rnk``/``dense_rnk`` stay NULL for docs absent
    from that branch; ``n_lists`` counts the branches that retrieved
    the doc.
    """
    contribs = lex.select(
        F.col("query_id").cast("int").alias("query_id"),
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("rnk").cast("int").alias("lex_rnk"),
        F.lit(None).cast("int").alias("dense_rnk"),
        F.expr(f"1000000 div ({k_const} + rnk)").cast("long").alias("contrib"),
    ).unionByName(dense.select(
        F.col("query_id").cast("int").alias("query_id"),
        F.col("doc_id").cast("long").alias("doc_id"),
        F.lit(None).cast("int").alias("lex_rnk"),
        F.col("rnk").cast("int").alias("dense_rnk"),
        F.expr(f"1000000 div ({k_const} + rnk)").cast("long").alias("contrib"),
    ))
    fused = contribs.groupBy("query_id", "doc_id").agg(
        F.max("lex_rnk").alias("lex_rnk"),
        F.max("dense_rnk").alias("dense_rnk"),
        F.count(F.lit(1)).cast("int").alias("n_lists"),
        F.sum("contrib").cast("long").alias("rrf_micro"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("rrf_micro"), F.asc("doc_id")
    )
    return (
        fused.withColumn("fused_rnk", F.row_number().over(w).cast("int"))
        .filter(F.col("fused_rnk") <= k_out)
    )


def _rrf_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    embeddings = load(spark, sf_dir, "embeddings")
    lex = bm25_topk(docs, k=RRF_BRANCH_K).select("query_id", "doc_id", "rnk")
    # cosine_topk's query slice is vec_id < N_QUERIES (= 8) ⊇ the BM25
    # query ids; filter to them and align the column names.
    dense = (
        cosine_topk(embeddings, k=RRF_BRANCH_K)
        .filter(F.col("query_id").isin(*RRF_QUERY_IDS))
        .select("query_id", F.col("neighbor_id").alias("doc_id"),
                F.col("rank").alias("rnk"))
    )
    return rrf_fuse(lex, dense)


_QID_LIST = ", ".join(str(q) for q in RRF_QUERY_IDS)

_RRF_SQL = f"""
WITH lex AS (
  {_bm25_sql(k=RRF_BRANCH_K)}
), dense AS (
  {_TOPK_SQL}
), contribs AS (
  SELECT CAST(query_id AS INT) AS query_id,
         CAST(doc_id AS BIGINT) AS doc_id,
         CAST(rnk AS INT) AS lex_rnk, CAST(NULL AS INT) AS dense_rnk,
         CAST(1000000 // ({RRF_K} + rnk) AS BIGINT) AS contrib
  FROM lex
  UNION ALL
  SELECT CAST(query_id AS INT), CAST(neighbor_id AS BIGINT),
         CAST(NULL AS INT), CAST(rank AS INT),
         CAST(1000000 // ({RRF_K} + rank) AS BIGINT)
  FROM dense
  WHERE query_id IN ({_QID_LIST}) AND rank <= {RRF_BRANCH_K}
)
SELECT query_id, doc_id,
       MAX(lex_rnk) AS lex_rnk, MAX(dense_rnk) AS dense_rnk,
       CAST(COUNT(*) AS INT) AS n_lists,
       CAST(SUM(contrib) AS BIGINT) AS rrf_micro,
       CAST(row_number() OVER (
              PARTITION BY query_id
              ORDER BY SUM(contrib) DESC, doc_id ASC) AS INT) AS fused_rnk
FROM contribs
GROUP BY query_id, doc_id
QUALIFY fused_rnk <= {RRF_TOP_K}
"""


# ---------------------------------------------------------------------------
# Hard-negative mining — the standard contrastive-training data op
# (DPR, Karpukhin et al. 2020 use exactly this recipe): documents the
# LEXICAL ranker retrieves highly that the DENSE ranker does NOT
# consider relevant. Those are the pairs an embedding model learns the
# most from, because BM25's term overlap fools a lexical matcher while
# the semantics differ. Composed as the lex list ANTI-JOINED against
# the dense list per query — k-row inputs, so the mining step costs
# O(queries × k) like the fusion above.
# ---------------------------------------------------------------------------


def hard_negatives(lex: DataFrame, dense: DataFrame) -> DataFrame:
    """(query_id, doc_id, lex_rnk): lex-ranked docs absent from the
    dense list — re-ranked densely by lex rank so downstream samplers
    can take the hardest-first prefix."""
    neg = lex.join(
        dense.select("query_id", "doc_id"), ["query_id", "doc_id"],
        "left_anti",
    )
    return neg.select(
        F.col("query_id").cast("int").alias("query_id"),
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("rnk").cast("int").alias("lex_rnk"),
    ).withColumn(
        "neg_rnk",
        F.row_number().over(
            Window.partitionBy("query_id").orderBy(
                F.asc("lex_rnk"), F.asc("doc_id"))
        ).cast("int"),
    )


def _hard_neg_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    embeddings = load(spark, sf_dir, "embeddings")
    lex = bm25_topk(docs, k=RRF_BRANCH_K).select("query_id", "doc_id", "rnk")
    dense = (
        cosine_topk(embeddings, k=RRF_BRANCH_K)
        .filter(F.col("query_id").isin(*RRF_QUERY_IDS))
        .select("query_id", F.col("neighbor_id").alias("doc_id"))
    )
    return hard_negatives(lex, dense)


_HARD_NEG_SQL = f"""
WITH lex AS (
  {_bm25_sql(k=RRF_BRANCH_K)}
), dense AS (
  {_TOPK_SQL}
), neg AS (
  SELECT l.query_id, l.doc_id, l.rnk AS lex_rnk
  FROM lex l
  ANTI JOIN (
    SELECT query_id, neighbor_id AS doc_id FROM dense
    WHERE query_id IN ({_QID_LIST}) AND rank <= {RRF_BRANCH_K}
  ) d USING (query_id, doc_id)
)
SELECT CAST(query_id AS INT) AS query_id,
       CAST(doc_id AS BIGINT) AS doc_id,
       CAST(lex_rnk AS INT) AS lex_rnk,
       CAST(row_number() OVER (PARTITION BY query_id
                               ORDER BY lex_rnk ASC, doc_id ASC) AS INT)
         AS neg_rnk
FROM neg
"""


# ---------------------------------------------------------------------------
# Lexical self-retrieval eval (the BEIR-style recall@k protocol,
# Thakur et al. 2021, with data-derived qrels) — the scorecard the BM25
# branch was missing (the dense family already has ann/lsh/pq/
# matryoshka recalls): queries are 10-token phrases SLICED FROM probe
# documents, the relevant set is every doc whose text contains the
# exact phrase (the probe itself plus its duplicates/quoters), and the
# report is recall@k + the probe's own rank. Qrels are derived from
# the data identically in both engines — no hand-labeled fixture.
#
# Scale shape: the scoring is the standard postings join (work ∝
# matching postings); the relevance pass is ONE broadcast of
# |probes| phrases against the corpus (the `decontaminate` guarded-
# broadcast pattern — bounded by the probe count, never by the
# corpus); everything after is k-row-per-query arithmetic.
# ---------------------------------------------------------------------------

#: Probe documents whose 10-token slices become the eval queries.
#: Slice geometry picked empirically at sf0.01: 10 tokens from offset 7
#: give 7/8 probes perfect self-recall with one visible failure — a
#: 4-token slice was stopword-dominated and scored 1/8 (an eval that
#: mostly reports zero teaches nothing).
BM25_EVAL_PROBE_IDS = (10, 30, 50, 70, 90, 110, 130, 150)
BM25_EVAL_SLICE_START = 7   # 1-based token offset of the phrase
BM25_EVAL_SLICE_LEN = 10
BM25_EVAL_K = 10


def _self_eval_frames(
    docs: DataFrame,
    probe_ids: tuple[int, ...],
    k: int,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Shared eval plumbing for the self-retrieval scorecards: returns
    (probes, hits, relevant) — the sliced phrase queries, the BM25
    top-k per query, and the data-derived qrels. Both heavy frames sit
    behind lazy checkpoints so each consumer reuses them."""
    from etl_validator_github_spark.scale.text import (
        bm25_from_postings,
        doc_postings,
    )

    probes = docs.filter(F.col("doc_id").isin(*probe_ids)).select(
        F.col("doc_id").cast("int").alias("query_id"),
        F.slice(F.split("text", " "), BM25_EVAL_SLICE_START,
                BM25_EVAL_SLICE_LEN).alias("qtoks"),
    )
    qterms = probes.select(
        "query_id", F.explode("qtoks").alias("term")
    )
    # Both small derived tables feed multiple consumers below — the
    # standard lazy localCheckpoint barrier stops each consumer from
    # re-running the postings join / corpus relevance scan.
    hits = bm25_from_postings(doc_postings(docs), qterms, k) \
        .localCheckpoint(eager=False)
    phrases = probes.select(
        "query_id", F.array_join("qtoks", " ").alias("phrase")
    )
    relevant = (
        docs.select("doc_id", "text")
        .crossJoin(F.broadcast(phrases))  # |probes|-row guarded fold
        # Space-padded containment so the phrase matches only on token
        # boundaries (a raw substring check can match inside longer
        # tokens at the slice edges, inflating n_relevant).
        .filter(F.expr("contains(concat(' ', text, ' '),"
                       " concat(' ', phrase, ' '))"))
        .select("query_id", "doc_id")
        .localCheckpoint(eager=False)
    )
    return probes, hits, relevant


def bm25_self_retrieval(docs: DataFrame,
                        probe_ids: tuple[int, ...] = BM25_EVAL_PROBE_IDS,
                        k: int = BM25_EVAL_K) -> DataFrame:
    """Per probe query: n_relevant, n_hits_relevant, self_rank (NULL
    if the probe doc fell outside the top-k), recall@k in milli."""
    probes, hits, relevant = _self_eval_frames(docs, probe_ids, k)
    rel_stats = relevant.groupBy("query_id").agg(
        F.count(F.lit(1)).cast("int").alias("n_relevant")
    )
    # hits is structurally bounded (|probes| x k rows) at ANY corpus
    # scale, and the tiny per-query aggregates below are bounded by
    # |probes|: broadcast them so the planner never falls back to
    # sort-merge on frames it cannot size post-barrier (r13; the
    # family's plans carried 2-3 SMJs of <100-row frames).
    hit_rel = (
        F.broadcast(hits).join(relevant, ["query_id", "doc_id"])
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).cast("int").alias("n_hits_relevant"))
    )
    self_rank = (
        hits.filter(F.col("doc_id") == F.col("query_id"))
        .groupBy("query_id")
        .agg(F.min("rnk").cast("int").alias("self_rank"))
    )
    return (
        rel_stats
        .join(F.broadcast(hit_rel), "query_id", "left")
        .join(F.broadcast(self_rank), "query_id", "left")
        .select(
            "query_id", "n_relevant",
            F.coalesce("n_hits_relevant", F.lit(0)).cast("int")
            .alias("n_hits_relevant"),
            F.col("self_rank").cast("int").alias("self_rank"),
            F.expr("cast((1000 * coalesce(n_hits_relevant, 0))"
                   " div n_relevant as int)").alias("recall_milli"),
        )
    )


def bm25_self_mrr(docs: DataFrame,
                  probe_ids: tuple[int, ...] = BM25_EVAL_PROBE_IDS,
                  k: int = BM25_EVAL_K) -> DataFrame:
    """Mean-reciprocal-rank scorecard over the same derived qrels:
    per probe query, the rank of the FIRST relevant hit in the top-k
    and its reciprocal in micro-units (0 when nothing relevant made
    the cut — the convention that makes MRR averageable). Complements
    recall@k: recall counts coverage, RR measures how high the first
    good answer sits."""
    probes, hits, relevant = _self_eval_frames(docs, probe_ids, k)
    # Bounded-frame broadcasts (see bm25_self_retrieval, r13).
    fr = (
        F.broadcast(hits).join(relevant, ["query_id", "doc_id"])
        .groupBy("query_id")
        .agg(F.min("rnk").cast("int").alias("first_rel_rank"))
    )
    return (
        probes.select("query_id")
        .join(F.broadcast(fr), "query_id", "left")
        .select(
            "query_id",
            "first_rel_rank",
            F.expr("cast(coalesce(1000000 div first_rel_rank, 0)"
                   " as bigint)").alias("rr_micro"),
        )
    )


def _ndcg_discounts(k: int) -> list[int]:
    """DCG rank discounts as exact micro-integers: ⌊10⁶ / log2(r+1)⌋
    for r = 1..k, computed ONCE here and embedded as literal constants
    in BOTH engines. Spark's LOG2 and DuckDB's log2 are separate libm
    implementations that can disagree in the last ulp, so the discount
    table — not a per-engine log call — is the cross-engine contract
    (the same trick the kmeans oracle uses for iteration unrolling)."""
    import math

    return [int(1_000_000 // math.log2(r + 1)) for r in range(1, k + 1)]


def bm25_self_ndcg(docs: DataFrame,
                   probe_ids: tuple[int, ...] = BM25_EVAL_PROBE_IDS,
                   k: int = BM25_EVAL_K) -> DataFrame:
    """NDCG@k scorecard over the same derived qrels (binary gains):
    DCG = Σ disc(rank) over relevant hits, IDCG = Σ disc(1..min(n_rel,
    k)) — both exact integer sums over the shared discount table, so
    the readout is bit-identical cross-engine. Complements recall@k
    (coverage) and MRR (first hit): NDCG rewards stacking ALL the
    relevant docs high. Public method: Järvelin & Kekäläinen 2002."""
    probes, hits, relevant = _self_eval_frames(docs, probe_ids, k)
    disc = _ndcg_discounts(k)
    idcg_prefix = [sum(disc[:i + 1]) for i in range(k)]
    # Bounded-frame broadcasts (see bm25_self_retrieval, r13).
    dcg = (
        F.broadcast(hits).join(relevant, ["query_id", "doc_id"])
        .groupBy("query_id")
        .agg(F.sum(F.element_at(F.array(*[F.lit(d) for d in disc]),
                                F.col("rnk"))).cast("long")
             .alias("dcg_micro"))
    )
    rel_stats = relevant.groupBy("query_id").agg(
        F.count(F.lit(1)).cast("int").alias("n_relevant")
    )
    idcg = F.element_at(
        F.array(*[F.lit(v) for v in idcg_prefix]),
        F.least(F.col("n_relevant"), F.lit(k)),
    ).cast("long")
    return (
        rel_stats.join(F.broadcast(dcg), "query_id", "left")
        .select(
            "query_id", "n_relevant",
            F.coalesce("dcg_micro", F.lit(0)).cast("long")
            .alias("dcg_micro"),
            idcg.alias("idcg_micro"),
        )
        .withColumn(
            "ndcg_milli",
            F.expr("cast((1000 * dcg_micro) div idcg_micro as int)"),
        )
    )


def _bm25_recall_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return bm25_self_retrieval(load(spark, sf_dir, "documents"))


def _bm25_mrr_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return bm25_self_mrr(load(spark, sf_dir, "documents"))


def _bm25_ndcg_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return bm25_self_ndcg(load(spark, sf_dir, "documents"))


def _bm25_eval_cte() -> str:
    """Shared oracle CTE chain (probes → scoring → ranked top-k →
    derived qrels) for the self-retrieval scorecards — the SQL mirror
    of ``_self_eval_frames``."""
    from etl_validator_github_spark.scale.text import (
        BM25_B,
        BM25_K1,
    )

    ids = ", ".join(str(i) for i in BM25_EVAL_PROBE_IDS)
    lo = BM25_EVAL_SLICE_START
    hi = BM25_EVAL_SLICE_START + BM25_EVAL_SLICE_LEN - 1
    return f"""
WITH probes AS (
  SELECT CAST(doc_id AS INT) AS query_id,
         list_slice(string_split(text, ' '), {lo}, {hi}) AS qtoks,
         array_to_string(list_slice(string_split(text, ' '),
                                    {lo}, {hi}), ' ') AS phrase
  FROM documents WHERE doc_id IN ({ids})
), q AS (
  SELECT query_id, unnest(qtoks) AS term FROM probes
), tok AS (
  SELECT doc_id, len(string_split(text, ' ')) AS dl,
         unnest(string_split(text, ' ')) AS term
  FROM documents
), tf AS (
  SELECT doc_id, dl, term, COUNT(*) AS tf FROM tok GROUP BY 1, 2, 3
), ptf AS (
  SELECT tf.* FROM tf JOIN (SELECT DISTINCT term FROM q) qt USING (term)
), df AS (
  SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM ptf GROUP BY 1
), stats AS (
  SELECT COUNT(*) AS n_docs,
         CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS total_tokens
  FROM documents
), scored AS (
  SELECT q.query_id, p.doc_id,
         CAST(round(
           LN(1.0 + (CAST(s.n_docs - d.df AS DOUBLE) + 0.5)
                    / (CAST(d.df AS DOUBLE) + 0.5))
           * ((CAST(p.tf AS DOUBLE) * {BM25_K1 + 1.0})
              / (CAST(p.tf AS DOUBLE)
                 + {BM25_K1} * ({1.0 - BM25_B} + {BM25_B}
                    * (CAST(p.dl AS DOUBLE)
                       / (CAST(s.total_tokens AS DOUBLE) / s.n_docs)))))
           * 1000000.0) AS BIGINT) AS contrib_micro
  FROM ptf p
  JOIN q ON p.term = q.term
  JOIN df d ON p.term = d.term
  CROSS JOIN stats s
), agg AS (
  SELECT query_id, doc_id, CAST(SUM(contrib_micro) AS BIGINT) AS score_micro
  FROM scored GROUP BY 1, 2
), ranked AS (
  SELECT query_id, doc_id,
         CAST(row_number() OVER (PARTITION BY query_id
                                 ORDER BY score_micro DESC, doc_id ASC)
              AS INT) AS rnk
  FROM agg
  QUALIFY rnk <= {BM25_EVAL_K}
), relevant AS (
  SELECT p.query_id, d.doc_id
  FROM documents d CROSS JOIN probes p
  WHERE contains(concat(' ', d.text, ' '), concat(' ', p.phrase, ' '))
)"""


def _bm25_recall_sql() -> str:
    return _bm25_eval_cte() + """, rs AS (
  SELECT query_id, CAST(COUNT(*) AS INT) AS n_relevant
  FROM relevant GROUP BY 1
), hr AS (
  SELECT r.query_id, CAST(COUNT(*) AS INT) AS n_hits_relevant
  FROM ranked r JOIN relevant USING (query_id, doc_id) GROUP BY 1
), sr AS (
  SELECT query_id, CAST(MIN(rnk) AS INT) AS self_rank
  FROM ranked WHERE doc_id = query_id GROUP BY 1
)
SELECT rs.query_id, rs.n_relevant,
       CAST(COALESCE(hr.n_hits_relevant, 0) AS INT) AS n_hits_relevant,
       sr.self_rank,
       CAST((1000 * COALESCE(hr.n_hits_relevant, 0)) // rs.n_relevant
            AS INT) AS recall_milli
FROM rs
LEFT JOIN hr USING (query_id)
LEFT JOIN sr USING (query_id)
"""


def _bm25_mrr_sql() -> str:
    return _bm25_eval_cte() + """, fr AS (
  SELECT r.query_id, CAST(MIN(r.rnk) AS INT) AS first_rel_rank
  FROM ranked r JOIN relevant USING (query_id, doc_id)
  GROUP BY 1
)
SELECT p.query_id, fr.first_rel_rank,
       CAST(COALESCE(1000000 // fr.first_rel_rank, 0) AS BIGINT)
         AS rr_micro
FROM (SELECT query_id FROM probes) p
LEFT JOIN fr USING (query_id)
"""


def _bm25_ndcg_sql() -> str:
    k = BM25_EVAL_K
    disc = _ndcg_discounts(k)
    idcg_prefix = [sum(disc[:i + 1]) for i in range(k)]
    disc_list = "[" + ", ".join(str(d) for d in disc) + "]"
    idcg_list = "[" + ", ".join(str(v) for v in idcg_prefix) + "]"
    return _bm25_eval_cte() + f""", dcg AS (
  SELECT r.query_id,
         CAST(SUM(({disc_list})[r.rnk]) AS BIGINT) AS dcg_micro
  FROM ranked r JOIN relevant USING (query_id, doc_id)
  GROUP BY 1
), rs AS (
  SELECT query_id, CAST(COUNT(*) AS INT) AS n_relevant
  FROM relevant GROUP BY 1
)
SELECT rs.query_id, rs.n_relevant,
       CAST(COALESCE(dcg.dcg_micro, 0) AS BIGINT) AS dcg_micro,
       CAST(({idcg_list})[LEAST(rs.n_relevant, {k})] AS BIGINT)
         AS idcg_micro,
       CAST((1000 * COALESCE(dcg.dcg_micro, 0))
            // ({idcg_list})[LEAST(rs.n_relevant, {k})] AS INT)
         AS ndcg_milli
FROM rs LEFT JOIN dcg USING (query_id)
"""


RETRIEVAL_QUERIES: dict[str, Query] = {
    q.name: q
    for q in [
        Query("retrieval_rrf_fusion", _rrf_q, _RRF_SQL,
              "Hybrid retrieval: BM25 and embedding-cosine top-10 lists "
              "fused by reciprocal-rank fusion in integer micro-units "
              "(1000000 div (60+rank)); fusion cost O(queries × k), "
              "independent of corpus size."),
        Query("retrieval_hard_negatives", _hard_neg_q, _HARD_NEG_SQL,
              "Hard-negative mining (DPR recipe): lexically-retrieved "
              "docs absent from the dense list, per query — the "
              "contrastive-training pairs; k-row anti-join, cost "
              "independent of corpus size."),
        Query("retrieval_bm25_recall", _bm25_recall_q, _bm25_recall_sql(),
              "Lexical self-retrieval eval: 10-token phrases sliced "
              "from probe docs, relevance = exact-phrase containment; "
              "recall@10 + the probe's own rank, qrels derived from "
              "the data in both engines."),
        Query("retrieval_bm25_mrr", _bm25_mrr_q, _bm25_mrr_sql(),
              "Reciprocal-rank scorecard over the same derived qrels: "
              "rank of the first relevant hit per query, rr in "
              "micro-units (0 when the top-k has no relevant doc) — "
              "the shared eval CTE chain feeds both scorecards."),
        Query("retrieval_bm25_ndcg", _bm25_ndcg_q, _bm25_ndcg_sql(),
              "NDCG@k over the same derived qrels with binary gains: "
              "exact integer DCG/IDCG sums over a shared literal "
              "discount table (log2 computed once in Python, never "
              "per-engine), so the graded-ranking readout is "
              "bit-identical cross-engine."),
    ]
}
