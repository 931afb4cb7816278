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
    ]
}
