"""Training-batch construction operators: sequence packing and
mixture upsampling.

Two ops every pretraining data pipeline runs after cleaning/dedup:

- **Sequence packing** — concatenate documents in a deterministic order
  and cut the token stream into fixed-budget training sequences. The
  scalable shape is a windowed running token count inside bounded
  partitions: packing groups are arbitrary by construction, so the
  stream is sharded by a hash of the doc id and each (lang, shard)
  packs independently — partitions stay bounded as the corpus grows
  (no global sort, no single sequential pass at 100 TB).
- **Mixture upsampling** — per-source epoch factors (e.g. books 2.5
  epochs, web 0.25) realized as deterministic row replication: every
  doc gets floor(w) copies plus one more for the md5-threshold fraction
  of docs. Map-side explode, no shuffle until the summary agg; the
  replication decision is a pure function of (doc_id, source) so any
  engine reproduces it bit-identically.

Both are JVM-side column expressions end-to-end (explode / window /
hash-agg) — no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_validator_github_spark.contract import Query, load, md5_mod
from etl_validator_github_spark.scale.text import tokens

#: Tokens per packed training sequence.
SEQ_BUDGET = 256

#: Packing shards per language: caps partition size independently of
#: corpus growth. 8 here; at 100 TB scale this up so each shard's token
#: stream fits an executor's window pass.
N_SHARDS = 8


def _n_tokens() -> F.Column:
    # Same tokenization as every scale/text.py operator — one source of
    # truth for what a "token" is across the engine.
    return F.size(tokens())


def pack_sequences(docs: DataFrame, budget: int = SEQ_BUDGET,
                   n_shards: int = N_SHARDS) -> DataFrame:
    """(lang, shard, seq_id) -> docs/tokens per packed sequence.

    Documents straddle sequence boundaries (pretraining-style continuous
    token stream): a doc belongs to the sequence where it STARTS, i.e.
    seq_id = floor(preceding_tokens / budget) from a running sum over
    the deterministic (doc_id) order within the shard.
    """
    shard = F.pmod(F.col("doc_id"), F.lit(n_shards)).alias("shard")
    with_n = docs.select("doc_id", "lang", shard, _n_tokens().alias("n_tokens"))
    w = (
        Window.partitionBy("lang", "shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # Integer division (div), not float: a shard's running token sum can
    # exceed 2^53 at the 100 TB design point, where double division
    # would round seq_id — `div` stays exact at any scale.
    start = F.sum("n_tokens").over(w) - F.col("n_tokens")
    seq = with_n.withColumn("__start", start).withColumn(
        "seq_id", F.expr(f"__start div {budget}")
    )
    return (
        seq.groupBy("lang", "shard", "seq_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("n_tokens"),
            F.min("doc_id").alias("first_doc_id"),
        )
    )


def _pack_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return pack_sequences(load(spark, sf_dir, "documents"))


_PACK_SQL = f"""
WITH toks AS (
  SELECT doc_id, lang, doc_id % {N_SHARDS} AS shard,
         len(string_split(text, ' ')) AS n_tokens
  FROM documents
), seq AS (
  SELECT lang, shard, doc_id, n_tokens,
         CAST((SUM(n_tokens) OVER (PARTITION BY lang, shard
                                   ORDER BY doc_id
                                   ROWS UNBOUNDED PRECEDING)
               - n_tokens) // {SEQ_BUDGET} AS BIGINT) AS seq_id
  FROM toks
)
SELECT lang, CAST(shard AS BIGINT) AS shard, seq_id,
       COUNT(*) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
       MIN(doc_id) AS first_doc_id
FROM seq
GROUP BY 1, 2, 3
"""

# ---------------------------------------------------------------------------
# Mixture upsampling.
# ---------------------------------------------------------------------------

#: Epoch factor per source, derived from the source id so the policy is
#: a pure expression both engines share: src{K} -> 0.25 + (K % 4) * 0.75
#: = {0.25, 1.0, 1.75, 2.5}.
_W_BASE, _W_STEP, _W_MOD = 0.25, 0.75, 4

#: Fractional-copy decision granularity (md5-threshold, like
#: docs_sample_stratified).
_FRAC_MOD = 10_000


def mixture_upsample(docs: DataFrame) -> DataFrame:
    """Per-source corpus after epoch-factor replication.

    n_copies(doc) = floor(w) + [h(doc_id) < frac(w)], h = first 8 md5
    hex digits of the doc id mod 10000 — the deterministic Bernoulli.
    Replication is explode(sequence(...)) (map-only); the summary agg
    is the only shuffle.
    """
    # Digit-free source values weight as src0 (0 is extracted as the
    # default) instead of silently dropping rows — guarded identically
    # in the SQL oracle below.
    src_num = F.coalesce(
        F.nullif(F.regexp_extract("source", r"(\d+)", 1), F.lit("")),
        F.lit("0"),
    ).cast("int")
    w = F.lit(_W_BASE) + (src_num % _W_MOD).cast("double") * F.lit(_W_STEP)
    frac = F.round((w - F.floor(w)) * _FRAC_MOD).cast("long")
    h = md5_mod("doc_id", _FRAC_MOD)
    n_copies = (F.floor(w).cast("long")
                + F.when(h < frac, F.lit(1)).otherwise(F.lit(0)))
    replicated = (
        docs.select("doc_id", "source", _n_tokens().alias("n_tokens"),
                    n_copies.alias("n_copies"))
        .filter(F.col("n_copies") > 0)
        .select(
            "doc_id", "source", "n_tokens",
            F.explode(F.expr("sequence(1, n_copies)")).alias("copy_idx"),
        )
    )
    return (
        replicated.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_rows_out"),
            F.countDistinct("doc_id").alias("n_docs_in"),
            F.sum("n_tokens").alias("n_tokens_out"),
        )
    )


def _mixture_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return mixture_upsample(load(spark, sf_dir, "documents"))


_MIXTURE_SQL = f"""
WITH weighted AS (
  SELECT doc_id, source,
         len(string_split(text, ' ')) AS n_tokens,
         {_W_BASE} + (CAST(COALESCE(NULLIF(regexp_extract(source, '(\\d+)', 1), ''), '0') AS INT)
                      % {_W_MOD}) * {_W_STEP} AS w
  FROM documents
), copies AS (
  SELECT doc_id, source, n_tokens,
         CAST(floor(w) AS BIGINT)
         + CASE WHEN CAST(concat('0x', substring(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
                     % {_FRAC_MOD}
                     < CAST(round((w - floor(w)) * {_FRAC_MOD}) AS BIGINT)
                THEN 1 ELSE 0 END AS n_copies
  FROM weighted
), replicated AS (
  SELECT doc_id, source, n_tokens
  FROM copies, UNNEST(generate_series(1, CAST(n_copies AS INT))) AS t(copy_idx)
  WHERE n_copies > 0
)
SELECT source,
       COUNT(*) AS n_rows_out,
       COUNT(DISTINCT doc_id) AS n_docs_in,
       CAST(SUM(n_tokens) AS BIGINT) AS n_tokens_out
FROM replicated
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Temperature (alpha) mixture sampling.
# ---------------------------------------------------------------------------

#: md5-threshold granularity for the per-doc keep decision.
_TEMP_MOD = 10_000


def temperature_mixture(docs: DataFrame) -> DataFrame:
    """Per-lang summary of alpha-temperature downsampling (alpha = 0.5).

    The multilingual-pretraining rebalance (XLM arXiv:1901.07291 §3.1,
    mT5 arXiv:2010.11934 §3.2): sample language l proportionally to
    p_l^alpha, which flattens the head languages. Realized downsample-
    only: keep-rate r_l = sqrt(min_tokens / tokens_l), so the smallest
    language keeps everything and a language with 100x its tokens keeps
    10%. alpha is FIXED at 0.5 because IEEE-754 sqrt and division are
    correctly rounded — both engines derive bit-identical rates from
    the same integer token counts, which a pow(x, 0.3) would not
    guarantee across libm implementations.

    Scale shape: one tiny per-lang hash-agg; the global min folds over
    that 5-row aggregate with an empty-partition window (a
    SinglePartition exchange of lang-cardinality rows, NOT a second
    corpus pass); then the corpus takes ONE more scan with the rate
    table broadcast and the keep decision evaluated map-side
    (md5_mod(doc_id) < rate_milli). Never a corpus-wide window or sort.
    """
    toks = docs.select(
        "doc_id", "lang", _n_tokens().alias("n_tokens")
    )
    stats = toks.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs_in"),
        F.sum("n_tokens").alias("n_tokens_in"),
    )
    min_tok = F.min("n_tokens_in").over(Window.partitionBy())
    rated = stats.withColumn(
        "rate_milli",
        F.round(
            F.lit(_TEMP_MOD)
            * F.sqrt(min_tok.cast("double")
                     / F.col("n_tokens_in").cast("double"))
        ).cast("long"),
    ).select("lang", "n_docs_in", "n_tokens_in", "rate_milli")
    keep = md5_mod("doc_id", _TEMP_MOD) < F.col("rate_milli")
    return (
        toks.join(F.broadcast(rated), "lang")
        .groupBy("lang", "n_docs_in", "n_tokens_in", "rate_milli")
        .agg(
            F.sum(F.when(keep, 1).otherwise(0)).alias("n_docs_out"),
            F.sum(F.when(keep, F.col("n_tokens")).otherwise(0))
            .alias("n_tokens_out"),
        )
    )


def _temperature_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return temperature_mixture(load(spark, sf_dir, "documents"))


_TEMPERATURE_SQL = f"""
WITH toks AS (
  SELECT doc_id, lang, len(string_split(text, ' ')) AS n_tokens
  FROM documents
), stats AS (
  SELECT lang, COUNT(*) AS n_docs_in,
         CAST(SUM(n_tokens) AS BIGINT) AS n_tokens_in
  FROM toks GROUP BY 1
), rated AS (
  SELECT lang, n_docs_in, n_tokens_in,
         CAST(round({_TEMP_MOD} * sqrt(
             CAST((SELECT MIN(n_tokens_in) FROM stats) AS DOUBLE)
             / CAST(n_tokens_in AS DOUBLE))) AS BIGINT) AS rate_milli
  FROM stats
), hashed AS (
  SELECT lang, n_tokens,
         CAST(concat('0x', substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))
              AS BIGINT) % {_TEMP_MOD} AS h
  FROM toks
)
SELECT lang, n_docs_in, n_tokens_in, rate_milli,
       CAST(SUM(CASE WHEN h < rate_milli THEN 1 ELSE 0 END) AS BIGINT)
         AS n_docs_out,
       CAST(SUM(CASE WHEN h < rate_milli THEN n_tokens ELSE 0 END) AS BIGINT)
         AS n_tokens_out
FROM hashed JOIN rated USING (lang)
GROUP BY 1, 2, 3, 4
"""


PACKING_QUERIES: dict[str, Query] = {
    q.name: q
    for q in [
        Query("pack_sequences", _pack_q, _PACK_SQL,
              "Sequence packing: sharded running-token-count window cuts "
              "the corpus into fixed-budget training sequences."),
        Query("mixture_upsample", _mixture_q, _MIXTURE_SQL,
              "Training-mixture construction: deterministic per-source "
              "epoch-factor replication (floor + md5-threshold fraction)."),
        Query("docs_temperature_mixture", _temperature_q, _TEMPERATURE_SQL,
              "Alpha-temperature (alpha=0.5) multilingual rebalance: "
              "sqrt keep-rates from per-lang token counts, md5-Bernoulli "
              "downsample, per-lang in/out summary."),
    ]
}
