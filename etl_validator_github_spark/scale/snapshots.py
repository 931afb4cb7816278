"""Corpus lifecycle operators: snapshot diffing and split assignment.

Two operations every managed training corpus needs beyond cleaning:

- **Snapshot diff** — given two corpus versions, classify every doc_id
  as added / removed / changed / unchanged by comparing content hashes.
  The 100 TB shape: ONE full-outer join on the uniform doc_id key where
  each side carries only (doc_id, md5) — document text never moves
  through the join, so the diff costs two map passes + one hash-keyed
  shuffle regardless of document sizes.
- **Train/val/test split** — deterministic md5-threshold assignment per
  document (the same portable-hash Bernoulli used by
  ``docs_sample_stratified`` and ``mixture_upsample``): any engine, any
  partitioning, any rerun produces the identical split, which is what
  makes a split reproducible across a pipeline rebuild. Map-only until
  the per-(lang, source, split) summary aggregation.

Both are pure column math over md5 — no UDFs, no collects.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_validator_github_spark.contract import Query, load, md5_mod

# ---------------------------------------------------------------------------
# Snapshot diff. The catalog query derives both versions deterministically
# from the fixture so every status class is populated: the "old" version
# drops doc_id % 11 == 5 (→ added in new), the "new" version drops
# doc_id % 13 == 7 (→ removed), and doc_id % 17 == 3 docs get an edit
# suffix in the new version (→ changed).
# ---------------------------------------------------------------------------

_OLD_DROP_MOD, _OLD_DROP_REM = 11, 5
_NEW_DROP_MOD, _NEW_DROP_REM = 13, 7
_EDIT_MOD, _EDIT_REM = 17, 3


def snapshot_diff(old: DataFrame, new: DataFrame) -> DataFrame:
    """(doc_id, status) for every doc in either version; status in
    added / removed / changed (unchanged rows are dropped — at scale
    they are the overwhelming majority and carry no information)."""
    o = old.select("doc_id", F.md5("text").alias("old_hash"))
    n = new.select("doc_id", F.md5("text").alias("new_hash"))
    joined = o.join(n, "doc_id", "full_outer")
    status = (
        F.when(F.col("old_hash").isNull(), F.lit("added"))
        .when(F.col("new_hash").isNull(), F.lit("removed"))
        .when(F.col("old_hash") != F.col("new_hash"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return (
        joined.select("doc_id", status.alias("status"))
        .filter(F.col("status") != "unchanged")
    )


def _diff_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    old = docs.filter(
        F.pmod("doc_id", F.lit(_OLD_DROP_MOD)) != _OLD_DROP_REM
    ).select("doc_id", "text")
    new = docs.filter(
        F.pmod("doc_id", F.lit(_NEW_DROP_MOD)) != _NEW_DROP_REM
    ).select(
        "doc_id",
        F.when(
            F.pmod("doc_id", F.lit(_EDIT_MOD)) == _EDIT_REM,
            F.concat(F.col("text"), F.lit(" edited")),
        ).otherwise(F.col("text")).alias("text"),
    )
    return snapshot_diff(old, new)


_DIFF_SQL = f"""
WITH old AS (
  SELECT doc_id, md5(text) AS old_hash FROM documents
  WHERE doc_id % {_OLD_DROP_MOD} != {_OLD_DROP_REM}
), new AS (
  SELECT doc_id,
         md5(CASE WHEN doc_id % {_EDIT_MOD} = {_EDIT_REM}
                  THEN text || ' edited' ELSE text END) AS new_hash
  FROM documents
  WHERE doc_id % {_NEW_DROP_MOD} != {_NEW_DROP_REM}
)
SELECT doc_id, status FROM (
  SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id,
         CASE WHEN o.old_hash IS NULL THEN 'added'
              WHEN n.new_hash IS NULL THEN 'removed'
              WHEN o.old_hash != n.new_hash THEN 'changed'
              ELSE 'unchanged' END AS status
  FROM old o FULL OUTER JOIN new n ON o.doc_id = n.doc_id
) t WHERE status != 'unchanged'
"""

# ---------------------------------------------------------------------------
# Train/val/test split assignment.
# ---------------------------------------------------------------------------

#: md5-threshold boundaries out of 10,000: 90% train, 5% val, 5% test.
SPLIT_TRAIN, SPLIT_VAL = 9000, 9500
_SPLIT_MOD = 10_000


def assign_splits(docs: DataFrame) -> DataFrame:
    """Per (lang, source, split): doc and token counts under the
    deterministic md5-threshold split."""
    h = md5_mod("doc_id", _SPLIT_MOD)
    split = (
        F.when(h < SPLIT_TRAIN, F.lit("train"))
        .when(h < SPLIT_VAL, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return (
        docs.select(
            "lang", "source", split.alias("split"),
            F.size(F.split("text", " ")).alias("n_tokens"),
        )
        .groupBy("lang", "source", "split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("n_tokens"),
        )
    )


def _splits_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return assign_splits(load(spark, sf_dir, "documents"))


_SPLITS_SQL = f"""
WITH hashed AS (
  SELECT lang, source,
         CAST(concat('0x', substring(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
           % {_SPLIT_MOD} AS h,
         CAST(len(string_split(text, ' ')) AS INT) AS n_tokens
  FROM documents
), assigned AS (
  SELECT lang, source,
         CASE WHEN h < {SPLIT_TRAIN} THEN 'train'
              WHEN h < {SPLIT_VAL} THEN 'val'
              ELSE 'test' END AS split,
         n_tokens
  FROM hashed
)
SELECT lang, source, split,
       COUNT(*) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS n_tokens
FROM assigned
GROUP BY 1, 2, 3
"""


# ---------------------------------------------------------------------------
# Split-leakage audit — the eval-integrity complement of decontamination:
# after assigning train/val/test, find CONTENT that appears in more than
# one split (exact duplicates straddling a split boundary leak training
# text into evaluation). Reported per split pair so the
# train↔val / train↔test edges (the ones that invalidate evals) are
# separately visible from val↔test.
#
# Scale shape: one md5 projection per doc → ONE content-hash hash-agg
# with conditional per-split counters → a 1-row fold exploded into the
# three pair rows. Text never moves through the shuffle (only 32-char
# hashes); work ∝ corpus, output O(1). At 100 TB this rides the same
# content-hash aggregation the exact-dedup pass already computes.
# ---------------------------------------------------------------------------


def split_leakage(docs: DataFrame) -> DataFrame:
    """Per ordered split pair: distinct leaked contents and the doc
    counts on each side of the leak (docs whose text also occurs in
    the other split)."""
    h = md5_mod("doc_id", _SPLIT_MOD)
    split = (
        F.when(h < SPLIT_TRAIN, F.lit("train"))
        .when(h < SPLIT_VAL, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    per_content = (
        docs.select(F.md5("text").alias("content"), split.alias("split"))
        .groupBy("content")
        .agg(
            F.sum((F.col("split") == "train").cast("long")).alias("c_train"),
            F.sum((F.col("split") == "val").cast("long")).alias("c_val"),
            F.sum((F.col("split") == "test").cast("long")).alias("c_test"),
        )
    )
    pair_aggs = []
    for a, b in (("train", "val"), ("train", "test"), ("val", "test")):
        both = (F.col(f"c_{a}") > 0) & (F.col(f"c_{b}") > 0)
        pair_aggs.append(F.struct(
            F.lit(f"{a}|{b}").alias("split_pair"),
            F.sum(both.cast("long")).cast("long").alias("n_leaked_contents"),
            F.sum(F.when(both, F.col(f"c_{a}")).otherwise(F.lit(0)))
            .cast("long").alias("n_docs_left"),
            F.sum(F.when(both, F.col(f"c_{b}")).otherwise(F.lit(0)))
            .cast("long").alias("n_docs_right"),
        ))
    # One global aggregate → explode into the three pair rows (the
    # union-of-selects form would re-derive the agg per branch).
    return (
        per_content.agg(F.array(*pair_aggs).alias("pairs"))
        .select(F.explode("pairs").alias("p"))
        .select("p.*")
    )


def _leakage_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return split_leakage(load(spark, sf_dir, "documents"))


_LEAKAGE_SQL = f"""
WITH assigned AS (
  SELECT md5(text) AS content,
         CASE WHEN CAST(concat('0x', substring(md5(CAST(doc_id AS VARCHAR)),
                                               1, 8)) AS BIGINT)
                   % {_SPLIT_MOD} < {SPLIT_TRAIN} THEN 'train'
              WHEN CAST(concat('0x', substring(md5(CAST(doc_id AS VARCHAR)),
                                               1, 8)) AS BIGINT)
                   % {_SPLIT_MOD} < {SPLIT_VAL} THEN 'val'
              ELSE 'test' END AS split
  FROM documents
), per_content AS (
  SELECT content,
         SUM(CASE WHEN split = 'train' THEN 1 ELSE 0 END) AS c_train,
         SUM(CASE WHEN split = 'val' THEN 1 ELSE 0 END) AS c_val,
         SUM(CASE WHEN split = 'test' THEN 1 ELSE 0 END) AS c_test
  FROM assigned GROUP BY 1
)
SELECT 'train|val' AS split_pair,
       CAST(SUM(CASE WHEN c_train > 0 AND c_val > 0 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_leaked_contents,
       CAST(SUM(CASE WHEN c_train > 0 AND c_val > 0 THEN c_train ELSE 0 END)
            AS BIGINT) AS n_docs_left,
       CAST(SUM(CASE WHEN c_train > 0 AND c_val > 0 THEN c_val ELSE 0 END)
            AS BIGINT) AS n_docs_right
FROM per_content
UNION ALL
SELECT 'train|test',
       CAST(SUM(CASE WHEN c_train > 0 AND c_test > 0 THEN 1 ELSE 0 END)
            AS BIGINT),
       CAST(SUM(CASE WHEN c_train > 0 AND c_test > 0 THEN c_train ELSE 0 END)
            AS BIGINT),
       CAST(SUM(CASE WHEN c_train > 0 AND c_test > 0 THEN c_test ELSE 0 END)
            AS BIGINT)
FROM per_content
UNION ALL
SELECT 'val|test',
       CAST(SUM(CASE WHEN c_val > 0 AND c_test > 0 THEN 1 ELSE 0 END)
            AS BIGINT),
       CAST(SUM(CASE WHEN c_val > 0 AND c_test > 0 THEN c_val ELSE 0 END)
            AS BIGINT),
       CAST(SUM(CASE WHEN c_val > 0 AND c_test > 0 THEN c_test ELSE 0 END)
            AS BIGINT)
FROM per_content
"""


def snapshot_schema_drift(old: DataFrame, new: DataFrame) -> dict[str, list]:
    """Schema-level diff between two corpus versions — the lake-scale
    analogue of the bank pipeline's R24 file check (schema.py): columns
    added / removed / type-changed between rebuilds. Metadata only
    (``df.schema``) — no data is read, so it costs nothing at any scale
    and belongs at the front of every rebuild validation, before a
    single row moves.

    Returns {"added": [name], "removed": [name],
    "type_changed": [(name, old_type, new_type)]}.
    """
    o = {f.name: f.dataType.simpleString() for f in old.schema.fields}
    n = {f.name: f.dataType.simpleString() for f in new.schema.fields}
    return {
        "added": sorted(set(n) - set(o)),
        "removed": sorted(set(o) - set(n)),
        "type_changed": sorted(
            (c, o[c], n[c]) for c in set(o) & set(n) if o[c] != n[c]
        ),
    }


# ---------------------------------------------------------------------------
# Quality-drift report between two corpus versions — the monitoring
# read-out a pipeline owner checks after every rebuild: per language,
# did the doc count, document length, or quality-gate pass rate move?
# Shape at 100 TB: both versions stream through the same map-only
# per-row projection (version tag + token count + quality flag), then
# ONE hash-aggregation on the tiny lang key with conditional sums — no
# join between versions, no second corpus pass. All outputs are exact
# integers (milli ratios of exact sums), so drift is bit-comparable
# across engines and across reruns.
# ---------------------------------------------------------------------------


def quality_drift(old: DataFrame, new: DataFrame) -> DataFrame:
    """Per lang: doc counts, tokens/doc, and quality-gate pass rates of
    both versions plus the quality drift (new - old) in exact milli."""
    from etl_validator_github_spark.scale.text import quality_flag

    def tagged(df: DataFrame, version: str) -> DataFrame:
        return df.select(
            "lang",
            F.lit(version).alias("version"),
            F.size(F.split("text", " ")).alias("n_tokens"),
            quality_flag().cast("long").alias("is_quality"),
        )

    both = tagged(old, "old").unionAll(tagged(new, "new"))
    n_old = F.sum((F.col("version") == "old").cast("long"))
    n_new = F.sum((F.col("version") == "new").cast("long"))
    s = lambda col, v: F.sum(  # noqa: E731
        F.when(F.col("version") == v, F.col(col)).otherwise(F.lit(0))
    )
    return (
        both.groupBy("lang")
        .agg(
            n_old.alias("n_docs_old"),
            n_new.alias("n_docs_new"),
            s("n_tokens", "old").alias("tok_old"),
            s("n_tokens", "new").alias("tok_new"),
            s("is_quality", "old").alias("q_old"),
            s("is_quality", "new").alias("q_new"),
        )
        .select(
            "lang", "n_docs_old", "n_docs_new",
            F.expr("(1000 * tok_old) div n_docs_old")
            .alias("tokens_per_doc_milli_old"),
            F.expr("(1000 * tok_new) div n_docs_new")
            .alias("tokens_per_doc_milli_new"),
            F.expr("(1000 * q_old) div n_docs_old")
            .alias("quality_milli_old"),
            F.expr("(1000 * q_new) div n_docs_new")
            .alias("quality_milli_new"),
            F.expr("(1000 * q_new) div n_docs_new "
                   "- (1000 * q_old) div n_docs_old")
            .alias("quality_drift_milli"),
        )
    )


def _drift_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Same deterministic old/new derivation the snapshot diff uses, so
    # the two monitoring queries describe the same rebuild.
    docs = load(spark, sf_dir, "documents")
    old = docs.filter(
        F.pmod("doc_id", F.lit(_OLD_DROP_MOD)) != _OLD_DROP_REM
    ).select("lang", "text")
    new = docs.filter(
        F.pmod("doc_id", F.lit(_NEW_DROP_MOD)) != _NEW_DROP_REM
    ).select(
        "lang",
        F.when(
            F.pmod("doc_id", F.lit(_EDIT_MOD)) == _EDIT_REM,
            F.concat(F.col("text"), F.lit(" edited")),
        ).otherwise(F.col("text")).alias("text"),
    )
    return quality_drift(old, new)


_DRIFT_QUALITY_SQL = f"""
WITH old_docs AS (
  SELECT lang, text FROM documents
  WHERE doc_id % {_OLD_DROP_MOD} != {_OLD_DROP_REM}
), new_docs AS (
  SELECT lang,
         CASE WHEN doc_id % {_EDIT_MOD} = {_EDIT_REM}
              THEN text || ' edited' ELSE text END AS text
  FROM documents
  WHERE doc_id % {_NEW_DROP_MOD} != {_NEW_DROP_REM}
), tagged AS (
  SELECT lang, 'old' AS version, text FROM old_docs
  UNION ALL
  SELECT lang, 'new' AS version, text FROM new_docs
), scored AS (
  SELECT lang, version,
         CAST(len(toks) AS BIGINT) AS n_tokens,
         CAST(len(toks) >= 20 AND len(toks) <= 1000
              AND (len(list_filter(toks, t -> t IN
                     ('the', 'a', 'of', 'and', 'in', 'to')))
                   / CAST(len(toks) AS INT)) < 0.5 AS BIGINT) AS is_quality
  FROM (SELECT lang, version, string_split(text, ' ') AS toks FROM tagged)
), agg AS (
  SELECT lang,
         SUM(CASE WHEN version = 'old' THEN 1 ELSE 0 END) AS n_docs_old,
         SUM(CASE WHEN version = 'new' THEN 1 ELSE 0 END) AS n_docs_new,
         SUM(CASE WHEN version = 'old' THEN n_tokens ELSE 0 END) AS tok_old,
         SUM(CASE WHEN version = 'new' THEN n_tokens ELSE 0 END) AS tok_new,
         SUM(CASE WHEN version = 'old' THEN is_quality ELSE 0 END) AS q_old,
         SUM(CASE WHEN version = 'new' THEN is_quality ELSE 0 END) AS q_new
  FROM scored GROUP BY 1
)
SELECT lang,
       CAST(n_docs_old AS BIGINT) AS n_docs_old,
       CAST(n_docs_new AS BIGINT) AS n_docs_new,
       (1000 * CAST(tok_old AS BIGINT)) // CAST(n_docs_old AS BIGINT)
         AS tokens_per_doc_milli_old,
       (1000 * CAST(tok_new AS BIGINT)) // CAST(n_docs_new AS BIGINT)
         AS tokens_per_doc_milli_new,
       (1000 * CAST(q_old AS BIGINT)) // CAST(n_docs_old AS BIGINT)
         AS quality_milli_old,
       (1000 * CAST(q_new AS BIGINT)) // CAST(n_docs_new AS BIGINT)
         AS quality_milli_new,
       (1000 * CAST(q_new AS BIGINT)) // CAST(n_docs_new AS BIGINT)
         - (1000 * CAST(q_old AS BIGINT)) // CAST(n_docs_old AS BIGINT)
         AS quality_drift_milli
FROM agg
"""


# ---------------------------------------------------------------------------
# Deterministic epoch shuffle — reproducible training-data order. Every
# epoch permutes the corpus by an md5 key seeded with the epoch number
# (the portable hash all sampling/splitting ops share), and the global
# position comes from functions/ranks.py's range-partitioned rank — the
# classic "seeded shuffle + shard" a dataloader needs, with NO
# single-task sort anywhere (a naive row_number() OVER (ORDER BY key)
# funnels the full corpus through one reducer — exactly the plan the
# ranks helper exists to kill). Shard = position div SHARD_SIZE, so a
# 1000-executor run can hand each worker a contiguous shard of the
# permuted order and a rerun (same epoch) reproduces it bit-for-bit.
# ---------------------------------------------------------------------------

SHUFFLE_EPOCHS = (1, 2)
SHARD_SIZE = 128


def epoch_shuffle(docs: DataFrame,
                  epochs: tuple[int, ...] = SHUFFLE_EPOCHS,
                  shard_size: int = SHARD_SIZE) -> DataFrame:
    """(epoch, doc_id, position, shard) — the seeded global permutation
    per epoch. Ties on the 32-bit md5 prefix break on doc_id (the total
    order the ranks contract requires)."""
    from etl_validator_github_spark.functions.ranks import global_row_number

    out = None
    for ep in epochs:
        key = md5_mod(f"concat('{ep}:', doc_id)")
        ranked = global_row_number(
            docs.select("doc_id", key.alias("skey")),
            order_cols=["skey", "doc_id"],
            rank_col="position",
        )
        one = ranked.select(
            F.lit(ep).cast("int").alias("epoch"),
            "doc_id",
            F.col("position").cast("long").alias("position"),
            F.expr(f"cast((position - 1) div {shard_size} as int)")
            .alias("shard"),
        )
        out = one if out is None else out.unionByName(one)
    return out


def _shuffle_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return epoch_shuffle(load(spark, sf_dir, "documents"))


def _shuffle_epoch_sql(ep: int) -> str:
    return f"""
  SELECT {ep} AS epoch, doc_id,
         CAST(row_number() OVER (
           ORDER BY CAST(concat('0x', substring(
             md5('{ep}:' || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT),
           doc_id) AS BIGINT) AS position
  FROM documents"""


_SHUFFLE_SQL = f"""
WITH ranked AS (
{_shuffle_epoch_sql(SHUFFLE_EPOCHS[0])}
  UNION ALL
{_shuffle_epoch_sql(SHUFFLE_EPOCHS[1])}
)
SELECT CAST(epoch AS INT) AS epoch, doc_id, position,
       CAST((position - 1) // {SHARD_SIZE} AS INT) AS shard
FROM ranked
"""


# ---------------------------------------------------------------------------
# Shard-balance report over the epoch shuffle — the dataloader-ops
# readout: a skewed shard stalls every data-parallel rank waiting at
# the batch barrier, so the report splits FULL shards (whose doc count
# is fixed by construction — only their token load varies) from the
# ragged tail shard, and bounds the full-shard char-load spread. Cost:
# the shuffle's rank pass + one (epoch, shard) hash-agg + an
# epoch-grain rollup.
# ---------------------------------------------------------------------------


def shard_balance_report(docs: DataFrame,
                         epochs: tuple[int, ...] = SHUFFLE_EPOCHS,
                         shard_size: int = SHARD_SIZE) -> DataFrame:
    """(epoch, n_shards, n_full_shards, tail_docs, min_chars_full,
    max_chars_full, spread_milli) — per-epoch shard load balance;
    spread = 1000·max/min over FULL shards."""
    sh = epoch_shuffle(docs, epochs, shard_size).join(
        docs.select("doc_id", "n_chars"), "doc_id"
    )
    per_shard = sh.groupBy("epoch", "shard").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_chars").cast("long").alias("chars"),
    )
    return (
        per_shard.groupBy("epoch")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_shards"),
            F.sum((F.col("n_docs") == shard_size).cast("long"))
            .cast("long").alias("n_full_shards"),
            F.coalesce(
                F.sum(F.when(F.col("n_docs") < shard_size,
                             F.col("n_docs"))), F.lit(0)
            ).cast("long").alias("tail_docs"),
            F.min(F.when(F.col("n_docs") == shard_size, F.col("chars")))
            .cast("long").alias("min_chars_full"),
            F.max(F.when(F.col("n_docs") == shard_size, F.col("chars")))
            .cast("long").alias("max_chars_full"),
        )
        .withColumn(
            "spread_milli",
            F.expr("CASE WHEN min_chars_full > 0 THEN "
                   "cast((1000 * max_chars_full) div min_chars_full "
                   "as bigint) END"),
        )
        .select(
            F.col("epoch").cast("int").alias("epoch"),
            "n_shards", "n_full_shards", "tail_docs",
            "min_chars_full", "max_chars_full", "spread_milli",
        )
    )


def _shard_balance_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return shard_balance_report(load(spark, sf_dir, "documents"))


_SHARD_BALANCE_SQL = f"""
WITH shuffled AS ({_SHUFFLE_SQL}),
per_shard AS (
  SELECT s.epoch, s.shard,
         CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(d.n_chars) AS BIGINT) AS chars
  FROM shuffled s JOIN documents d ON s.doc_id = d.doc_id
  GROUP BY 1, 2
), agg AS (
  SELECT epoch,
         CAST(COUNT(*) AS BIGINT) AS n_shards,
         CAST(SUM(CASE WHEN n_docs = {SHARD_SIZE} THEN 1 ELSE 0 END)
              AS BIGINT) AS n_full_shards,
         CAST(COALESCE(SUM(CASE WHEN n_docs < {SHARD_SIZE}
                                THEN n_docs END), 0) AS BIGINT)
           AS tail_docs,
         CAST(MIN(CASE WHEN n_docs = {SHARD_SIZE} THEN chars END)
              AS BIGINT) AS min_chars_full,
         CAST(MAX(CASE WHEN n_docs = {SHARD_SIZE} THEN chars END)
              AS BIGINT) AS max_chars_full
  FROM per_shard GROUP BY 1
)
SELECT CAST(epoch AS INT) AS epoch, n_shards, n_full_shards, tail_docs,
       min_chars_full, max_chars_full,
       CASE WHEN min_chars_full > 0 THEN
         CAST((1000 * max_chars_full) // min_chars_full AS BIGINT)
       END AS spread_milli
FROM agg
"""


SNAPSHOT_QUERIES: dict[str, Query] = {
    q.name: q
    for q in [
        Query("corpus_snapshot_diff", _diff_q, _DIFF_SQL,
              "Corpus version diff: hash-only full-outer join classifies "
              "every doc as added/removed/changed."),
        Query("corpus_quality_drift", _drift_q, _DRIFT_QUALITY_SQL,
              "Per-lang quality-drift report between two corpus "
              "versions: doc counts, tokens/doc and quality-gate rates "
              "as exact milli integers, single conditional hash-agg."),
        Query("docs_split_assign", _splits_q, _SPLITS_SQL,
              "Deterministic md5-threshold train/val/test split with "
              "per-(lang, source, split) doc/token rollup."),
        Query("docs_split_leakage", _leakage_q, _LEAKAGE_SQL,
              "Eval-integrity audit: exact-duplicate content straddling "
              "a split boundary, reported per split pair from one "
              "content-hash aggregation."),
        Query("docs_epoch_shuffle", _shuffle_q, _SHUFFLE_SQL,
              "Deterministic seeded epoch shuffle: per-epoch md5 "
              "permutation with range-partitioned exact positions and "
              "contiguous shards — reproducible dataloader order, no "
              "single-task sort."),
        Query("docs_shard_balance", _shard_balance_q, _SHARD_BALANCE_SQL,
              "Dataloader shard-balance report over the epoch shuffle: "
              "full-shard char-load spread + ragged-tail size per "
              "epoch — a skewed shard stalls every data-parallel rank; "
              "one (epoch, shard) hash-agg + epoch rollup."),
    ]
}
