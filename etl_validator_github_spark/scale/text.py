"""Text analysis over the documents table: token counting, quality
scoring, language-ID heuristic, document fingerprinting.

Everything is built from JVM-side expressions (split / transform /
filter / md5) — no Python UDFs — so the whole stage stays inside
whole-stage codegen and scales as a map-only pass at 100 TB.

Determinism: counts are exact ints; ratios are single double divisions
of exact ints (IEEE-deterministic); fingerprints are md5 over
canonically sorted token lists, identical in any engine.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

import pandas as pd

from etl_validator_github_spark.contract import Query, load, md5_mod

#: Stopword markers per language. The testdata corpus shares one
#: vocabulary across langs, so this demonstrates the scoring mechanism
#: (deterministically) rather than real discrimination power.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and"),
    "de": ("der", "die", "und", "das"),
    "es": ("el", "la", "los", "las"),
    "fr": ("le", "la", "les", "des"),
}

_STOPWORDS = ("the", "a", "of", "and", "in", "to")


def tokens(col: str = "text") -> Column:
    return F.split(F.col(col), " ")


def _count_in(toks: Column, words: tuple[str, ...]) -> Column:
    return F.size(F.filter(toks, lambda t: t.isin(*words)))


def _sql_count_in(words: tuple[str, ...]) -> str:
    in_list = ", ".join(f"'{w}'" for w in words)
    return f"len(list_filter(toks, t -> t IN ({in_list})))"


# ---------------------------------------------------------------------------
# Token/quality statistics.
# ---------------------------------------------------------------------------


def quality_flag(col: str = "text") -> Column:
    """The per-row quality gate (length band + stopword ratio) as a pure
    boolean expression — shared by `text_stats`, `corpus_clean`, and the
    streaming ingest (identical semantics batch vs stream)."""
    t = tokens(col)
    n_tokens = F.size(t)
    stop_ratio = _count_in(t, _STOPWORDS) / n_tokens
    return (n_tokens >= 20) & (n_tokens <= 1000) & (stop_ratio < 0.5)


def text_stats(docs: DataFrame) -> DataFrame:
    t = tokens()
    n_chars = F.length("text")
    n_tokens = F.size(t)
    n_distinct = F.size(F.array_distinct(t))
    # BPE-ish subword proxy: count of <=3-char greedy word pieces.
    n_pieces = F.size(F.regexp_extract_all(F.col("text"), F.lit("[a-z]{1,3}"), 0))
    stop_ratio = _count_in(t, _STOPWORDS) / n_tokens
    return docs.select(
        "doc_id",
        "lang",
        n_chars.alias("n_chars"),
        n_tokens.alias("n_tokens"),
        n_distinct.alias("n_distinct_tokens"),
        n_pieces.alias("n_word_pieces"),
        ((n_chars - (n_tokens - F.lit(1))) / n_tokens).alias("avg_token_len"),
        stop_ratio.alias("stopword_ratio"),
        (n_distinct / n_tokens).alias("type_token_ratio"),
        quality_flag().cast("int").alias("is_quality"),
    )


def _text_stats_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text_stats(load(spark, sf_dir, "documents"))


_STATS_SQL = f"""
WITH tok AS (
  SELECT doc_id, lang, text, string_split(text, ' ') AS toks FROM documents
)
SELECT doc_id, lang,
       CAST(length(text) AS INT) AS n_chars,
       CAST(len(toks) AS INT) AS n_tokens,
       CAST(len(list_distinct(toks)) AS INT) AS n_distinct_tokens,
       CAST(len(regexp_extract_all(text, '[a-z]{{1,3}}')) AS INT) AS n_word_pieces,
       (CAST(length(text) AS INT) - (CAST(len(toks) AS INT) - 1)) / CAST(len(toks) AS INT) AS avg_token_len,
       {_sql_count_in(_STOPWORDS)} / CAST(len(toks) AS INT) AS stopword_ratio,
       CAST(len(list_distinct(toks)) AS INT) / CAST(len(toks) AS INT) AS type_token_ratio,
       CAST(len(toks) >= 20 AND len(toks) <= 1000
            AND ({_sql_count_in(_STOPWORDS)} / CAST(len(toks) AS INT)) < 0.5 AS INT) AS is_quality
FROM tok
"""

# ---------------------------------------------------------------------------
# Language-ID heuristic: stopword-marker scores + deterministic argmax.
# ---------------------------------------------------------------------------


def lang_scores(docs: DataFrame) -> DataFrame:
    t = tokens()
    raw = {lg: _count_in(t, ws) for lg, ws in LANG_MARKERS.items()}
    out = docs.select(
        "doc_id", "lang",
        *[raw[lg].alias(f"score_{lg}") for lg in ("en", "de", "es", "fr")],
    )
    s = {lg: F.col(f"score_{lg}") for lg in LANG_MARKERS}
    pred = (
        F.when((s["en"] >= s["de"]) & (s["en"] >= s["es"])
               & (s["en"] >= s["fr"]), "en")
        .when((s["de"] >= s["es"]) & (s["de"] >= s["fr"]), "de")
        .when(s["es"] >= s["fr"], "es")
        .otherwise("fr")
    )
    return out.withColumn("predicted_lang", pred).withColumn(
        "matches_label", (F.col("predicted_lang") == F.col("lang")).cast("int")
    )


def _lang_id_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return lang_scores(load(spark, sf_dir, "documents"))


def lang_confusion(docs: DataFrame) -> DataFrame:
    """Classifier-eval readout for the lang-id heuristic: the
    (label, prediction) confusion matrix with per-cell recall share in
    milli — the standard way to see WHERE a quality/routing classifier
    fails, not just how often (`matches_label` only gives accuracy).

    Scale shape: the per-doc scorer is the map-only pass above; the
    matrix is one hash-agg on the 4×4 key space plus a broadcast of
    the per-label totals.
    """
    scored = lang_scores(docs).select("lang", "predicted_lang")
    cells = scored.groupBy("lang", "predicted_lang").agg(
        F.count(F.lit(1)).alias("n")
    )
    totals = cells.groupBy("lang").agg(F.sum("n").alias("label_total"))
    return (
        cells.join(F.broadcast(totals), "lang")
        .select(
            "lang", "predicted_lang",
            F.col("n").cast("long").alias("n"),
            F.expr("cast((1000 * n) div label_total as int)")
            .alias("share_milli"),
        )
    )


def _lang_confusion_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return lang_confusion(load(spark, sf_dir, "documents"))


def _lang_confusion_sql() -> str:
    s = {lg: _sql_count_in(ws) for lg, ws in LANG_MARKERS.items()}
    return f"""
WITH tok AS (
  SELECT doc_id, lang, string_split(text, ' ') AS toks FROM documents
), scored AS (
  SELECT doc_id, lang,
         CAST({s['en']} AS INT) AS score_en,
         CAST({s['de']} AS INT) AS score_de,
         CAST({s['es']} AS INT) AS score_es,
         CAST({s['fr']} AS INT) AS score_fr
  FROM tok
), pred AS (
  SELECT lang,
         CASE WHEN score_en >= score_de AND score_en >= score_es
                   AND score_en >= score_fr THEN 'en'
              WHEN score_de >= score_es AND score_de >= score_fr
                   THEN 'de'
              WHEN score_es >= score_fr THEN 'es'
              ELSE 'fr' END AS predicted_lang
  FROM scored
), cells AS (
  SELECT lang, predicted_lang, CAST(COUNT(*) AS BIGINT) AS n
  FROM pred GROUP BY 1, 2
), totals AS (
  SELECT lang, SUM(n) AS label_total FROM cells GROUP BY 1
)
SELECT c.lang, c.predicted_lang, c.n,
       CAST((1000 * c.n) // t.label_total AS INT) AS share_milli
FROM cells c JOIN totals t USING (lang)
"""


def _lang_sql() -> str:
    s = {lg: _sql_count_in(ws) for lg, ws in LANG_MARKERS.items()}
    return f"""
WITH tok AS (
  SELECT doc_id, lang, string_split(text, ' ') AS toks FROM documents
), scored AS (
  SELECT doc_id, lang,
         CAST({s['en']} AS INT) AS score_en,
         CAST({s['de']} AS INT) AS score_de,
         CAST({s['es']} AS INT) AS score_es,
         CAST({s['fr']} AS INT) AS score_fr
  FROM tok
)
SELECT doc_id, lang, score_en, score_de, score_es, score_fr,
       CASE WHEN score_en >= score_de AND score_en >= score_es AND score_en >= score_fr THEN 'en'
            WHEN score_de >= score_es AND score_de >= score_fr THEN 'de'
            WHEN score_es >= score_fr THEN 'es'
            ELSE 'fr' END AS predicted_lang,
       CAST((CASE WHEN score_en >= score_de AND score_en >= score_es AND score_en >= score_fr THEN 'en'
            WHEN score_de >= score_es AND score_de >= score_fr THEN 'de'
            WHEN score_es >= score_fr THEN 'es'
            ELSE 'fr' END) = lang AS INT) AS matches_label
FROM scored
"""


# ---------------------------------------------------------------------------
# Document fingerprinting: canonical md5 + two MinHash signature slots
# (the building block scale/dedup.py expands to a full LSH).
# ---------------------------------------------------------------------------


def minhash_sig(toks: Column, seed: int) -> Column:
    """Min over md5('{seed}|' + token) hex strings.

    md5 hex strings have fixed width, so the lexicographic min equals the
    numeric min — and both Spark and any SQL engine with md5 agree on it.
    """
    return F.array_min(
        F.transform(toks, lambda t: F.md5(F.concat(F.lit(f"{seed}|"), t)))
    )


def fingerprints(docs: DataFrame) -> DataFrame:
    t = F.array_distinct(tokens())
    return docs.select(
        "doc_id",
        F.md5(F.concat_ws(" ", F.array_sort(t))).alias("content_fp"),
        minhash_sig(t, 0).alias("minhash_0"),
        minhash_sig(t, 1).alias("minhash_1"),
    )


def _fingerprint_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return fingerprints(load(spark, sf_dir, "documents"))


_FP_SQL = """
WITH tok AS (
  SELECT doc_id, list_distinct(string_split(text, ' ')) AS toks FROM documents
)
SELECT doc_id,
       md5(array_to_string(list_sort(toks), ' ')) AS content_fp,
       list_aggregate(list_transform(toks, t -> md5('0|' || t)), 'min') AS minhash_0,
       list_aggregate(list_transform(toks, t -> md5('1|' || t)), 'min') AS minhash_1
FROM tok
"""


# ---------------------------------------------------------------------------
# Corpus heavy hitters: top terms per language — explode → count → tie-
# broken top-k per group. The shuffle key is (lang, token); map-side
# partial aggregation keeps the explosion from amplifying the shuffle.
# ---------------------------------------------------------------------------

TOP_TERMS_K = 10


def top_terms_per_lang(docs: DataFrame, k: int = TOP_TERMS_K) -> DataFrame:
    from pyspark.sql import Window

    counts = (
        docs.select("lang", F.explode(tokens()).alias("token"))
        .groupBy("lang", "token")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.partitionBy("lang").orderBy(F.desc("n"), F.asc("token"))
    return (
        counts.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("lang", "token", "n", "rnk")
    )


def _top_terms_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return top_terms_per_lang(load(spark, sf_dir, "documents"))


_TOP_TERMS_SQL = f"""
WITH counts AS (
  SELECT lang, unnest(string_split(text, ' ')) AS token
  FROM documents
), agg AS (
  SELECT lang, token, COUNT(*) AS n FROM counts GROUP BY 1, 2
)
SELECT lang, token, n,
       CAST(row_number() OVER (PARTITION BY lang ORDER BY n DESC, token ASC) AS INT) AS rnk
FROM agg
QUALIFY rnk <= {TOP_TERMS_K}
"""


# ---------------------------------------------------------------------------
# Cross-modal composition: quality-gated docs joined to their embedding
# rows — the canonical curation-pipeline shape (text filter feeding a
# vector stage). The quality filter runs BEFORE the join so the join
# input is already pruned; per-lang rollup aggregates exact quantized
# embedding norms.
# ---------------------------------------------------------------------------


def quality_doc_embeddings(docs: DataFrame, embeddings: DataFrame) -> DataFrame:
    from etl_validator_github_spark.scale.similarity import quantized

    quality = text_stats(docs).filter(F.col("is_quality") == 1).select(
        "doc_id", "lang", "n_tokens"
    )
    vecs = quantized(embeddings)
    return (
        quality.join(vecs, quality.doc_id == vecs.vec_id)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_quality_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.sum("norm2").alias("sum_norm2"),
            (F.sum("norm2") / F.count(F.lit(1))).alias("avg_norm2"),
        )
        .orderBy("lang")
    )


def _quality_embed_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return quality_doc_embeddings(
        load(spark, sf_dir, "documents"), load(spark, sf_dir, "embeddings")
    )


_QUALITY_EMBED_SQL = f"""
WITH tok AS (
  SELECT doc_id, lang, string_split(text, ' ') AS toks FROM documents
), quality AS (
  SELECT doc_id, lang, CAST(len(toks) AS INT) AS n_tokens
  FROM tok
  WHERE len(toks) >= 20 AND len(toks) <= 1000
    AND ({_sql_count_in(_STOPWORDS)} / CAST(len(toks) AS INT)) < 0.5
), vecs AS (
  SELECT vec_id,
         list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000000.0) AS BIGINT)) AS qv
  FROM embeddings
), norms AS (
  SELECT vec_id,
         CAST(list_sum(list_transform(range(1, len(qv) + 1), i -> qv[i] * qv[i])) AS BIGINT) AS norm2
  FROM vecs
)
SELECT lang,
       COUNT(*) AS n_quality_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
       CAST(SUM(norm2) AS BIGINT) AS sum_norm2,
       CAST(SUM(norm2) AS BIGINT) / COUNT(*) AS avg_norm2
FROM quality JOIN norms ON doc_id = vec_id
GROUP BY 1
ORDER BY 1
"""


# ---------------------------------------------------------------------------
# BPE-style pair counting: the inner loop of byte-pair/vocab induction is
# "count adjacent token pairs, take the most frequent". One explode of
# n-1 pairs per doc, then a hash agg on the pair key — map-side partial
# agg keeps the shuffle at vocab-size, not corpus-size.
# ---------------------------------------------------------------------------

BIGRAM_TOP_K = 50


def bigram_counts(docs: DataFrame) -> DataFrame:
    pairs = F.expr(
        "CASE WHEN size(__toks) >= 2 THEN "
        "transform(sequence(1, size(__toks) - 1), "
        "          i -> concat(__toks[i - 1], ' ', __toks[i])) "
        "ELSE array() END"
    )
    return (
        docs.withColumn("__toks", F.split("text", " "))
        .select("lang", F.explode(pairs).alias("pair"))
        .groupBy("lang", "pair")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def top_bigrams(docs: DataFrame, k: int = BIGRAM_TOP_K) -> DataFrame:
    from pyspark.sql import Window

    w = Window.partitionBy("lang").orderBy(F.desc("n"), F.asc("pair"))
    return (
        bigram_counts(docs)
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
    )


def _bigrams_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return top_bigrams(load(spark, sf_dir, "documents"))


_BIGRAMS_SQL = f"""
WITH tok AS (
  SELECT lang, string_split(text, ' ') AS toks FROM documents
), pairs AS (
  SELECT lang,
         unnest(CASE WHEN len(toks) >= 2 THEN
           list_transform(range(1, len(toks)),
                          i -> concat(toks[i], ' ', toks[i + 1]))
         ELSE [] END) AS pair
  FROM tok
), agg AS (
  SELECT lang, pair, COUNT(*) AS n FROM pairs GROUP BY 1, 2
)
SELECT lang, pair, n,
       CAST(row_number() OVER (PARTITION BY lang ORDER BY n DESC, pair ASC) AS INT) AS rnk
FROM agg
QUALIFY rnk <= {BIGRAM_TOP_K}
"""

# ---------------------------------------------------------------------------
# Fixed-size chunking: split every document into CHUNK_TOKENS-token
# chunks (the LLM-training pre-tokenization shape). Pure column math —
# sequence + slice + explode — so chunking stays JVM-side and
# partitioning follows the parent doc (no shuffle at all).
# ---------------------------------------------------------------------------

CHUNK_TOKENS = 50


def chunk_documents(docs: DataFrame, chunk_tokens: int = CHUNK_TOKENS) -> DataFrame:
    n_chunks = F.ceil(F.size("__toks") / F.lit(chunk_tokens)).cast("int")
    chunks = F.expr(
        f"transform(sequence(0, __n_chunks - 1), "
        f"          i -> concat_ws(' ', slice(__toks, i * {chunk_tokens} + 1, "
        f"{chunk_tokens})))"
    )
    return (
        docs.withColumn("__toks", F.split("text", " "))
        .withColumn("__n_chunks", n_chunks)
        .select(
            "doc_id", "lang",
            F.posexplode(chunks).alias("chunk_idx", "chunk_text"),
        )
        .select(
            "doc_id", "lang",
            F.col("chunk_idx").cast("int").alias("chunk_idx"),
            F.size(F.split("chunk_text", " ")).alias("chunk_tokens"),
            F.md5("chunk_text").alias("chunk_hash"),
        )
    )


def _chunks_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return chunk_documents(load(spark, sf_dir, "documents"))


_CHUNKS_SQL = f"""
WITH tok AS (
  SELECT doc_id, lang, string_split(text, ' ') AS toks FROM documents
), chunks AS (
  SELECT doc_id, lang,
         unnest(list_transform(range(0, CAST(ceil(len(toks) / {CHUNK_TOKENS}.0) AS INT)),
                i -> struct_pack(idx := i,
                                 txt := array_to_string(list_slice(toks,
                                         i * {CHUNK_TOKENS} + 1,
                                         i * {CHUNK_TOKENS} + {CHUNK_TOKENS}), ' ')))) AS c
  FROM tok
)
SELECT doc_id, lang,
       CAST(c.idx AS INT) AS chunk_idx,
       CAST(len(string_split(c.txt, ' ')) AS INT) AS chunk_tokens,
       md5(c.txt) AS chunk_hash
FROM chunks
"""


# ---------------------------------------------------------------------------
# Deterministic stratified sampling: keep a doc iff the first 8 hex chars
# of md5(doc_id) fall under a per-language threshold. Unlike rand()-based
# sampling this is reproducible under ANY partitioning/executor count —
# the property that matters when a 100 TB sample must be re-derivable —
# and it needs no shuffle at all (pure per-row predicate; the rollup
# after it is for the oracle check).
# ---------------------------------------------------------------------------

#: Per-language sample rates out of 2^32.
SAMPLE_RATES = {"en": 0.5, "de": 0.25, "es": 0.25, "fr": 0.125}
_H32 = 4294967296  # 2^32


def sample_documents(docs: DataFrame) -> DataFrame:
    h = md5_mod("doc_id")
    expr = None
    for lang, rate in SAMPLE_RATES.items():
        t = int(rate * _H32)
        expr = (F.when(F.col("lang") == lang, F.lit(t)) if expr is None
                else expr.when(F.col("lang") == lang, F.lit(t)))
    thresh = expr.otherwise(F.lit(0))
    return docs.withColumn("__h", h).filter(F.col("__h") < thresh).drop("__h")


def _sample_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    sampled = sample_documents(load(spark, sf_dir, "documents"))
    return (
        sampled.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_sampled"),
            F.min("doc_id").alias("min_doc_id"),
            F.sum("doc_id").alias("doc_id_sum"),
        )
        .orderBy("lang")
    )


def _sample_sql() -> str:
    cases = " ".join(
        f"WHEN '{lang}' THEN {int(rate * _H32)}"
        for lang, rate in SAMPLE_RATES.items()
    )
    return f"""
WITH hashed AS (
  SELECT doc_id, lang,
         CAST(concat('0x', substring(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) AS h,
         CASE lang {cases} ELSE 0 END AS thresh
  FROM documents
)
SELECT lang,
       COUNT(*) AS n_sampled,
       MIN(doc_id) AS min_doc_id,
       CAST(SUM(doc_id) AS BIGINT) AS doc_id_sum
FROM hashed WHERE h < thresh
GROUP BY 1
ORDER BY 1
"""


# ---------------------------------------------------------------------------
# TF-IDF: term frequency × inverse document frequency — the classic
# distinctive-term scorer. Three exact-integer aggregates (tf per
# doc×term, df per term, N) and ONE float expression at the end
# (tf · ln(N/df), IEEE-identical across engines given identical ints).
# The df table is term-cardinality (vocab-sized) — broadcast it; tf is
# the only corpus-sized shuffle.
# ---------------------------------------------------------------------------

TFIDF_TOP_K = 3
TFIDF_DOC_LIMIT = 20


def tf_idf(docs: DataFrame, k: int = TFIDF_TOP_K) -> DataFrame:
    from pyspark.sql import Window

    tok = docs.select("doc_id", F.explode(tokens()).alias("term"))
    tf = tok.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df_ = tok.select("doc_id", "term").distinct().groupBy("term").agg(
        F.count(F.lit(1)).alias("df")
    )
    n_docs = docs.select(F.countDistinct("doc_id").alias("n_docs"))
    scored = (
        tf.join(F.broadcast(df_), "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "tfidf",
            F.col("tf") * F.log(F.col("n_docs").cast("double") / F.col("df")),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("term"))
    # Output rounded to 9 decimals: Spark's log and DuckDB's ln differ
    # by 1 ulp for some inputs (different libm). Ranking stays on the
    # raw score — equal (tf, df) pairs produce identical doubles within
    # each engine and ties break on the term, so order is stable.
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter((F.col("rnk") <= k) & (F.col("doc_id") < TFIDF_DOC_LIMIT))
        .select("doc_id", "term", "tf", "df",
                F.round("tfidf", 9).alias("tfidf"),
                F.col("rnk").cast("int").alias("rnk"))
    )


def _tfidf_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tf_idf(load(spark, sf_dir, "documents"))


_TFIDF_SQL = f"""
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
), tf AS (
  SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY 1, 2
), df AS (
  SELECT term, COUNT(*) AS df
  FROM (SELECT DISTINCT doc_id, term FROM tok) GROUP BY 1
), n AS (
  SELECT COUNT(DISTINCT doc_id) AS n_docs FROM documents
), scored AS (
  SELECT tf.doc_id, tf.term, tf.tf, df.df,
         tf.tf * ln(CAST(n.n_docs AS DOUBLE) / df.df) AS tfidf
  FROM tf JOIN df USING (term) CROSS JOIN n
)
SELECT doc_id, term, tf, df, round(tfidf, 9) AS tfidf,
       CAST(row_number() OVER (PARTITION BY doc_id
                               ORDER BY tfidf DESC, term ASC) AS INT) AS rnk
FROM scored
QUALIFY rnk <= {TFIDF_TOP_K} AND doc_id < {TFIDF_DOC_LIMIT}
"""

# ---------------------------------------------------------------------------
# Arrow-vectorized scalar pandas_udf: the sanctioned escape hatch when a
# metric genuinely needs Python (here a stand-in readability score).
# Batches cross the JVM↔Python boundary as Arrow columns and the body is
# vectorized pandas — 10-100× faster than a row-at-a-time Python UDF,
# and the ONLY acceptable Python-UDF form in a hot path. The math is
# deliberately SQL-expressible so the oracle can pin the UDF's output
# exactly (integer-only arithmetic → no float drift across the boundary).
# ---------------------------------------------------------------------------


def _readability_udf():
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def readability(text: pd.Series) -> pd.Series:
        words = text.str.split(" ")
        n_words = words.str.len()
        n_long = words.map(lambda ws: sum(1 for w in ws if len(w) > 6))
        # Flesch-ish integer score: 10*words + 25*long-words.
        return (n_words * 10 + n_long * 25).astype("int64")

    return readability


def _pandas_udf_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    score = _readability_udf()
    return (
        docs.select("doc_id", "lang", score(F.col("text")).alias("read_score"))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("read_score").alias("score_total"),
            F.max("read_score").alias("score_max"),
        )
        .orderBy("lang")
    )


_PANDAS_UDF_SQL = """
WITH scored AS (
  SELECT doc_id, lang,
         CAST(len(string_split(text, ' ')) * 10
              + len(list_filter(string_split(text, ' '), w -> length(w) > 6)) * 25
              AS BIGINT) AS read_score
  FROM documents
)
SELECT lang,
       COUNT(*) AS n_docs,
       CAST(SUM(read_score) AS BIGINT) AS score_total,
       CAST(MAX(read_score) AS BIGINT) AS score_max
FROM scored
GROUP BY 1
ORDER BY 1
"""


# ---------------------------------------------------------------------------
# Gopher-style repetition/quality filter (Rae et al. 2021 §A1.1): drop
# documents dominated by a single token or by repeated bigrams. The
# top-token count is computed with explode → two-level hash aggregate
# (map-side partial combine; shuffle volume is distinct (doc, token)
# pairs, far below raw token count), NOT a per-row O(n·distinct) lambda
# scan — the shape that still works when documents are megabytes. The
# bigram-repetition ratio is per-row array math (linear in doc length,
# no shuffle at all).
# ---------------------------------------------------------------------------

GOPHER_MIN_TOKENS = 20
GOPHER_MAX_TOKENS = 1000
#: Max fraction of tokens that may be one repeated token (~80th pctile
#: of the testdata corpus, so the flag splits it non-trivially).
GOPHER_TOP_TOKEN_MAX = 0.12
#: Max fraction of bigrams that are repeats of an earlier bigram.
GOPHER_DUP_BIGRAM_MAX = 0.10

_BIGRAMS_EXPR = (
    "transform(sequence(1, size(__toks) - 1), "
    "          i -> concat(element_at(__toks, i), ' ', "
    "                      element_at(__toks, i + 1)))"
)


def gopher_quality(docs: DataFrame) -> DataFrame:
    base = docs.select(
        "doc_id", "lang", F.split("text", " ").alias("__toks")
    )
    top = (
        base.select("doc_id", F.explode("__toks").alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").cast("int").alias("top_token_count"))
    )
    per_row = base.select(
        "doc_id",
        "lang",
        F.size("__toks").alias("n_tokens"),
        F.when(F.size("__toks") >= 2, F.expr(_BIGRAMS_EXPR))
        .otherwise(F.array().cast("array<string>"))
        .alias("__bg"),
    ).select(
        "doc_id", "lang", "n_tokens",
        F.size("__bg").alias("n_bigrams"),
        (F.size("__bg") - F.size(F.array_distinct("__bg")))
        .alias("n_dup_bigrams"),
    )
    out = per_row.join(top, "doc_id")
    top_ratio = F.col("top_token_count") / F.col("n_tokens")
    dup_ratio = F.when(
        F.col("n_bigrams") > 0, F.col("n_dup_bigrams") / F.col("n_bigrams")
    ).otherwise(F.lit(0.0))
    return out.select(
        "doc_id", "lang", "n_tokens", "top_token_count",
        top_ratio.alias("top_token_ratio"),
        "n_bigrams", "n_dup_bigrams",
        dup_ratio.alias("dup_bigram_ratio"),
        (
            (F.col("n_tokens") >= GOPHER_MIN_TOKENS)
            & (F.col("n_tokens") <= GOPHER_MAX_TOKENS)
            & (top_ratio <= GOPHER_TOP_TOKEN_MAX)
            & (dup_ratio <= GOPHER_DUP_BIGRAM_MAX)
        ).cast("int").alias("gopher_keep"),
    )


def _gopher_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return gopher_quality(load(spark, sf_dir, "documents"))


_GOPHER_SQL = f"""
WITH tok AS (
  SELECT doc_id, lang, string_split(text, ' ') AS toks FROM documents
), top AS (
  SELECT doc_id, CAST(MAX(c) AS INT) AS top_token_count
  FROM (
    SELECT doc_id, tok, COUNT(*) AS c
    FROM (SELECT doc_id, unnest(toks) AS tok FROM tok)
    GROUP BY 1, 2
  )
  GROUP BY 1
), per_row AS (
  SELECT doc_id, lang,
         CAST(len(toks) AS INT) AS n_tokens,
         list_transform(range(1, len(toks)),
                        i -> toks[i] || ' ' || toks[i + 1]) AS bg
  FROM tok
), stats AS (
  SELECT doc_id, lang, n_tokens,
         CAST(len(bg) AS INT) AS n_bigrams,
         CAST(len(bg) - len(list_distinct(bg)) AS INT) AS n_dup_bigrams,
         top_token_count
  FROM per_row JOIN top USING (doc_id)
)
SELECT doc_id, lang, n_tokens, top_token_count,
       top_token_count / n_tokens AS top_token_ratio,
       n_bigrams, n_dup_bigrams,
       CASE WHEN n_bigrams > 0 THEN n_dup_bigrams / n_bigrams
            ELSE 0.0 END AS dup_bigram_ratio,
       CAST(n_tokens >= {GOPHER_MIN_TOKENS} AND n_tokens <= {GOPHER_MAX_TOKENS}
            AND top_token_count / n_tokens <= {GOPHER_TOP_TOKEN_MAX}
            AND (CASE WHEN n_bigrams > 0 THEN n_dup_bigrams / n_bigrams
                      ELSE 0.0 END) <= {GOPHER_DUP_BIGRAM_MAX}
            AS INT) AS gopher_keep
FROM stats
"""

# ---------------------------------------------------------------------------
# PII scrubbing: regex redaction of emails / SSNs / IPv4s, the standard
# pre-training privacy pass. The testdata corpus is synthetic word soup
# with no PII, so the query first INJECTS deterministic fake PII into a
# doc_id-keyed subset (identically on both engines) and then scrubs it —
# proving the redaction regexes and counting logic end-to-end. Pure
# per-row regexp_replace/extract_all: map-only, shuffle-free, and the
# regexes avoid non-RE2 constructs (no backrefs/lookaround) so Java
# regex (Spark) and RE2 (DuckDB) agree.
# ---------------------------------------------------------------------------

PII_EMAIL_RE = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
PII_SSN_RE = "\\b[0-9]{3}-[0-9]{2}-[0-9]{4}\\b"
PII_IP_RE = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"


def inject_pii(docs: DataFrame) -> DataFrame:
    """Append deterministic fake PII to doc_id-keyed subsets."""
    did = F.col("doc_id")
    email = F.when(
        did % 3 == 0,
        F.concat(F.lit(" contact user"), did.cast("string"),
                 F.lit("@example.com")),
    ).otherwise(F.lit(""))
    ssn = F.when(
        did % 5 == 0,
        F.concat(F.lit(" ssn 123-45-"),
                 F.lpad((did % 10000).cast("string"), 4, "0")),
    ).otherwise(F.lit(""))
    ip = F.when(
        did % 7 == 0,
        F.concat(F.lit(" from 10."), (did % 256).cast("string"),
                 F.lit(".0."), (did % 100).cast("string")),
    ).otherwise(F.lit(""))
    return docs.withColumn("text", F.concat("text", email, ssn, ip))


def scrub_pii(docs: DataFrame) -> DataFrame:
    t = F.col("text")
    scrubbed = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(t, PII_EMAIL_RE, "<EMAIL>"),
            PII_SSN_RE, "<SSN>"),
        PII_IP_RE, "<IP>")
    return docs.select(
        "doc_id",
        F.size(F.regexp_extract_all(t, F.lit(PII_EMAIL_RE), 0))
        .alias("n_emails"),
        F.size(F.regexp_extract_all(t, F.lit(PII_SSN_RE), 0)).alias("n_ssns"),
        F.size(F.regexp_extract_all(t, F.lit(PII_IP_RE), 0)).alias("n_ips"),
        F.md5(scrubbed).alias("scrubbed_hash"),
    )


def _pii_scrub_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return scrub_pii(inject_pii(load(spark, sf_dir, "documents")))


_PII_SQL = f"""
WITH injected AS (
  SELECT doc_id,
         text
         || CASE WHEN doc_id % 3 = 0
                 THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com'
                 ELSE '' END
         || CASE WHEN doc_id % 5 = 0
                 THEN ' ssn 123-45-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                 ELSE '' END
         || CASE WHEN doc_id % 7 = 0
                 THEN ' from 10.' || CAST(doc_id % 256 AS VARCHAR)
                      || '.0.' || CAST(doc_id % 100 AS VARCHAR)
                 ELSE '' END AS text
  FROM documents
)
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '{PII_EMAIL_RE}')) AS INT) AS n_emails,
       CAST(len(regexp_extract_all(text, '{PII_SSN_RE}')) AS INT) AS n_ssns,
       CAST(len(regexp_extract_all(text, '{PII_IP_RE}')) AS INT) AS n_ips,
       md5(regexp_replace(
             regexp_replace(
               regexp_replace(text, '{PII_EMAIL_RE}', '<EMAIL>', 'g'),
               '{PII_SSN_RE}', '<SSN>', 'g'),
             '{PII_IP_RE}', '<IP>', 'g')) AS scrubbed_hash
FROM injected
"""


TEXT_QUERIES: dict[str, Query] = {
    q.name: q
    for q in [
        Query("text_stats", _text_stats_q, _STATS_SQL,
              "Token counts, quality ratios, BPE-ish piece counts.", bench=True),
        Query("text_quality_embeddings", _quality_embed_q, _QUALITY_EMBED_SQL,
              "Cross-modal pipeline: quality-gated docs joined to embedding "
              "norms, per-lang rollup."),
        Query("text_lang_id", _lang_id_q, _lang_sql(),
              "Marker-based language-ID heuristic with deterministic argmax."),
        Query("text_fingerprint", _fingerprint_q, _FP_SQL,
              "Canonical md5 + MinHash signature fingerprints."),
        Query("text_top_terms", _top_terms_q, _TOP_TERMS_SQL,
              "Heavy-hitter terms per language (tie-broken top-k)."),
        Query("text_bigram_vocab", _bigrams_q, _BIGRAMS_SQL,
              "BPE-style adjacent-pair counts, top-50 per language."),
        Query("text_chunks", _chunks_q, _CHUNKS_SQL,
              "Fixed-50-token document chunking with per-chunk hashes "
              "(shuffle-free)."),
        Query("docs_sample_stratified", _sample_q, _sample_sql(),
              "Deterministic md5-threshold stratified sampling "
              "(partitioning-independent, no rand)."),
        Query("text_tfidf", _tfidf_q, _TFIDF_SQL,
              "TF-IDF distinctive terms, top-3 per doc (exact int "
              "aggregates, one final log)."),
        Query("text_pandas_udf_score", _pandas_udf_q, _PANDAS_UDF_SQL,
              "Arrow-vectorized scalar pandas_udf scoring, oracle-pinned "
              "(integer math crosses the boundary exactly)."),
        Query("text_gopher_quality", _gopher_q, _GOPHER_SQL,
              "Gopher-style repetition filter: top-token + duplicate-bigram "
              "ratios with keep flag."),
        Query("text_pii_scrub", _pii_scrub_q, _PII_SQL,
              "Regex PII redaction (email/SSN/IP) over deterministically "
              "injected fakes; per-doc counts + scrubbed-text hash."),
    ]
}


# ---------------------------------------------------------------------------
# Unigram-LM quality scoring (CCNet-style perplexity filtering, made
# integer-exact). The corpus's own token frequencies are the language
# model: per-doc score = mean floor(log2(corpus_count(token))) over the
# doc's tokens, OOV (outside the top-V vocab) scoring 0 — frequent-token
# prose scores high, gibberish scores low. floor-log2 is computed as
# length(bin(count)) - 1, EXACT integer arithmetic in any engine (a
# float log2 differs by 1 ulp across libm implementations and flips
# floor at powers of two). The dataflow shape is the scale-relevant
# part: corpus stats aggregated once, top-V selected via TakeOrdered
# (no global sort), broadcast back over the token stream.
# ---------------------------------------------------------------------------

#: Vocabulary cap: bounds the broadcast no matter how large the corpus
#: grows. The synthetic corpus has 31 distinct tokens, so 20 keeps the
#: OOV path genuinely exercised (11 tokens score 0); at 100 TB this is
#: the usual 10^5-10^6 heavy-hitter vocab.
LM_VOCAB_SIZE = 20


def unigram_lm_score(docs: DataFrame, vocab_size: int = LM_VOCAB_SIZE) -> DataFrame:
    tok = docs.select("doc_id", F.explode(tokens()).alias("tok"))
    counts = tok.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    # Global top-V with deterministic tie-break -> TakeOrdered, then
    # broadcast: the vocab is bounded by construction.
    vocab = counts.orderBy(F.desc("c"), F.asc("tok")).limit(vocab_size)
    fl2 = (F.length(F.bin("c")) - F.lit(1)).cast("long")
    scored = tok.join(F.broadcast(vocab), "tok", "left").select(
        "doc_id",
        F.coalesce(fl2, F.lit(0)).alias("fl2"),
        F.col("c").isNull().cast("int").alias("oov"),
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum("oov").cast("long").alias("n_oov"),
        F.round((F.sum("fl2") / F.count(F.lit(1))) * 1000).cast("long")
        .alias("score_milli"),
    )


def _lm_score_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return unigram_lm_score(load(spark, sf_dir, "documents"))


_LM_SCORE_SQL = f"""
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
), counts AS (
  SELECT tok, COUNT(*) AS c FROM tok GROUP BY 1
), vocab AS (
  SELECT tok, c FROM counts ORDER BY c DESC, tok ASC LIMIT {LM_VOCAB_SIZE}
), scored AS (
  SELECT t.doc_id,
         CASE WHEN v.tok IS NULL THEN 0
              ELSE length(bin(v.c)) - 1 END AS fl2,
         CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END AS oov
  FROM tok t LEFT JOIN vocab v ON t.tok = v.tok
)
SELECT doc_id,
       COUNT(*) AS n_tokens,
       CAST(SUM(oov) AS BIGINT) AS n_oov,
       CAST(round((SUM(fl2) / COUNT(*)) * 1000) AS BIGINT) AS score_milli
FROM scored
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Token-budget curation: keep the highest-quality docs per language up
# to a fixed token budget — the selection step after cleaning/dedup
# when assembling a training mixture. The NAIVE shape (window-sort all
# docs per lang by quality, running-sum cutoff) funnels each language
# through ONE reducer's sort — a scale-killer when one lang is most of
# a 100 TB corpus. This implementation never sorts documents:
#   1. histogram — one corpus shuffle onto (lang, score) with map-side
#      combine; key space is langs × distinct scores (tiny),
#   2. cumulative tokens over the HISTOGRAM (a few thousand rows — the
#      window runs anywhere),
#   3. per-lang score cutoff = min score whose best-first running total
#      fits the budget, broadcast back,
#   4. map-only filter score >= cutoff.
# Whole-bucket semantics (a score bucket is kept or dropped atomically)
# keep the result deterministic and order-independent — no tie-breaking
# inside a bucket, so any partitioning yields the same corpus.
# ---------------------------------------------------------------------------

#: Per-language token budget for the curation query (fits the sf0.01
#: fixture so the cutoff actually bites; at production scale this is
#: the mixture spec's per-language token count).
TOKEN_BUDGET = 10_000


def quality_budget_select(docs: DataFrame,
                          budget: int = TOKEN_BUDGET) -> DataFrame:
    """(doc_id, lang, score, n_tokens) of docs kept under the budget.

    ``score`` is distinct-token count (vocabulary richness) — any
    deterministic integer quality score slots in. A language whose
    single best score bucket already exceeds the budget keeps nothing
    (no partial-bucket selection; see the whole-bucket note above).
    """
    from pyspark.sql import Window

    toks = tokens()
    scored = docs.select(
        "doc_id", "lang",
        F.size(F.array_distinct(toks)).alias("score"),
        F.size(toks).alias("n_tokens"),
    )
    hist = scored.groupBy("lang", "score").agg(
        F.sum("n_tokens").alias("bucket_tokens")
    )
    w = (
        Window.partitionBy("lang")
        .orderBy(F.desc("score"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = hist.withColumn("cum_tokens", F.sum("bucket_tokens").over(w))
    cutoffs = (
        cum.filter(F.col("cum_tokens") <= budget)
        .groupBy("lang")
        .agg(F.min("score").alias("cutoff"))
    )
    return (
        scored.join(F.broadcast(cutoffs), "lang")
        .filter(F.col("score") >= F.col("cutoff"))
        .select("doc_id", "lang", "score", "n_tokens")
    )


def _budget_select_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return quality_budget_select(load(spark, sf_dir, "documents"))


_BUDGET_SELECT_SQL = f"""
WITH scored AS (
  SELECT doc_id, lang,
         CAST(len(list_distinct(string_split(text, ' '))) AS INT) AS score,
         CAST(len(string_split(text, ' ')) AS INT) AS n_tokens
  FROM documents
), hist AS (
  SELECT lang, score, SUM(n_tokens) AS bucket_tokens
  FROM scored GROUP BY 1, 2
), cum AS (
  SELECT lang, score,
         SUM(bucket_tokens) OVER (PARTITION BY lang ORDER BY score DESC
                                  ROWS UNBOUNDED PRECEDING) AS cum_tokens
  FROM hist
), cutoffs AS (
  SELECT lang, MIN(score) AS cutoff
  FROM cum WHERE cum_tokens <= {TOKEN_BUDGET} GROUP BY 1
)
SELECT s.doc_id, s.lang, s.score, s.n_tokens
FROM scored s JOIN cutoffs c ON s.lang = c.lang AND s.score >= c.cutoff
"""


# ---------------------------------------------------------------------------
# Text normalization: the canonicalization pass that runs before exact
# dedup in real pipelines (casing/punctuation variants of the same
# document must collapse to one content hash). Pure map-only column
# math — lower → punctuation strip → whitespace collapse — using only
# RE2-safe ASCII character classes so Spark and DuckDB produce the
# byte-identical normal form (full Unicode NFC needs ICU, which the
# engines implement differently; the ASCII pipeline is the portable
# core and the structure is identical once ICU is available).
# ---------------------------------------------------------------------------


def normalize_text_col(col: str = "text") -> Column:
    # NULL text normalizes to '' (instead of propagating NULL into the
    # hash, where a downstream groupBy would lump all NULL-text docs
    # into one NULL-hash cluster and 0/1 flags would go NULL).
    lowered = F.lower(F.coalesce(F.col(col), F.lit("")))
    stripped = F.regexp_replace(lowered, "[^a-z0-9 ]", " ")
    collapsed = F.regexp_replace(stripped, " +", " ")
    return F.trim(collapsed)


def normalize_docs(docs: DataFrame) -> DataFrame:
    """(doc_id, norm_hash, n_tokens_norm, changed): canonical-form hash
    + whether normalization altered the document."""
    norm = normalize_text_col()
    return docs.select(
        "doc_id",
        F.md5(norm).alias("norm_hash"),
        F.size(F.split(norm, " ")).alias("n_tokens_norm"),
        (norm != F.coalesce(F.col("text"), F.lit("")))
        .cast("int").alias("changed"),
    )


def _normalize_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Inject casing/punctuation variants for every 9th doc so the
    # 'changed' branch (and the collapse-to-same-hash property the
    # operator exists for) is exercised on the fixture.
    docs = load(spark, sf_dir, "documents").select(
        "doc_id",
        F.when(
            F.pmod("doc_id", F.lit(9)) == 4,
            F.concat(F.upper(F.col("text")), F.lit("!!")),
        ).otherwise(F.col("text")).alias("text"),
    )
    return normalize_docs(docs)


_NORMALIZE_SQL = """
WITH varied AS (
  SELECT doc_id,
         CASE WHEN doc_id % 9 = 4 THEN upper(text) || '!!'
              ELSE text END AS text
  FROM documents
), norm AS (
  SELECT doc_id, COALESCE(text, '') AS text,
         trim(regexp_replace(regexp_replace(lower(COALESCE(text, '')), '[^a-z0-9 ]', ' ', 'g'),
                             ' +', ' ', 'g')) AS n
  FROM varied
)
SELECT doc_id,
       md5(n) AS norm_hash,
       CAST(len(string_split(n, ' ')) AS INT) AS n_tokens_norm,
       CAST(n != text AS INT) AS changed
FROM norm
"""


# ---------------------------------------------------------------------------
# Tokenizer-fertility / length-distribution report per (lang, source) —
# the routine curation read-out before committing a corpus mix: how long
# documents are in tokens (exact integer deciles of per-doc counts, the
# order_value_percentiles pattern) and how the BPE-ish subword proxy
# inflates them (fertility = word pieces per whitespace token, and
# chars per word piece — both exact milli-integer ratios of exact
# sums). One hash-aggregation on the tiny (lang, source) key space;
# everything upstream is a map-only projection, so the report is a
# single scan + one small shuffle at any corpus size.
# ---------------------------------------------------------------------------


def token_fertility_report(docs: DataFrame) -> DataFrame:
    t = tokens()
    per_doc = docs.select(
        "lang", "source",
        F.length("text").alias("n_chars"),
        F.size(t).alias("n_tokens"),
        # Same subword proxy text_stats uses (<=3-char greedy pieces).
        F.size(
            F.regexp_extract_all(F.col("text"), F.lit("[a-z]{1,3}"), 0)
        ).alias("n_pieces"),
    )
    pct = lambda p: F.round(  # noqa: E731
        F.percentile("n_tokens", F.lit(p))
    ).cast("bigint")
    return (
        per_doc.groupBy("lang", "source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.sum("n_pieces").alias("total_pieces"),
            pct(0.1).alias("tok_p10"),
            pct(0.25).alias("tok_p25"),
            pct(0.5).alias("tok_median"),
            pct(0.75).alias("tok_p75"),
            pct(0.9).alias("tok_p90"),
            F.expr("(1000 * sum(n_pieces)) div sum(n_tokens)")
            .alias("fertility_milli"),
            F.expr("(1000 * sum(n_chars)) div sum(n_pieces)")
            .alias("chars_per_piece_milli"),
        )
    )


def _fertility_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return token_fertility_report(load(spark, sf_dir, "documents"))


_FERTILITY_SQL = """
WITH per_doc AS (
  SELECT lang, source,
         CAST(length(text) AS INT) AS n_chars,
         CAST(len(string_split(text, ' ')) AS INT) AS n_tokens,
         CAST(len(regexp_extract_all(text, '[a-z]{1,3}')) AS INT) AS n_pieces
  FROM documents
)
SELECT lang, source,
       COUNT(*) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
       CAST(SUM(n_pieces) AS BIGINT) AS total_pieces,
       CAST(round(quantile_cont(n_tokens, 0.1)) AS BIGINT) AS tok_p10,
       CAST(round(quantile_cont(n_tokens, 0.25)) AS BIGINT) AS tok_p25,
       CAST(round(quantile_cont(n_tokens, 0.5)) AS BIGINT) AS tok_median,
       CAST(round(quantile_cont(n_tokens, 0.75)) AS BIGINT) AS tok_p75,
       CAST(round(quantile_cont(n_tokens, 0.9)) AS BIGINT) AS tok_p90,
       (1000 * CAST(SUM(n_pieces) AS BIGINT)) // CAST(SUM(n_tokens) AS BIGINT)
         AS fertility_milli,
       (1000 * CAST(SUM(n_chars) AS BIGINT)) // CAST(SUM(n_pieces) AS BIGINT)
         AS chars_per_piece_milli
FROM per_doc
GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# Per-domain document cap (the C4 / RefinedWeb "limit documents per
# domain" rule): no single source may contribute more than ~CAP docs,
# so one crawled megadomain can't dominate the mixture. Selection
# within a domain is deterministic-random (the shared md5 hash), NOT
# quality-ranked — which is what makes the scale-safe shape possible:
# instead of row_number() over each domain (funnels a 100 TB domain
# through ONE reducer's sort — the scale-killer documented at
# quality_budget_select), the hash is bucketized and a per-(source,
# bucket) HISTOGRAM — sources × B rows, tiny at any corpus size —
# takes the cumulative-count cutoff; docs then keep/drop by a map-only
# bucket comparison. Whole-bucket semantics (same as the token-budget
# cutoff): a bucket is kept or dropped atomically, so the kept count
# is cap ± one bucket's population and the result is independent of
# partitioning.
# ---------------------------------------------------------------------------

#: Per-source document cap (fits the fixture's 25-docs-per-source so
#: the cutoff actually bites; production sets this to the anti-
#: domination policy, e.g. 10^4 docs/domain).
DOMAIN_CAP = 15
#: Hash granularity (shared md5_mod convention) and bucket count.
DOMAIN_CAP_MOD = 10_000
DOMAIN_CAP_BUCKETS = 64


def domain_cap_select(docs: DataFrame, cap: int = DOMAIN_CAP) -> DataFrame:
    """(doc_id, source, cap_bucket, cap_keep): keep ≈``cap`` docs per
    source by deterministic hash-bucket cutoff."""
    from pyspark.sql import Window

    bucket = F.expr(
        f"div(cast(conv(substring(md5(cast(doc_id as string)), 1, 8), "
        f"16, 10) as bigint) % {DOMAIN_CAP_MOD}, "
        f"{DOMAIN_CAP_MOD // DOMAIN_CAP_BUCKETS})"
    ).cast("int")
    scored = docs.select("doc_id", "source", bucket.alias("cap_bucket"))
    hist = scored.groupBy("source", "cap_bucket").agg(
        F.count(F.lit(1)).alias("n")
    )
    w = (
        Window.partitionBy("source")
        .orderBy(F.asc("cap_bucket"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cutoffs = (
        hist.withColumn("cum", F.sum("n").over(w))
        .filter(F.col("cum") <= cap)
        .groupBy("source")
        .agg(F.max("cap_bucket").alias("cutoff"))
    )
    return (
        scored.join(F.broadcast(cutoffs), "source", "left")
        .select(
            "doc_id", "source", "cap_bucket",
            F.coalesce(F.col("cap_bucket") <= F.col("cutoff"), F.lit(False))
            .cast("int").alias("cap_keep"),
        )
    )


def _domain_cap_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return domain_cap_select(load(spark, sf_dir, "documents"))


_DOMAIN_CAP_SQL = f"""
WITH scored AS (
  SELECT doc_id, source,
         CAST((CAST(concat('0x', substring(md5(CAST(doc_id AS VARCHAR)),
                                           1, 8)) AS BIGINT)
               % {DOMAIN_CAP_MOD})
              // {DOMAIN_CAP_MOD // DOMAIN_CAP_BUCKETS} AS INT)
           AS cap_bucket
  FROM documents
), hist AS (
  SELECT source, cap_bucket, COUNT(*) AS n FROM scored GROUP BY 1, 2
), cum AS (
  SELECT source, cap_bucket,
         SUM(n) OVER (PARTITION BY source ORDER BY cap_bucket ASC
                      ROWS UNBOUNDED PRECEDING) AS cum
  FROM hist
), cutoffs AS (
  SELECT source, MAX(cap_bucket) AS cutoff
  FROM cum WHERE cum <= {DOMAIN_CAP} GROUP BY 1
)
SELECT s.doc_id, s.source, s.cap_bucket,
       CAST(coalesce(s.cap_bucket <= c.cutoff, FALSE) AS INT) AS cap_keep
FROM scored s LEFT JOIN cutoffs c USING (source)
"""


# ---------------------------------------------------------------------------
# DSIR-style importance resampling (Xie et al. 2023, "Data Selection
# for Language Models via Importance Resampling", arXiv:2302.03169 —
# public method). Select raw-corpus docs that look like a target
# domain: hashed n-gram bag-of-words features, per-feature importance
# log-ratio between a target-domain sample and the raw corpus, per-doc
# weight = mean feature log-ratio, then a deterministic md5-threshold
# acceptance whose probability scales with the weight (the
# mixture_upsample Bernoulli, so resampling is reproducible under any
# partitioning).
#
# Integer-exact adaptation (contract.py determinism rules): the log is
# floor-log2 of the add-one-smoothed bucket count (length(bin(c+1))-1
# — exact in any engine), and the per-doc normalization divides the
# two NON-NEGATIVE floor-log2 sums separately so `div` truncation and
# `//` floor agree (negative integer division truncates toward zero in
# Spark but floors in DuckDB — never divide a possibly-negative sum).
#
# Scale shape (100 TB): feature hashing is map-only (unigrams +
# bigrams → md5 mod B); BOTH distributions aggregate to at most
# B = 64 buckets (two hash-aggs whose output is bounded by B no matter
# the corpus size) and broadcast back over the feature stream; the only
# corpus-sized shuffle is the per-doc weight rollup on doc_id (uniform
# keys). The target sample is a deterministic doc_id-keyed slice
# standing in for a real target corpus, same convention as
# decontaminate's benchmark slice.
# ---------------------------------------------------------------------------

#: Hashed-feature bucket count (the DSIR paper uses 10^4; 64 keeps
#: every bucket populated at fixture scale while bounding both
#: distribution tables by construction).
DSIR_BUCKETS = 64
#: docs with doc_id % mod == 0 form the target-domain sample.
DSIR_TARGET_MOD = 13
#: acceptance granularity (per-mille, shared md5-Bernoulli convention).
DSIR_ACCEPT_MOD = 1000


def _dsir_features(docs: DataFrame) -> DataFrame:
    """(doc_id, bucket): hashed unigram + bigram features, map-only."""
    toks = tokens()
    grams = F.concat(
        toks,
        F.when(
            F.size(toks) >= 2,
            F.expr(
                "transform(sequence(1, size(split(text, ' ')) - 1), "
                "i -> concat_ws(' ', slice(split(text, ' '), i, 2)))"
            ),
        ).otherwise(F.array().cast("array<string>")),
    )
    return (
        docs.select("doc_id", F.explode(grams).alias("gram"))
        .select("doc_id", md5_mod("gram", DSIR_BUCKETS).alias("bucket"))
    )


def importance_resample(docs: DataFrame,
                        target_mod: int = DSIR_TARGET_MOD) -> DataFrame:
    """Per-doc DSIR report: feature count, target/raw floor-log2 score
    sums, milli importance weight, acceptance probability (per-mille)
    and the deterministic accept flag."""
    feats = _dsir_features(docs)
    fl2 = (F.length(F.bin(F.col("c") + F.lit(1))) - F.lit(1)).cast("long")
    target_counts = (
        feats.filter(F.col("doc_id") % target_mod == 0)
        .groupBy("bucket").agg(F.count(F.lit(1)).alias("c"))
        .select("bucket", fl2.alias("t_fl2"))
    )
    raw_counts = (
        feats.groupBy("bucket").agg(F.count(F.lit(1)).alias("c"))
        .select("bucket", fl2.alias("r_fl2"))
    )
    per_doc = (
        feats
        .join(F.broadcast(target_counts), "bucket", "left")
        .join(F.broadcast(raw_counts), "bucket", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_feats"),
            F.sum(F.coalesce("t_fl2", F.lit(0))).cast("long")
            .alias("t_score"),
            F.sum(F.coalesce("r_fl2", F.lit(0))).cast("long")
            .alias("r_score"),
        )
    )
    # Both operands of each div are non-negative — truncation == floor.
    w_milli = (
        F.expr("div(1000 * t_score, n_feats)")
        - F.expr("div(1000 * r_score, n_feats)")
    ).cast("long")
    weighted = per_doc.select(
        "doc_id", "n_feats", "t_score", "r_score",
        w_milli.alias("weight_milli"),
    )
    # Self-normalization: raw weights carry a constant ≈ -log2(|corpus|/
    # |target slice|) offset (the unnormalized-count ratio), so
    # acceptance centers on the corpus MEAN weight — the integer form of
    # dividing by the geometric-mean importance weight, which is what
    # makes self-normalized importance resampling scale-free. (A
    # bucket-total constant fl2(R)-fl2(T) would avoid this second pass
    # but quantizes to whole bits — up to 1000 milli off-center, enough
    # to clamp every doc to accept 0 or 1000.) One scalar agg, broadcast
    # back (the q22 avg_bal shape). floor() on the double quotient (not
    # integer div) because sum_w may be negative and Spark's div
    # truncates where DuckDB's // floors.
    #
    # NOTE (scale): the unpersisted `weighted` subtree is referenced by
    # both the output and the stats scalar, so the declarative plan
    # recomputes the per-doc rollup twice. In a production run persist
    # `weighted` first (a few ints per doc — the same note as
    # similarity.py's semantic-dedup assignment); the oracle and the
    # result are unaffected.
    stats = weighted.agg(
        F.count(F.lit(1)).alias("__n_docs"),
        F.sum("weight_milli").cast("long").alias("__sum_w"),
    )
    mean_w = F.floor(
        F.col("__sum_w").cast("double") / F.col("__n_docs")
    ).cast("long")
    accept_milli = F.greatest(
        F.lit(0).cast("long"),
        F.least(F.lit(DSIR_ACCEPT_MOD).cast("long"),
                F.lit(500) + F.col("weight_milli") - mean_w),
    )
    return weighted.crossJoin(F.broadcast(stats)).select(
        "doc_id", "n_feats", "t_score", "r_score", "weight_milli",
        accept_milli.alias("accept_milli"),
        (md5_mod("doc_id", DSIR_ACCEPT_MOD) < accept_milli).cast("int")
        .alias("accepted"),
    )


def _dsir_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return importance_resample(load(spark, sf_dir, "documents"))


_DSIR_MD5 = ("CAST(concat('0x', substring(md5(CAST({col} AS VARCHAR)), 1, 8)) "
             "AS BIGINT)")

_DSIR_SQL = f"""
WITH tok AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
), grams AS (
  SELECT doc_id,
         unnest(list_concat(
           t,
           CASE WHEN len(t) >= 2
                THEN list_transform(range(1, len(t)),
                       i -> array_to_string(list_slice(t, i, i + 1), ' '))
                ELSE [] END)) AS gram
  FROM tok
), feats AS (
  SELECT doc_id,
         {_DSIR_MD5.format(col='gram')} % {DSIR_BUCKETS} AS bucket
  FROM grams
), target_counts AS (
  SELECT bucket, length(bin(COUNT(*) + 1)) - 1 AS t_fl2
  FROM feats WHERE doc_id % {DSIR_TARGET_MOD} = 0 GROUP BY 1
), raw_counts AS (
  SELECT bucket, length(bin(COUNT(*) + 1)) - 1 AS r_fl2
  FROM feats GROUP BY 1
), per_doc AS (
  SELECT f.doc_id,
         COUNT(*) AS n_feats,
         CAST(SUM(coalesce(tc.t_fl2, 0)) AS BIGINT) AS t_score,
         CAST(SUM(coalesce(rc.r_fl2, 0)) AS BIGINT) AS r_score
  FROM feats f
  LEFT JOIN target_counts tc USING (bucket)
  LEFT JOIN raw_counts rc USING (bucket)
  GROUP BY 1
), weighted AS (
  SELECT doc_id, n_feats, t_score, r_score,
         CAST((1000 * t_score) // n_feats
              - (1000 * r_score) // n_feats AS BIGINT) AS weight_milli
  FROM per_doc
), stats AS (
  SELECT COUNT(*) AS n_docs,
         CAST(SUM(weight_milli) AS BIGINT) AS sum_w
  FROM weighted
), centered AS (
  SELECT doc_id, n_feats, t_score, r_score, weight_milli,
         greatest(0, least({DSIR_ACCEPT_MOD},
           500 + weight_milli
               - CAST(floor(CAST(sum_w AS DOUBLE) / n_docs) AS BIGINT)))
           AS accept_milli
  FROM weighted, stats
)
SELECT doc_id, n_feats, t_score, r_score, weight_milli, accept_milli,
       CAST({_DSIR_MD5.format(col='doc_id')} % {DSIR_ACCEPT_MOD}
            < accept_milli AS INT) AS accepted
FROM centered
"""


# ---------------------------------------------------------------------------
# Exact-k per-stratum sampling: the other half of the sampling story.
# `docs_sample_stratified` draws a RATE per stratum (output size is
# binomial — right for "keep 10% of each language"); eval sets and
# human-review queues instead need EXACTLY k docs per stratum. Rank by
# the shared md5_mod hash (uniform, reproducible under any
# partitioning and in any engine) inside each (lang, source) window,
# tie-broken by doc_id, keep rank ≤ k. A stratum with fewer than k
# docs yields all of them — no padding, no error.
#
# Scale shape: one exchange on the stratum key; the window's
# row_number short-circuits via WindowGroupLimit (Spark pushes
# rank-limit predicates into the sort), so no stratum ever
# materializes a full ordering beyond the top-k frontier.
# ---------------------------------------------------------------------------

SAMPLE_K = 3


def hash_sample_exact_k(docs: DataFrame, k: int = SAMPLE_K) -> DataFrame:
    from pyspark.sql import Window

    w = Window.partitionBy("lang", "source").orderBy(
        md5_mod("doc_id").asc(), F.col("doc_id").asc()
    )
    return (
        docs.withColumn("sample_rank", F.row_number().over(w).cast("int"))
        .filter(F.col("sample_rank") <= k)
        .select("lang", "source", "sample_rank", "doc_id")
    )


def _exact_k_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return hash_sample_exact_k(load(spark, sf_dir, "documents"))


_EXACT_K_SQL = f"""
WITH ranked AS (
  SELECT lang, source, doc_id,
         CAST(ROW_NUMBER() OVER (
           PARTITION BY lang, source
           ORDER BY CAST(concat('0x', substring(md5(CAST(doc_id AS VARCHAR)),
                                 1, 8)) AS BIGINT) ASC,
                    doc_id ASC) AS INT) AS sample_rank
  FROM documents
)
SELECT lang, source, sample_rank, doc_id
FROM ranked WHERE sample_rank <= {SAMPLE_K}
"""


# ---------------------------------------------------------------------------
# BPE tokenizer training (Sennrich 2016): the actual merge loop, not
# just pair counting (text_bigram_vocab stops at counting). The
# scale-critical property mirrors how real trainers (SentencePiece, HF
# tokenizers) work: ONE corpus pass builds the word-frequency
# histogram, and every merge iteration after that runs on the
# vocab-sized histogram only — corpus size never touches the loop.
#
# Cross-engine trick: a segmentation is encoded as a doubled-delimiter
# string ("low" → "|l||o||w|"), so merging pair (a,b) is a plain
# string replace of "|a||b|" with "|ab|". Both engines' replace() scans
# left-to-right non-overlapping — exactly BPE's greedy merge order —
# and the doubled delimiters make consecutive merges non-overlapping at
# the string level ("|a||a||a|" → "|aa||a|") while a symbol that merely
# ENDS in `a` can never false-match ("|xa||b|" ∌ "|a||b|"). The oracle
# unrolls the fixed iteration count into CTEs exactly as embed_kmeans
# unrolls Lloyd iterations.
# ---------------------------------------------------------------------------

#: Fixed merge count — unrolled into the oracle SQL, so it must stay a
#: compile-time constant (3 keeps the oracle readable; production BPE
#: runs ~30k merges over the same vocab-sized histogram).
BPE_MERGES = 3


def bpe_word_freqs(docs: DataFrame) -> DataFrame:
    """(word, freq) histogram — the single corpus-sized pass of BPE
    training. Words containing the '|' delimiter are excluded (none in
    the fixtures; a production run picks an out-of-alphabet byte)."""
    return (
        docs.select(F.explode(tokens()).alias("word"))
        .filter(~F.col("word").contains("|"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def _seg_symbols(col: str) -> Column:
    """Split a delimited segmentation back into its symbol array."""
    return F.split(F.expr(f"trim(BOTH '|' FROM {col})"), "\\|\\|")


def _bpe_merge_loop(docs: DataFrame, n_merges: int):
    """Run the merge loop; returns (words-after-merges, per-iteration
    log DataFrames). Shared by the merge-log query (`bpe_train`) and
    the segmentation query (`bpe_segment_stats`).

    Ties on pair count break on the delimited pair string ascending
    (ASCII-only symbols → identical collation in any engine).
    """
    words = (
        bpe_word_freqs(docs)
        .withColumn("seg", F.regexp_replace("word", "(.)", r"|$1|"))
        # The histogram is vocab-sized; cutting lineage here keeps each
        # unrolled iteration from re-scanning the corpus (same trick as
        # the embed_pq_topk codebook).
        .localCheckpoint(eager=False)
    )
    pair_expr = F.expr(
        "CASE WHEN size(__syms) >= 2 THEN "
        "transform(sequence(1, size(__syms) - 1), "
        "          i -> concat('|', __syms[i - 1], '||', __syms[i], '|')) "
        "ELSE array() END"
    )
    logs = []
    for it in range(1, n_merges + 1):
        pair_counts = (
            words.withColumn("__syms", _seg_symbols("seg"))
            .select("freq", F.explode(pair_expr).alias("pair"))
            .groupBy("pair")
            .agg(F.sum("freq").cast("long").alias("cnt"))
        )
        winner = (
            pair_counts.orderBy(F.desc("cnt"), F.asc("pair"))
            .limit(1)
            .select("pair", "cnt",
                    F.expr("replace(pair, '||', '')").alias("merged"))
        )
        words = (
            words.crossJoin(F.broadcast(
                winner.select(F.col("pair").alias("__p"),
                              F.col("merged").alias("__m"))))
            .withColumn("seg", F.expr("replace(seg, __p, __m)"))
            .drop("__p", "__m")
            .localCheckpoint(eager=False)
        )
        total = words.agg(
            F.sum(F.col("freq") * F.size(_seg_symbols("seg")))
            .cast("long").alias("total_symbols")
        )
        wsyms = _seg_symbols("pair")
        logs.append(
            winner.crossJoin(F.broadcast(total)).select(
                F.lit(it).alias("iter"),
                wsyms.getItem(0).alias("left_sym"),
                wsyms.getItem(1).alias("right_sym"),
                F.expr("trim(BOTH '|' FROM merged)").alias("merged_sym"),
                F.col("cnt").alias("pair_count"),
                "total_symbols",
            )
        )
    return words, logs


def bpe_train(docs: DataFrame, n_merges: int = BPE_MERGES) -> DataFrame:
    """Merge log after ``n_merges`` BPE iterations: one row per merge
    with the winning pair, its weighted corpus count, and the total
    corpus symbol count after applying the merge."""
    _, logs = _bpe_merge_loop(docs, n_merges)
    out = logs[0]
    for part in logs[1:]:
        out = out.unionAll(part)
    return out


def bpe_segment_stats(docs: DataFrame,
                      n_merges: int = BPE_MERGES) -> DataFrame:
    """Apply the trained merges back to the corpus: per-doc piece
    counts under the ``n_merges``-merge BPE vocabulary — the
    tokenizer-fertility readout for the tokenizer this corpus would
    train (compare `token_fertility_report`, which measures a FIXED
    tokenizer).

    Scale shape: segmentation lives on the vocab-sized word table
    (words → piece counts, broadcast back over the token stream), so
    the corpus pays one explode + one hash-agg — identical to any
    token-statistics pass; the merge loop itself never touches the
    corpus after the histogram.
    """
    words, _ = _bpe_merge_loop(docs, n_merges)
    vocab = words.select(
        "word",
        F.size(_seg_symbols("seg")).cast("long").alias("n_pieces_word"),
    )
    tok = docs.select("doc_id", F.explode(tokens()).alias("word"))
    return (
        tok.join(F.broadcast(vocab), "word")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("n_pieces_word").cast("long").alias("n_pieces"),
        )
        .select(
            "doc_id", "n_tokens", "n_pieces",
            F.expr("div(1000 * n_pieces, n_tokens)").cast("int")
            .alias("pieces_per_token_milli"),
        )
    )


def _bpe_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return bpe_train(load(spark, sf_dir, "documents"))


def _bpe_segment_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return bpe_segment_stats(load(spark, sf_dir, "documents"))


def _bpe_cte_prefix(n_merges: int = BPE_MERGES) -> str:
    """The shared unrolled-merge-loop WITH body (no final SELECT)."""
    body = [r"""
WITH wf AS (
  SELECT word, COUNT(*) AS freq
  FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
  WHERE NOT contains(word, '|')
  GROUP BY 1
), seg1 AS (
  SELECT word, freq, regexp_replace(word, '(.)', '|\1|', 'g') AS seg FROM wf
)"""]
    for g in range(1, n_merges + 1):
        body.append(f""", p{g} AS (
  SELECT freq, unnest(list_transform(range(1, len(syms)),
                i -> '|' || syms[i] || '||' || syms[i + 1] || '|')) AS pair
  FROM (SELECT freq, string_split(trim(seg, '|'), '||') AS syms FROM seg{g})
  WHERE len(syms) >= 2
), c{g} AS (
  SELECT pair, CAST(SUM(freq) AS BIGINT) AS cnt FROM p{g} GROUP BY 1
), w{g} AS (
  SELECT pair, cnt, replace(pair, '||', '') AS merged
  FROM c{g} ORDER BY cnt DESC, pair ASC LIMIT 1
), seg{g + 1} AS (
  SELECT s.word, s.freq, replace(s.seg, w.pair, w.merged) AS seg
  FROM seg{g} s, w{g} w
), t{g} AS (
  SELECT CAST(SUM(freq * len(string_split(trim(seg, '|'), '||'))) AS BIGINT)
         AS total_symbols
  FROM seg{g + 1}
)""")
    return "".join(body)


def _bpe_sql(n_merges: int = BPE_MERGES) -> str:
    rows = "\nUNION ALL\n".join(
        f"""SELECT {g} AS iter,
       string_split(trim(w.pair, '|'), '||')[1] AS left_sym,
       string_split(trim(w.pair, '|'), '||')[2] AS right_sym,
       trim(w.merged, '|') AS merged_sym,
       w.cnt AS pair_count, t.total_symbols
FROM w{g} w, t{g} t"""
        for g in range(1, n_merges + 1)
    )
    return _bpe_cte_prefix(n_merges) + f"""
SELECT CAST(iter AS INT) AS iter, left_sym, right_sym, merged_sym,
       pair_count, total_symbols
FROM ({rows})
ORDER BY iter
"""


def _bpe_segment_sql(n_merges: int = BPE_MERGES) -> str:
    return _bpe_cte_prefix(n_merges) + f""", vocab AS (
  SELECT word,
         len(string_split(trim(seg, '|'), '||')) AS n_pieces_word
  FROM seg{n_merges + 1}
), tokd AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
)
SELECT t.doc_id,
       COUNT(*) AS n_tokens,
       CAST(SUM(v.n_pieces_word) AS BIGINT) AS n_pieces,
       CAST((1000 * SUM(v.n_pieces_word)) // COUNT(*) AS INT)
         AS pieces_per_token_milli
FROM tokd t JOIN vocab v USING (word)
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# BM25 top-k retrieval (Robertson/Lucene variant): extends text_tfidf
# with the k1/b saturation formula over an inverted postings table. The
# scale shape: postings (tf per doc×term) is the ONE corpus shuffle;
# the bounded query set and per-term df are broadcast; scoring is a
# term-keyed join against postings — never a corpus cross-join.
# Per-term contributions are quantized to integer micro-units BEFORE
# the per-document sum, because a float Σ over terms is
# summation-order-dependent and the two engines aggregate in different
# orders; integer sums are exact under any order.
# ---------------------------------------------------------------------------

BM25_K1 = 1.2
BM25_B = 0.75
BM25_TOP_K = 5

#: Bounded literal query set (terms drawn from the fixture vocabulary;
#: 'zzz' in query 3 exercises the OOV path — it matches no postings and
#: simply contributes nothing).
BM25_QUERIES: tuple[tuple[int, str], ...] = (
    (1, "hash join"),
    (2, "window merge order"),
    (3, "fast scan zzz"),
)


def _bm25_contrib(tf, df, dl, n_docs, total_tokens) -> Column:
    """One query term's BM25 contribution, written in the exact
    expression order the oracle SQL uses (IEEE-identical given
    identical integer inputs)."""
    avgdl = total_tokens.cast("double") / n_docs
    idf = F.log(
        F.lit(1.0)
        + ((n_docs - df).cast("double") + F.lit(0.5))
        / (df.cast("double") + F.lit(0.5))
    )
    denom = tf.cast("double") + F.lit(BM25_K1) * (
        F.lit(1.0 - BM25_B) + F.lit(BM25_B) * (dl.cast("double") / avgdl)
    )
    contrib = idf * ((tf.cast("double") * F.lit(BM25_K1 + 1.0)) / denom)
    return F.round(contrib * F.lit(1000000.0)).cast("long")


def doc_postings(docs: DataFrame) -> DataFrame:
    """The inverted-postings table (doc_id, dl, term, tf) — the
    PERSISTABLE index half. A streaming ingest maintains this
    incrementally (streaming/corpus.py::stream_postings_maintenance):
    a document's postings are a pure function of its text, so appends
    are per-batch map+agg work and never touch earlier docs."""
    toks = docs.select(
        "doc_id", F.size(tokens()).alias("dl"),
        F.explode(tokens()).alias("term"),
    )
    # dl is functionally dependent on doc_id, so folding it into the
    # grouping key costs nothing and saves a doc-keyed length join.
    return toks.groupBy("doc_id", "dl", "term").agg(
        F.count(F.lit(1)).alias("tf")
    )


def bm25_from_postings(postings: DataFrame,
                       queries: tuple[tuple[int, str], ...] = BM25_QUERIES,
                       k: int = BM25_TOP_K) -> DataFrame:
    """BM25 top-k scored from a (doc_id, dl, term, tf) postings table;
    corpus stats (n_docs, total tokens) re-derive from the postings'
    distinct (doc_id, dl) pairs, so the index is self-contained."""
    from pyspark.sql import Window

    spark = postings.sparkSession
    if isinstance(queries, DataFrame):
        # Data-derived query batch: (query_id int, term string) rows —
        # the self-retrieval eval builds its queries FROM the corpus.
        qterms = queries
    else:
        qterms = spark.createDataFrame(
            [(qid, t) for qid, text in queries for t in text.split()],
            "query_id int, term string",
        )
    ptf = postings.join(
        F.broadcast(qterms.select("term").distinct()), "term"
    )
    df_ = ptf.groupBy("term").agg(F.count(F.lit(1)).cast("long").alias("df"))
    stats = postings.select("doc_id", "dl").distinct().agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("dl").cast("long").alias("total_tokens"),
    )
    scored = (
        ptf.join(F.broadcast(qterms), "term")
        .join(F.broadcast(df_), "term")
        .crossJoin(F.broadcast(stats))
        .select(
            "query_id", "doc_id",
            _bm25_contrib(F.col("tf"), F.col("df"), F.col("dl"),
                          F.col("n_docs"), F.col("total_tokens"))
            .alias("contrib_micro"),
        )
    )
    agg = scored.groupBy("query_id", "doc_id").agg(
        F.count(F.lit(1)).cast("int").alias("n_terms"),
        F.sum("contrib_micro").cast("long").alias("score_micro"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score_micro"), F.asc("doc_id")
    )
    return (
        agg.withColumn("rnk", F.row_number().over(w).cast("int"))
        .filter(F.col("rnk") <= k)
    )


def bm25_topk(docs: DataFrame,
              queries: tuple[tuple[int, str], ...] = BM25_QUERIES,
              k: int = BM25_TOP_K) -> DataFrame:
    """Top-k documents per query under BM25, scored in integer
    micro-units (deterministic ranking — no float-sum ordering).
    Composed from the index/score halves above."""
    return bm25_from_postings(doc_postings(docs), queries, k)


def _bm25_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return bm25_topk(load(spark, sf_dir, "documents"))


def _bm25_sql(queries: tuple[tuple[int, str], ...] = BM25_QUERIES,
              k: int = BM25_TOP_K) -> str:
    values = ", ".join(
        f"({qid}, '{t}')" for qid, text in queries for t in text.split()
    )
    return f"""
WITH q(query_id, term) AS (
  VALUES {values}
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
  SELECT query_id, doc_id,
         CAST(COUNT(*) AS INT) AS n_terms,
         CAST(SUM(contrib_micro) AS BIGINT) AS score_micro
  FROM scored GROUP BY 1, 2
)
SELECT CAST(query_id AS INT) AS query_id, doc_id, n_terms, score_micro,
       CAST(row_number() OVER (PARTITION BY query_id
                               ORDER BY score_micro DESC, doc_id ASC)
            AS INT) AS rnk
FROM agg
QUALIFY rnk <= {k}
"""


# ---------------------------------------------------------------------------
# Bigram LM quality scoring (CCNet-style perplexity filtering,
# Wenzek et al. 2020): train a reference language model on a curated
# slice, score every document by bits-per-token under it, filter the
# high-perplexity tail. The reference uses a KenLM 5-gram; here the
# model is a bigram with stupid backoff (Brants et al. 2007) so every
# probability is a RATIO OF INTEGER COUNTS and the whole score stays
# exact-integer cross-engine: log2 is the floor-log2 convention
# (length(bin(x)) − 1) already used by text_unigram_lm_score, and the
# backoff/OOV penalties are fixed bit constants instead of float
# lambdas.
#
# Per transition (w1 → w2), ref counts c12/c1/c2 and ref size N:
#   seen bigram:            bits = fl2(c12) − fl2(c1)        (≤ 0)
#   unseen bigram, seen w2: bits = fl2(c2) − fl2(N) − 3      (backoff)
#   OOV w2:                 bits = −fl2(N) − 6
# Every term is ≤ 0, so the per-doc mean is reported as NEGATED
# bits·1000 via non-negative `div` (the engine-portable division — see
# contract.py on div/floor).
#
# Scale shape: the reference tables (bigram counts, unigram counts,
# 1-row N fold) are REFERENCE-corpus-sized — a curated slice by
# definition — so they broadcast, and scoring is map-only over the
# token stream: one windowed-shingle pass + three broadcast joins +
# one doc-keyed hash-agg. The corpus is never shuffled on a term key.
# ---------------------------------------------------------------------------

#: Reference slice: the fixture's src0 covers all 31 unigrams but only
#: 715/916 corpus bigrams, so ~20% of transitions exercise the backoff
#: branch (non-vacuous); the OOV branch is pinned by a unit test with
#: hand data (tests/test_scale.py).
BIGRAM_REF_SOURCE = "src0"
BIGRAM_BACKOFF_BITS = 3
BIGRAM_OOV_BITS = 6


def bigram_lm_score(docs: DataFrame,
                    ref_source: str = BIGRAM_REF_SOURCE,
                    ref_docs: DataFrame | None = None) -> DataFrame:
    """(doc_id, n_transitions, n_backoff, n_oov, nll_bits_milli) for
    every doc with ≥ 2 tokens; nll_bits_milli = mean negated bits per
    transition × 1000 (higher = worse under the reference LM).

    The model trains on ``ref_docs`` when given (any frame with
    doc_id/text — the streaming gate passes a caller-owned slice),
    else on ``docs`` filtered to ``ref_source`` (the catalog query's
    self-contained form)."""
    from etl_validator_github_spark.scale.dedup import windowed_shingles

    base = docs.select("doc_id", "source",
                       F.split("text", " ").alias("__toks"))
    ref = (
        ref_docs.select("doc_id", F.split("text", " ").alias("__toks"))
        if ref_docs is not None
        else base.filter(F.col("source") == ref_source)
    )
    ref_tok = ref.select(F.explode("__toks").alias("tok"))
    c_uni = ref_tok.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    n_ref = c_uni.groupBy().agg(F.sum("c").alias("n_ref"))  # 1-row fold
    c_big = (
        windowed_shingles(ref.select("doc_id", "__toks"), 2)
        .groupBy("shingle").agg(F.count(F.lit(1)).alias("c12"))
    )

    trans = (
        windowed_shingles(base.select("doc_id", "__toks"), 2)
        .select(
            "doc_id", "shingle",
            F.substring_index("shingle", " ", 1).alias("w1"),
            F.substring_index("shingle", " ", -1).alias("w2"),
        )
    )

    def fl2(col):
        return (F.length(F.bin(col)) - F.lit(1)).cast("long")

    j = (
        trans
        .join(F.broadcast(c_big), "shingle", "left")
        .join(F.broadcast(c_uni.withColumnRenamed("tok", "w1")
                          .withColumnRenamed("c", "c1")), "w1", "left")
        .join(F.broadcast(c_uni.withColumnRenamed("tok", "w2")
                          .withColumnRenamed("c", "c2")), "w2", "left")
        .crossJoin(F.broadcast(n_ref))
    )
    bits = (
        F.when(F.col("c12").isNotNull(),
               fl2("c12") - fl2("c1"))
        .when(F.col("c2").isNotNull(),
              fl2("c2") - fl2("n_ref") - F.lit(BIGRAM_BACKOFF_BITS))
        .otherwise(-fl2("n_ref") - F.lit(BIGRAM_OOV_BITS))
    )
    scored = j.select(
        "doc_id",
        (-bits).alias("neg_bits"),
        (F.col("c12").isNull() & F.col("c2").isNotNull())
        .cast("int").alias("backoff"),
        F.col("c2").isNull().cast("int").alias("oov"),
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_transitions"),
            F.sum("backoff").cast("int").alias("n_backoff"),
            F.sum("oov").cast("int").alias("n_oov"),
            F.sum("neg_bits").alias("__s"),
        )
        .select(
            "doc_id", "n_transitions", "n_backoff", "n_oov",
            F.expr("(1000 * __s) div n_transitions")
            .alias("nll_bits_milli"),
        )
    )


def _bigram_lm_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return bigram_lm_score(load(spark, sf_dir, "documents"))


_BIGRAM_LM_SQL = f"""
WITH tok AS (
  SELECT doc_id, source, string_split(text, ' ') AS toks FROM documents
), ref_uni AS (
  SELECT tok, COUNT(*) AS c
  FROM (SELECT unnest(toks) AS tok FROM tok
        WHERE source = '{BIGRAM_REF_SOURCE}')
  GROUP BY 1
), ref_n AS (
  SELECT SUM(c) AS n_ref FROM ref_uni
), ref_big AS (
  SELECT bg, COUNT(*) AS c12
  FROM (SELECT unnest(list_transform(range(1, len(toks)),
               i -> toks[i] || ' ' || toks[i + 1])) AS bg
        FROM tok WHERE source = '{BIGRAM_REF_SOURCE}')
  GROUP BY 1
), trans AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(toks)), i -> toks[i])) AS w1,
         unnest(list_transform(range(1, len(toks)),
                i -> toks[i + 1])) AS w2
  FROM tok
), scored AS (
  SELECT t.doc_id,
         CASE WHEN b.c12 IS NOT NULL
                THEN (length(bin(b.c12)) - 1) - (length(bin(u1.c)) - 1)
              WHEN u2.c IS NOT NULL
                THEN (length(bin(u2.c)) - 1) - (length(bin(rn.n_ref)) - 1)
                     - {BIGRAM_BACKOFF_BITS}
              ELSE -(length(bin(rn.n_ref)) - 1) - {BIGRAM_OOV_BITS}
         END AS bits,
         CASE WHEN b.c12 IS NULL AND u2.c IS NOT NULL
              THEN 1 ELSE 0 END AS backoff,
         CASE WHEN u2.c IS NULL THEN 1 ELSE 0 END AS oov
  FROM trans t
  LEFT JOIN ref_big b ON b.bg = t.w1 || ' ' || t.w2
  LEFT JOIN ref_uni u1 ON u1.tok = t.w1
  LEFT JOIN ref_uni u2 ON u2.tok = t.w2
  CROSS JOIN ref_n rn
)
SELECT doc_id,
       CAST(COUNT(*) AS INT) AS n_transitions,
       CAST(SUM(backoff) AS INT) AS n_backoff,
       CAST(SUM(oov) AS INT) AS n_oov,
       CAST((1000 * SUM(-bits)) // COUNT(*) AS BIGINT) AS nll_bits_milli
FROM scored
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# CCNet perplexity bucketing (Wenzek et al. 2020 §4.3): split each
# language's corpus into head / middle / tail thirds by LM perplexity
# — head feeds training as-is, middle is kept with caution, tail is
# dropped or down-weighted. CCNet sorts each language by KenLM
# perplexity and cuts at the 33/66 percentiles; a literal per-language
# sort of a 100 TB corpus is exactly the shape we refuse elsewhere
# (domain_cap, token_budget), so the cutoffs come from an exact score
# HISTOGRAM instead: nll_bits_milli is already integer-quantized, so
# (lang, score) hash-agg is bounded by langs × score-range (thousands
# of rows no matter the corpus size), the cumulative window runs on
# that tiny table, and the bucket assignment is one broadcast join —
# the corpus is scanned twice (scoring + labeling) and never sorted.
#
# Cutoff convention (deterministic, tie-safe): p1 = smallest score s
# with 3·cum(s) ≥ total, p2 = smallest s with 3·cum(s) ≥ 2·total;
# bucket = head if score ≤ p1, middle if score ≤ p2, else tail. Ties
# at a boundary all land on the lower bucket, so the split is exact
# thirds only in the tie-free case — same convention both engines.
# ---------------------------------------------------------------------------


def perplexity_buckets(docs: DataFrame) -> DataFrame:
    """(doc_id, lang, nll_bits_milli, ppl_bucket) for every doc with
    ≥ 2 tokens; ppl_bucket ∈ {head, middle, tail} per language."""
    from pyspark.sql import Window

    scored = (
        bigram_lm_score(docs)
        .select("doc_id", "nll_bits_milli")
        .join(docs.select("doc_id", "lang"), "doc_id")
        # Lazy barrier (r13): the histogram and the final labeling both
        # consume the scores, and without it the ENTIRE bigram-LM
        # scoring pipeline (reference-model joins and all) re-plans and
        # re-executes per consumer — the "scan twice" note below only
        # budgeted for the corpus scan. The materialized frame is three
        # narrow columns per doc (measured at sf0.1: 1.83 -> 1.57 s
        # warm, 8.7 -> 3.6 s cold; plan 18 scans -> 10).
        .localCheckpoint(eager=False)
    )
    hist = scored.groupBy("lang", "nll_bits_milli").agg(
        F.count(F.lit(1)).alias("n")
    )
    w = (
        Window.partitionBy("lang")
        .orderBy(F.asc("nll_bits_milli"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = hist.withColumn("cum", F.sum("n").over(w))
    tot = hist.groupBy("lang").agg(F.sum("n").alias("tot"))
    cuts = (
        cum.join(tot, "lang")
        .groupBy("lang")
        .agg(
            F.min(F.when(3 * F.col("cum") >= F.col("tot"),
                         F.col("nll_bits_milli"))).alias("p1"),
            F.min(F.when(3 * F.col("cum") >= 2 * F.col("tot"),
                         F.col("nll_bits_milli"))).alias("p2"),
        )
    )
    return (
        scored.join(F.broadcast(cuts), "lang")
        .select(
            "doc_id", "lang", "nll_bits_milli",
            F.when(F.col("nll_bits_milli") <= F.col("p1"), "head")
            .when(F.col("nll_bits_milli") <= F.col("p2"), "middle")
            .otherwise("tail").alias("ppl_bucket"),
        )
    )


def _ppl_buckets_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return perplexity_buckets(load(spark, sf_dir, "documents"))


_PPL_BUCKETS_SQL = f"""
WITH lm AS (
  {_BIGRAM_LM_SQL}
), scored AS (
  SELECT lm.doc_id, d.lang, lm.nll_bits_milli
  FROM lm JOIN documents d ON d.doc_id = lm.doc_id
), hist AS (
  SELECT lang, nll_bits_milli AS s, COUNT(*) AS n
  FROM scored GROUP BY 1, 2
), cum AS (
  SELECT lang, s,
         SUM(n) OVER (PARTITION BY lang ORDER BY s ASC
                      ROWS UNBOUNDED PRECEDING) AS cum
  FROM hist
), tot AS (
  SELECT lang, SUM(n) AS tot FROM hist GROUP BY 1
), cuts AS (
  SELECT lang,
         MIN(CASE WHEN 3 * cum >= tot THEN s END) AS p1,
         MIN(CASE WHEN 3 * cum >= 2 * tot THEN s END) AS p2
  FROM cum JOIN tot USING (lang) GROUP BY 1
)
SELECT sc.doc_id, sc.lang, sc.nll_bits_milli,
       CASE WHEN sc.nll_bits_milli <= c.p1 THEN 'head'
            WHEN sc.nll_bits_milli <= c.p2 THEN 'middle'
            ELSE 'tail' END AS ppl_bucket
FROM scored sc JOIN cuts c USING (lang)
"""


# ---------------------------------------------------------------------------
# N-gram novelty vs a reference slice: per document, the fraction of
# k-token windows whose hash never occurs in the reference corpus — the
# standard "how much NEW text does this source add" curation readout
# (the complement of the n-gram overlap used for eval decontamination,
# but reported as a per-doc ratio instead of a doc-level flag).
#
# Scale shape: window hashing is the same map-only codegen pass as the
# span-dedup family (dedup.windowed_shingles); the reference hash set
# is one distinct-agg over the reference slice. Novelty is computed as
# the SEMI-JOIN COMPLEMENT — n_novel = n_windows − n_overlap, with
# n_overlap from an h-keyed LEFT SEMI join — rather than a left-anti
# join, for two scale reasons (the r8 verdict's spill item): (a) the
# join OUTPUT shrinks from ~every window (novel text barely overlaps
# the reference) to only the overlapping ones, so the downstream
# doc-keyed agg reads a sliver; (b) Spark's runtime row-level bloom
# filter (InjectRuntimeFilter) applies to the probe side of
# inner/semi joins but can never prune the stream side of an ANTI
# join (a "maybe-matches" filter would drop rows that belong in the
# output), so the semi formulation is the one the engine can
# bloom-reduce before the exchange at cluster scale. The join key
# stays the md5 hex STRING: a measured attempt to narrow it to a
# 60-bit BIGINT via conv(substring(h,1,15),16,10) cost MORE than the
# string shuffle it saved (~94 s vs ~35 s warm at 1M docs — conv's
# radix parse on 150M rows dwarfs the byte savings), so exactness and
# the cheaper expression win. Note an explicit pre-join
# ``repartition(n, h)`` can NOT widen this exchange:
# PushDownLeftSemiAntiJoin re-orders the semi join below the
# repartition, so wide runs size the exchange via
# spark.sql.shuffle.partitions / AQE instead (tools/measure_1m.py
# does). The corpus is never self-joined.
# ---------------------------------------------------------------------------

NOVELTY_K = 5
NOVELTY_REF_SOURCE = "src0"


def build_novelty_index(ref_docs: DataFrame,
                        k: int = NOVELTY_K) -> DataFrame:
    """Distinct k-token window hashes of the reference slice — the
    persistable index half (the ``build_dedup_index`` convention);
    the streaming probe reuses it across micro-batches."""
    from etl_validator_github_spark.scale.dedup import (
        _span_base,
        _span_windows,
    )

    return _span_windows(_span_base(ref_docs), k).select("h").distinct()


def novelty_scores(docs: DataFrame, ref_hashes: DataFrame,
                   k: int = NOVELTY_K) -> DataFrame:
    """Per-doc novelty vs a prebuilt reference hash set: (doc_id,
    n_windows, n_novel, novelty_milli); milli is NULL below k tokens
    (no windows → ratio undefined).

    ``n_novel = n_windows − n_overlap`` via a left-semi join on the
    window hash (see the scale-shape note above for why semi beats
    anti here)."""
    from etl_validator_github_spark.scale.dedup import (
        _span_base,
        _span_windows,
    )

    base = _span_base(docs)
    wins = _span_windows(base, k)
    overlap = (
        wins.join(ref_hashes, "h", "left_semi")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("int").alias("n_overlap"))
    )
    return (
        base.select(
            "doc_id",
            F.greatest(F.col("n_tokens") - F.lit(k - 1), F.lit(0))
            .cast("int").alias("n_windows"),
        )
        .join(overlap, "doc_id", "left")
        .select(
            "doc_id", "n_windows",
            (F.col("n_windows") - F.coalesce("n_overlap", F.lit(0)))
            .cast("int").alias("n_novel"),
            F.when(
                F.col("n_windows") > 0,
                F.expr("div(1000 * (n_windows - coalesce(n_overlap, 0)),"
                       " n_windows)"),
            ).cast("int").alias("novelty_milli"),
        )
    )


def ngram_novelty(docs: DataFrame, k: int = NOVELTY_K,
                  ref_source: str = NOVELTY_REF_SOURCE) -> DataFrame:
    """Per-doc novel-window counts vs the ``ref_source`` slice.

    Reference docs score 0 BY CONSTRUCTION (every one of their windows
    is in the index they define), so their windows never enter the
    probe shuffle at all: the ref slice becomes a map-only projection
    of literals and only non-ref docs flow through ``novelty_scores``.
    At a 1/3-corpus reference slice that removes a third of the
    exchange AND nearly all semi-join matches (novel text rarely
    overlaps), and the is_ref flag needs no join-back — the two
    branches just union. Composed from the index/probe halves above
    (which the streaming twin reuses). The split is null-safe: a doc
    with NULL source is scored as non-ref rather than vanishing from
    both branches (the oracle's LEFT JOIN keeps such docs too)."""
    is_ref = F.col("source").eqNullSafe(F.lit(ref_source))
    ref_docs = docs.filter(is_ref)
    ref_hashes = build_novelty_index(ref_docs, k)
    nonref_scored = novelty_scores(
        docs.filter(~is_ref), ref_hashes, k
    ).select(
        "doc_id", F.lit(0).alias("is_ref"),
        "n_windows", "n_novel", "novelty_milli",
    )
    n_win = F.greatest(
        F.size(F.split("text", " ")) - F.lit(k - 1), F.lit(0)
    ).cast("int")
    ref_rows = ref_docs.select(
        "doc_id", F.lit(1).alias("is_ref"),
        n_win.alias("n_windows"),
        F.lit(0).cast("int").alias("n_novel"),
        F.when(n_win > 0, F.lit(0)).cast("int").alias("novelty_milli"),
    )
    return nonref_scored.unionByName(ref_rows)


def _novelty_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ngram_novelty(load(spark, sf_dir, "documents"))


_NOVELTY_SQL = f"""
WITH tok AS (
  SELECT doc_id, source, string_split(text, ' ') AS t FROM documents
), base AS (
  SELECT doc_id, source, CAST(len(t) AS INT) AS n_tokens, t FROM tok
), w AS (
  SELECT doc_id,
         unnest(list_transform(
             range(1, greatest(n_tokens - {NOVELTY_K - 1}, 0) + 1),
             i -> md5(array_to_string(
                      list_slice(t, i, i + {NOVELTY_K - 1}), ' '))))
           AS h
  FROM base
), ref AS (
  SELECT DISTINCT w.h
  FROM w JOIN base USING (doc_id)
  WHERE base.source = '{NOVELTY_REF_SOURCE}'
), novel AS (
  SELECT doc_id, CAST(COUNT(*) AS INT) AS n_novel
  FROM w ANTI JOIN ref USING (h)
  GROUP BY 1
)
SELECT b.doc_id,
       CAST(b.source IS NOT DISTINCT FROM '{NOVELTY_REF_SOURCE}' AS INT)
         AS is_ref,
       CAST(greatest(b.n_tokens - {NOVELTY_K - 1}, 0) AS INT) AS n_windows,
       CAST(COALESCE(n.n_novel, 0) AS INT) AS n_novel,
       CAST(CASE WHEN greatest(b.n_tokens - {NOVELTY_K - 1}, 0) > 0
                 THEN (1000 * COALESCE(n.n_novel, 0))
                      // greatest(b.n_tokens - {NOVELTY_K - 1}, 0)
            END AS INT) AS novelty_milli
FROM base b LEFT JOIN novel n USING (doc_id)
"""


# ---------------------------------------------------------------------------
# Corpus vocabulary diversity per language: type-token ratio and hapax
# share — the lexical-richness readout that catches template-generated
# or looping text at corpus level (low TTR, thin hapax tail) where
# per-doc quality gates pass every row individually.
#
# Scale shape: explode → two-level hash-agg, both map-side-combining:
# (lang, token) counts first (the vocab table — far smaller than the
# token stream), then a per-lang rollup with a conditional count for
# hapaxes. No window, no sort, no join.
# ---------------------------------------------------------------------------


def vocab_stats(docs: DataFrame) -> DataFrame:
    tok = docs.select("lang", F.explode(tokens()).alias("token"))
    vocab = tok.groupBy("lang", "token").agg(
        F.count(F.lit(1)).alias("c")
    )
    return (
        vocab.groupBy("lang")
        .agg(
            F.sum("c").cast("long").alias("n_tokens"),
            F.count(F.lit(1)).cast("long").alias("n_types"),
            F.sum((F.col("c") == 1).cast("long")).cast("long")
            .alias("n_hapax"),
        )
        .select(
            "lang", "n_tokens", "n_types", "n_hapax",
            F.expr("cast((1000 * n_types) div n_tokens as int)")
            .alias("ttr_milli"),
            F.expr("cast((1000 * n_hapax) div n_types as int)")
            .alias("hapax_milli"),
        )
    )


def _vocab_stats_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return vocab_stats(load(spark, sf_dir, "documents"))


#: Keywords returned per document.
KEYWORDS_PER_DOC = 3


def doc_keywords(docs: DataFrame, k: int = KEYWORDS_PER_DOC) -> DataFrame:
    """Top-k TF-IDF keywords per document — the feature-extraction op
    a search indexer or topic labeler runs over every doc.

    Integer-exact variant: score = tf · (fl2(n_docs) − fl2(df)) with
    fl2 the floor-log2 ``length(bin(x)) − 1`` convention — the idf's
    shape without ln's cross-libm rounding. Ties break by term asc.

    Scale shape: one (doc, term) tf hash-agg (the postings table), a
    term-keyed df agg broadcast back, then a doc-partitioned top-k
    window (WindowGroupLimit — no full per-doc sorts)."""
    from pyspark.sql import Window

    tok = docs.select("doc_id", F.explode(tokens()).alias("term"))
    tf = tok.groupBy("doc_id", "term").agg(
        F.count(F.lit(1)).alias("tf")
    )
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(F.broadcast(df_), "term")
        .crossJoin(F.broadcast(n_docs))  # 1-row fold
        .select(
            "doc_id", "term",
            F.expr("tf * ((length(bin(n_docs)) - 1)"
                   " - (length(bin(df)) - 1))").cast("long")
            .alias("score"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.desc("score"), F.asc("term")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("int"))
        .filter(F.col("rnk") <= k)
        .select("doc_id", "rnk", "term", "score")
    )


def _keywords_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return doc_keywords(load(spark, sf_dir, "documents"))


_KEYWORDS_SQL = f"""
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
), tf AS (
  SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf FROM tok GROUP BY 1, 2
), df AS (
  SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY 1
), n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents),
scored AS (
  SELECT tf.doc_id, tf.term,
         CAST(tf.tf * ((length(bin(n.n_docs)) - 1)
                       - (length(bin(df.df)) - 1)) AS BIGINT) AS score
  FROM tf JOIN df USING (term) CROSS JOIN n
)
SELECT doc_id, CAST(rnk AS INT) AS rnk, term, score FROM (
  SELECT doc_id, term, score,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY score DESC, term ASC) AS rnk
  FROM scored)
WHERE rnk <= {KEYWORDS_PER_DOC}
"""


def vocab_coverage_curve(docs: DataFrame) -> DataFrame:
    """Cumulative token-mass coverage by rank-bucketed vocabulary — the
    tokenizer-sizing readout: what share of the corpus does a vocab of
    the top 2^b types cover? Types rank desc by (freq, token); buckets
    are floor-log2(rank) (the engine-exact ``length(bin(rank)) − 1``
    convention, see zipf_slope); coverage is a floored milli share of
    all tokens.

    Scale shape: (token) hash-agg → exact range-partitioned rank over
    the VOCAB table (functions/ranks.py — a real-corpus vocabulary can
    reach hundreds of millions of types, so even the type table never
    funnels through one sort task) → ~⌈log2 |vocab|⌉-row bucket rollup
    with a cumulative sum over that tiny axis."""
    from pyspark.sql import Window

    from etl_validator_github_spark.functions.ranks import (
        global_row_number,
    )

    vocab = docs.select(F.explode(tokens()).alias("token")) \
        .groupBy("token").agg(F.count(F.lit(1)).alias("c"))
    bucketed = (
        global_row_number(
            vocab, [F.desc("c"), F.asc("token")], rank_col="rnk",
        )
        .select(
            F.expr("cast(length(bin(rnk)) - 1 as int)").alias("bucket"),
            "c",
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_types"),
            F.sum("c").cast("long").alias("bucket_tokens"),
        )
    )
    w_cum = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    total = bucketed.agg(F.sum("bucket_tokens").alias("tot"))
    return (
        bucketed.crossJoin(F.broadcast(total))  # 1-row fold
        .select(
            "bucket", "n_types", "bucket_tokens",
            F.sum("bucket_tokens").over(w_cum).alias("cum_tokens"),
            "tot",
        )
        .select(
            "bucket", "n_types", "bucket_tokens",
            F.expr("cast((1000 * cum_tokens) div tot as int)")
            .alias("cum_coverage_milli"),
        )
    )


def _coverage_curve_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return vocab_coverage_curve(load(spark, sf_dir, "documents"))


_COVERAGE_CURVE_SQL = """
WITH vocab AS (
  SELECT unnest(string_split(text, ' ')) AS token FROM documents
), counted AS (
  SELECT token, CAST(COUNT(*) AS BIGINT) AS c FROM vocab GROUP BY 1
), ranked AS (
  SELECT c, ROW_NUMBER() OVER (ORDER BY c DESC, token ASC) AS rnk
  FROM counted
), bucketed AS (
  SELECT CAST(length(bin(rnk)) - 1 AS INT) AS bucket,
         CAST(COUNT(*) AS BIGINT) AS n_types,
         CAST(SUM(c) AS BIGINT) AS bucket_tokens
  FROM ranked GROUP BY 1
), tot AS (SELECT SUM(bucket_tokens) AS tot FROM bucketed)
SELECT bucket, n_types, bucket_tokens,
       CAST((1000 * SUM(bucket_tokens)
                    OVER (ORDER BY bucket ROWS UNBOUNDED PRECEDING))
            // (SELECT tot FROM tot) AS INT) AS cum_coverage_milli
FROM bucketed
"""


def zipf_slope(docs: DataFrame) -> DataFrame:
    """Per-language Zipf exponent estimate: OLS slope of floor-log2
    frequency against floor-log2 rank — natural text sits near −1;
    template/looping corpora flatten toward 0 and heavy boilerplate
    steepens past −1. Same exact-integer OLS identity as the trend
    query (slope = (nΣxy − ΣxΣy)/(nΣx² − (Σx)²) in milli via floor on
    the identical double quotient), with x = length(bin(rank)) − 1 and
    y = length(bin(freq)) − 1 — both exact in any engine.

    Scale shape: (lang, token) hash-agg → per-lang rank window over
    the VOCAB table (types, not tokens) → 5-integer-moment agg."""
    from pyspark.sql import Window

    vocab = docs.select("lang", F.explode(tokens()).alias("token")) \
        .groupBy("lang", "token").agg(F.count(F.lit(1)).alias("c"))
    w = Window.partitionBy("lang").orderBy(F.desc("c"), F.asc("token"))
    xy = vocab.select(
        "lang",
        (F.length(F.bin(F.row_number().over(w))) - 1).cast("long")
        .alias("x"),
        (F.length(F.bin("c")) - 1).cast("long").alias("y"),
    )
    agg = xy.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"), F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    return agg.select(
        "lang", F.col("n").cast("long").alias("n_types"),
        num.cast("long").alias("slope_num"),
        den.cast("long").alias("slope_den"),
        F.when(den != 0,
               F.floor(F.lit(1000.0) * num / den)).cast("long")
        .alias("zipf_slope_milli"),
    )


def _zipf_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return zipf_slope(load(spark, sf_dir, "documents"))


_ZIPF_SQL = """
WITH vocab AS (
  SELECT lang, token, CAST(COUNT(*) AS BIGINT) AS c
  FROM (SELECT lang, unnest(string_split(text, ' ')) AS token
        FROM documents) t
  GROUP BY 1, 2
), xy AS (
  SELECT lang,
         CAST(length(bin(row_number() OVER (
             PARTITION BY lang ORDER BY c DESC, token ASC))) - 1
           AS BIGINT) AS x,
         CAST(length(bin(c)) - 1 AS BIGINT) AS y
  FROM vocab
), agg AS (
  SELECT lang, COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
         SUM(x * y) AS sxy, SUM(x * x) AS sxx
  FROM xy GROUP BY 1
)
SELECT lang, CAST(n AS BIGINT) AS n_types,
       CAST(n * sxy - sx * sy AS BIGINT) AS slope_num,
       CAST(n * sxx - sx * sx AS BIGINT) AS slope_den,
       CAST(CASE WHEN n * sxx - sx * sx <> 0 THEN
            floor(1000.0 * (n * sxy - sx * sy)
                  / (n * sxx - sx * sx)) END AS BIGINT)
         AS zipf_slope_milli
FROM agg
"""


_VOCAB_STATS_SQL = """
WITH tok AS (
  SELECT lang, unnest(string_split(text, ' ')) AS token FROM documents
), vocab AS (
  SELECT lang, token, COUNT(*) AS c FROM tok GROUP BY 1, 2
)
SELECT lang,
       CAST(SUM(c) AS BIGINT) AS n_tokens,
       CAST(COUNT(*) AS BIGINT) AS n_types,
       CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax,
       CAST((1000 * COUNT(*)) // SUM(c) AS INT) AS ttr_milli,
       CAST((1000 * SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END)) // COUNT(*)
            AS INT) AS hapax_milli
FROM vocab GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Consecutive-token de-repetition: collapse immediate token stutter
# ("the the the") — the repairing counterpart to the Gopher repetition
# RATIOS (which only flag). Decode-generation artifacts and scraped
# markup produce exactly this shape.
#
# Scale shape: map-only, zero shuffles — one filter/transform pass per
# document. This is the acceptable-HOF case (cf. the windowed_shingles
# note): the lambda runs once per TOKEN with no window fan-out, i.e.
# the same O(n_tokens) the split itself costs, so the interpreted-
# lambda tax stays proportional to the scan. sequence(1, 0) DESCENDS
# in Spark, so empty docs take the explicit empty-array branch.
# ---------------------------------------------------------------------------

_DEREP_POSITIONS = (
    "CASE WHEN size(__toks) >= 1 THEN "
    "filter(sequence(1, size(__toks)), i -> i = 1 OR "
    "element_at(__toks, i) != element_at(__toks, i - 1)) "
    "ELSE cast(array() as array<int>) END"
)


def derepeat_docs(docs: DataFrame) -> DataFrame:
    """doc_id, n_tokens, n_after, n_removed, derep_hash (md5 of the
    collapsed text) — documents needing repair have n_removed > 0."""
    return (
        docs.select("doc_id", F.split("text", " ").alias("__toks"))
        .withColumn("__keep", F.expr(_DEREP_POSITIONS))
        .select(
            "doc_id",
            F.size("__toks").cast("int").alias("n_tokens"),
            F.size("__keep").cast("int").alias("n_after"),
            (F.size("__toks") - F.size("__keep")).cast("int")
            .alias("n_removed"),
            F.md5(F.expr(
                "concat_ws(' ', transform(__keep, "
                "i -> element_at(__toks, i)))"
            )).alias("derep_hash"),
        )
    )


def _derepeat_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return derepeat_docs(load(spark, sf_dir, "documents"))


_DEREPEAT_SQL = """
WITH tok AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
), keep AS (
  SELECT doc_id, t,
         list_filter(range(1, len(t) + 1),
                     i -> i = 1 OR t[i] <> t[i - 1]) AS k
  FROM tok
)
SELECT doc_id,
       CAST(len(t) AS INT) AS n_tokens,
       CAST(len(k) AS INT) AS n_after,
       CAST(len(t) - len(k) AS INT) AS n_removed,
       md5(array_to_string(list_transform(k, i -> t[i]), ' '))
         AS derep_hash
FROM keep
"""


# ---------------------------------------------------------------------------
# The curation pipeline CAPSTONE: quality gate → exact dedup → domain
# cap, composed end-to-end with per-document attrition labels — the
# "where did my corpus go" report every training-data run ships with.
# Stages are ORDERED (each sees the previous stage's survivors: the
# dedup keeper choice ignores quality-failed docs, the cap histogram
# counts only dedup survivors), which is exactly the composition the
# single-stage queries can't witness.
#
# Scale shape: the union of the stages' own shapes — one map-only
# quality projection, one content-hash agg + keeper join, one
# survivor-histogram cutoff with a broadcast cutoff table. Nothing
# quadratic, nothing driver-side.
# ---------------------------------------------------------------------------


def curation_pipeline(docs: DataFrame,
                      cap: int = DOMAIN_CAP) -> DataFrame:
    """(doc_id, source, stage): stage ∈ quality | duplicate |
    domain_cap | kept, applied in that order."""
    base = docs.select(
        "doc_id", "source", F.md5("text").alias("h"),
        quality_flag().alias("q_ok"),
    )
    s1 = base.filter(F.col("q_ok"))
    keepers = s1.groupBy("h").agg(F.min("doc_id").alias("keep_id"))
    s2 = (
        s1.join(keepers, "h")
        .filter(F.col("doc_id") == F.col("keep_id"))
        .select("doc_id", "source")
    )
    cap_flags = domain_cap_select(s2, cap).select("doc_id", "cap_keep")
    return (
        base.join(keepers, "h", "left")
        .join(cap_flags, "doc_id", "left")
        .select(
            "doc_id", "source",
            F.when(~F.col("q_ok"), F.lit("quality"))
            .when(F.col("doc_id") != F.col("keep_id"),
                  F.lit("duplicate"))
            .when(F.coalesce("cap_keep", F.lit(0)) == 0,
                  F.lit("domain_cap"))
            .otherwise(F.lit("kept")).alias("stage"),
        )
    )


def _curation_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Plant exact duplicates (the dedup-family with_copies convention,
    # source-preserving variant) so the 'duplicate' stage is
    # non-vacuous.
    from etl_validator_github_spark.scale.dedup import COPY_OFFSET

    docs = load(spark, sf_dir, "documents").select(
        "doc_id", "text", "source"
    )
    copies = docs.select(
        (F.col("doc_id") + F.lit(COPY_OFFSET)).alias("doc_id"),
        "text", "source",
    )
    return curation_pipeline(docs.unionAll(copies))


def _curation_sql() -> str:
    from etl_validator_github_spark.scale.dedup import COPY_OFFSET

    return f"""
WITH all_docs AS (
  SELECT doc_id, text, source FROM documents
  UNION ALL
  SELECT doc_id + {COPY_OFFSET}, text, source FROM documents
),
base AS (
  SELECT doc_id, source, md5(text) AS h,
         len(string_split(text, ' ')) BETWEEN 20 AND 1000
         AND len(list_filter(string_split(text, ' '),
                 t -> t IN ('the', 'a', 'of', 'and', 'in', 'to')))
             / CAST(len(string_split(text, ' ')) AS INT) < 0.5 AS q_ok
  FROM all_docs
), s1 AS (
  SELECT * FROM base WHERE q_ok
), keepers AS (
  SELECT h, MIN(doc_id) AS keep_id FROM s1 GROUP BY 1
), s2 AS (
  SELECT s1.doc_id, s1.source
  FROM s1 JOIN keepers k ON s1.h = k.h AND s1.doc_id = k.keep_id
), scored AS (
  SELECT doc_id, source,
         CAST((CAST(concat('0x', substring(md5(CAST(doc_id AS VARCHAR)),
                                           1, 8)) AS BIGINT)
               % {DOMAIN_CAP_MOD})
              // {DOMAIN_CAP_MOD // DOMAIN_CAP_BUCKETS} AS INT)
           AS cap_bucket
  FROM s2
), hist AS (
  SELECT source, cap_bucket, COUNT(*) AS n FROM scored GROUP BY 1, 2
), cum AS (
  SELECT source, cap_bucket,
         SUM(n) OVER (PARTITION BY source ORDER BY cap_bucket ASC
                      ROWS UNBOUNDED PRECEDING) AS cum
  FROM hist
), cutoffs AS (
  SELECT source, MAX(cap_bucket) AS cutoff
  FROM cum WHERE cum <= {DOMAIN_CAP} GROUP BY 1
), cap_flags AS (
  SELECT s.doc_id,
         CAST(coalesce(s.cap_bucket <= c.cutoff, FALSE) AS INT)
           AS cap_keep
  FROM scored s LEFT JOIN cutoffs c USING (source)
)
SELECT b.doc_id, b.source,
       CASE WHEN NOT b.q_ok THEN 'quality'
            WHEN b.doc_id <> k.keep_id THEN 'duplicate'
            WHEN coalesce(cf.cap_keep, 0) = 0 THEN 'domain_cap'
            ELSE 'kept' END AS stage
FROM base b
LEFT JOIN keepers k USING (h)
LEFT JOIN cap_flags cf USING (doc_id)
"""


# ---------------------------------------------------------------------------
# PMI collocation mining (Church & Hanks 1990) over DOCUMENT
# co-occurrence: which top-vocabulary word pairs appear in the same
# document far more often than independence predicts — the association
# score behind phrase induction and topic seeding. PMI is log-shaped,
# so it uses the catalog's exact floor-log2 convention per term:
# pmi_bits = fl2(n_ab) + fl2(N) − fl2(n_a) − fl2(n_b).
#
# Scale shape: pair fan-out is capped by the top-V vocabulary (V=40 →
# ≤ C(40,2) distinct pairs), generated map-side from each doc's sorted
# filtered token set (the basket-pairs comprehension — no self-join of
# the token stream; the ORACLE is the classic relational self-join, so
# the hash match is a cross-formulation equivalence proof). One corpus
# explode behind a lazy checkpoint feeds both the df census and the
# pair pass.
# ---------------------------------------------------------------------------

PMI_VOCAB_K = 40

_PMI_PAIRS_EXPR = """
flatten(transform(ws, (x, i) ->
  transform(slice(ws, i + 2, size(ws)), y ->
    struct(x AS p1, y AS p2))))
"""


def word_pmi(docs: DataFrame, k: int = PMI_VOCAB_K) -> DataFrame:
    toks = (
        docs.select("doc_id", F.explode(F.array_distinct(tokens()))
                    .alias("w"))
        .localCheckpoint(eager=False)  # df census + pair pass share it
    )
    dfc = toks.groupBy("w").agg(F.count(F.lit(1)).alias("n_w"))
    top = (
        dfc.orderBy(F.desc("n_w"), F.asc("w")).limit(k)
        .localCheckpoint(eager=False)  # filter + two count joins
    )
    n_docs = docs.groupBy().agg(F.count(F.lit(1)).alias("n_docs"))
    per_doc = (
        toks.join(F.broadcast(top.select("w")), "w")
        .groupBy("doc_id")
        .agg(F.sort_array(F.collect_set("w")).alias("ws"))
    )
    pairs = (
        per_doc.select(F.explode(F.expr(_PMI_PAIRS_EXPR)).alias("pr"))
        .groupBy(F.col("pr.p1").alias("w1"), F.col("pr.p2").alias("w2"))
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .filter(F.col("n_ab") >= 2)
    )

    def fl2(col: Column) -> Column:
        return F.length(F.bin(col)) - F.lit(1)

    na = F.broadcast(top.select(F.col("w").alias("w1"),
                                F.col("n_w").alias("n_a")))
    nb = F.broadcast(top.select(F.col("w").alias("w2"),
                                F.col("n_w").alias("n_b")))
    return (
        pairs.join(na, "w1").join(nb, "w2")
        .crossJoin(F.broadcast(n_docs))  # documented 1-row BNLJ fold
        .select(
            "w1", "w2",
            F.col("n_ab").cast("long").alias("n_ab"),
            F.col("n_a").cast("long").alias("n_a"),
            F.col("n_b").cast("long").alias("n_b"),
            (fl2(F.col("n_ab")) + fl2(F.col("n_docs"))
             - fl2(F.col("n_a")) - fl2(F.col("n_b")))
            .cast("int").alias("pmi_bits"),
        )
    )


def _word_pmi_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return word_pmi(load(spark, sf_dir, "documents"))


_WORD_PMI_SQL = f"""
WITH toks AS (
  SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS w
  FROM documents
), dfc AS (
  SELECT w, COUNT(*) AS n_w FROM toks GROUP BY 1
), top AS (
  SELECT w, n_w FROM dfc ORDER BY n_w DESC, w LIMIT {PMI_VOCAB_K}
), nd AS (SELECT COUNT(*) AS n_docs FROM documents),
f AS (SELECT t.doc_id, t.w FROM toks t JOIN top USING (w)),
pairs AS (
  SELECT a.w AS w1, b.w AS w2, COUNT(*) AS n_ab
  FROM f a JOIN f b ON a.doc_id = b.doc_id AND a.w < b.w
  GROUP BY 1, 2
  HAVING COUNT(*) >= 2
)
SELECT w1, w2,
       CAST(n_ab AS BIGINT) AS n_ab,
       CAST(ta.n_w AS BIGINT) AS n_a,
       CAST(tb.n_w AS BIGINT) AS n_b,
       CAST((length(bin(n_ab)) - 1) + (length(bin(nd.n_docs)) - 1)
            - (length(bin(ta.n_w)) - 1) - (length(bin(tb.n_w)) - 1)
            AS INT) AS pmi_bits
FROM pairs
JOIN top ta ON pairs.w1 = ta.w
JOIN top tb ON pairs.w2 = tb.w
CROSS JOIN nd
"""


# ---------------------------------------------------------------------------
# Duplication-rate calibration against document length: exact-dup rate
# per floor-log2(n_chars) bucket — the audit that tells you whether
# your dedup pressure concentrates in short boilerplate or long
# templates (and whether a length-gated quality filter would change
# the dedup bill). One md5 hash-agg for cluster sizes, joined back on
# the hash key (co-partitioned with the agg at scale), then a
# bucket-level rollup bounded by ~64 rows.
# ---------------------------------------------------------------------------


def dup_rate_by_length(docs: DataFrame) -> DataFrame:
    d = docs.select(
        "doc_id", F.md5("text").alias("h"),
        F.expr("cast(length(bin(n_chars + 1)) - 1 as int)")
        .alias("len_bucket"),
    )
    sizes = d.groupBy("h").agg(F.count(F.lit(1)).alias("csz"))
    return (
        d.join(sizes, "h")
        .groupBy("len_bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum((F.col("csz") > 1).cast("long")).cast("long")
            .alias("n_dup_docs"),
        )
        .withColumn(
            "dup_micro",
            F.expr("cast((1000000 * n_dup_docs) div n_docs as bigint)"),
        )
    )


def _dup_by_length_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dup_rate_by_length(load(spark, sf_dir, "documents"))


_DUP_BY_LENGTH_SQL = """
WITH d AS (
  SELECT doc_id, md5(text) AS h,
         CAST(length(bin(n_chars + 1)) - 1 AS INT) AS len_bucket
  FROM documents
), sz AS (SELECT h, COUNT(*) AS csz FROM d GROUP BY 1)
SELECT len_bucket,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN csz > 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_dup_docs,
       CAST((1000000 * SUM(CASE WHEN csz > 1 THEN 1 ELSE 0 END))
            // COUNT(*) AS BIGINT) AS dup_micro
FROM d JOIN sz USING (h)
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Learned quality filter (the CCNet/GPT-3-style classifier stage): a
# Bernoulli-NB-inspired token-weight model TRAINED IN-DATA on teacher
# labels (the shared `quality_flag` heuristic) over the doc_id%10<3
# split, then scored corpus-wide. Exact-integer end to end: per-token
# weight = ⌊10⁶·(c_pos+1)/(c_pos+c_neg+2)⌋ (Laplace-smoothed positive
# rate, floored BIGINT division — no log, no floats), per-doc score =
# the floored mean weight of its in-vocabulary tokens, decision =
# score ≥ the floored train prior. Scale shape: training is ONE
# hash-agg over the 30% train slice; the pruned vocabulary (occurrence
# count ≥ VOCAB_MIN) is vocabulary-bounded and BROADCAST, so scoring
# is explode → broadcast hash join → doc-grain partial agg — no
# corpus-vs-corpus shuffle anywhere. On this synthetic word-soup
# corpus the model demonstrates the mechanism (as LANG_MARKERS notes),
# with label correlation carried by doc length via token multiplicity.
# Public method: Joulin 2016 (fastText) / Wenzek 2019 (CCNet) reduced
# to exact-integer NB token voting.
# ---------------------------------------------------------------------------

CLASSIFIER_TRAIN_MOD = 10
CLASSIFIER_TRAIN_LT = 3
CLASSIFIER_VOCAB_MIN = 5


def labeled_docs(docs: DataFrame) -> DataFrame:
    """docs + teacher label — the label IS the shared ``quality_flag``
    gate (reused, not re-stated, so the classifier's teacher can never
    drift from the corpus_clean / streaming-ingest gate)."""
    return docs.select(
        "doc_id", "lang", tokens().alias("__toks"),
        quality_flag().cast("int").alias("label"),
    )


def doc_token_counts(lab: DataFrame) -> DataFrame:
    """(doc_id, label, token, tf) — the classifier's per-doc sufficient
    statistics. A doc's rows are a pure function of its own text, so a
    streaming ingest can APPEND them per micro-batch and the learned
    weights never rewrite earlier docs (the ``doc_postings`` contract;
    see streaming/corpus.py::stream_classifier_counts)."""
    return (
        lab.select("doc_id", "label", F.explode("__toks").alias("token"))
        .groupBy("doc_id", "label", "token")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )


def token_class_counts(lab: DataFrame) -> DataFrame:
    """(token, c_pos, c_neg) occurrence counts DIRECTLY at token grain:
    map-side partial combine keeps the exchange vocabulary-bounded —
    routing through ``doc_token_counts`` would shuffle at the ~64M-group
    (doc, token) grain instead, the BM25-build cost class. The streaming
    path pays that grain on purpose, per small micro-batch, to buy
    append-only incrementality; equality of the two folds is pinned in
    tests/test_streaming_corpus.py."""
    occ = lab.select("label", F.explode("__toks").alias("token"))
    return occ.groupBy("token").agg(
        F.sum("label").cast("long").alias("c_pos"),
        F.sum(F.lit(1) - F.col("label")).cast("long").alias("c_neg"),
    )


def _weights_from_token_counts(tok: DataFrame) -> DataFrame:
    """The shared prune + Laplace-weight tail over (token, c_pos,
    c_neg) — ONE place for the smoothing and VOCAB_MIN rules, whichever
    grain the counts arrived at (batch token-grain agg or the streaming
    doc-grain log)."""
    return tok.filter(
        F.col("c_pos") + F.col("c_neg") >= CLASSIFIER_VOCAB_MIN
    ).select(
        "token",
        F.expr("(1000000 * (c_pos + 1)) div (c_pos + c_neg + 2)")
        .alias("w_micro"),
    )


def classifier_prior_from_token_counts(tok: DataFrame) -> DataFrame:
    """The occurrence-level base rate (the decision threshold) from the
    UNPRUNED token counts — 1 row, prior_micro. Derived from the same
    hash-agg output the weights use, so the trainer never re-scans the
    corpus slice for it."""
    return tok.agg(
        F.expr("(1000000 * sum(c_pos)) div sum(c_pos + c_neg)")
        .cast("long").alias("prior_micro")
    )


def quality_classifier_weights(lab: DataFrame) -> DataFrame:
    """(token, w_micro) learned from the labeled train slice: one
    explode + token-grain hash-agg + the shared weight tail."""
    return _weights_from_token_counts(token_class_counts(lab))


def classifier_weights_from_counts(counts: DataFrame) -> DataFrame:
    """Fold (doc_id, label, token, tf) sufficient statistics into the
    pruned (token, w_micro) weight table — Σtf·label ≡ the occurrence
    counts the batch trainer aggregates directly."""
    tok = counts.groupBy("token").agg(
        F.sum(F.col("tf") * F.col("label")).cast("long").alias("c_pos"),
        F.sum(F.col("tf") * (F.lit(1) - F.col("label"))).cast("long")
        .alias("c_neg"),
    )
    return _weights_from_token_counts(tok)


def classifier_prior_from_counts(counts: DataFrame) -> DataFrame:
    """The occurrence-level base rate from the doc-grain sufficient
    statistics (the streaming-log path) — 1 row, prior_micro."""
    return counts.agg(
        F.expr("(1000000 * sum(tf * label)) div sum(tf)")
        .cast("long").alias("prior_micro")
    )


def quality_classifier_score(lab: DataFrame, weights: DataFrame,
                             prior: DataFrame) -> DataFrame:
    """Per-doc classifier scores for every labeled doc: explode →
    broadcast vocab join → doc-grain floored mean. Zero-hit docs fall
    back to the prior, so under the score ≥ prior decision rule they
    predict 1 — the majority class exactly when the prior ≥ ½ (as on
    this corpus); a negative-majority caller should route zero-evidence
    docs separately rather than trust the fallback."""
    hits = (
        lab.select("doc_id", F.explode("__toks").alias("token"))
        .join(F.broadcast(weights), "token")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_hits"),
            F.sum("w_micro").cast("long").alias("sum_w"),
        )
    )
    return (
        lab.select("doc_id", "lang", "label")
        .join(hits, "doc_id", "left")
        .crossJoin(F.broadcast(prior))
        .select(
            "doc_id", "lang", "label",
            F.coalesce("n_hits", F.lit(0)).cast("long").alias("n_hits"),
            F.coalesce(
                F.expr("sum_w div n_hits"), F.col("prior_micro")
            ).cast("long").alias("score_micro"),
            "prior_micro",
        )
    )


def _train_and_score(docs: DataFrame) -> DataFrame:
    """Shared train-on-split + score-corpus-wide prelude. The train
    slice is exploded ONCE: the vocabulary-bounded token-count table is
    pinned with the repo's lazy localCheckpoint barrier and both the
    weight table and the occurrence prior fold from it (the decision
    threshold is the OCCURRENCE-level base rate, not the doc-level
    prior: per-doc scores are means of per-occurrence weights, and the
    two priors differ whenever the label correlates with doc length,
    which the length-band teacher label guarantees)."""
    lab = labeled_docs(docs)
    train = lab.filter(
        F.col("doc_id") % CLASSIFIER_TRAIN_MOD < CLASSIFIER_TRAIN_LT
    )
    tok = token_class_counts(train).localCheckpoint(eager=False)
    return quality_classifier_score(
        lab,
        _weights_from_token_counts(tok),
        classifier_prior_from_token_counts(tok),
    )


def classifier_confusion_rollup(scored: DataFrame) -> DataFrame:
    """Confusion rollup over an already-scored frame (lang × teacher
    label × predicted) — shared by the catalog query and the CLI so a
    caller that wants several rollups scores the corpus once."""
    return (
        scored.select(
            "lang", "label",
            (F.col("score_micro") >= F.col("prior_micro"))
            .cast("int").alias("predicted"),
            "n_hits", "score_micro",
        )
        .groupBy("lang", "label", "predicted")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum((F.col("n_hits") > 0).cast("int")).cast("long")
            .alias("n_scored"),
            F.expr("sum(score_micro) div count(1)").cast("long")
            .alias("avg_score_micro"),
        )
    )


def classifier_calibration_rollup(scored: DataFrame) -> DataFrame:
    """Calibration rollup over an already-scored frame: score-percent
    buckets vs observed teacher-label rate (≤101 rows at any scale)."""
    return (
        scored.select(
            F.expr("score_micro div 10000").cast("int").alias("bucket"),
            "label",
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("label").cast("long").alias("n_pos"),
        )
        .select(
            "bucket", "n_docs", "n_pos",
            F.expr("(1000000 * n_pos) div n_docs").alias("pos_rate_micro"),
        )
    )


def quality_classifier_report(docs: DataFrame) -> DataFrame:
    """Train-on-split + score-corpus-wide + confusion rollup over a raw
    documents frame (the composable form measure_1m times at 1M)."""
    return classifier_confusion_rollup(_train_and_score(docs))


def _classifier_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return quality_classifier_report(load(spark, sf_dir, "documents"))


def classifier_calibration(docs: DataFrame) -> DataFrame:
    """Calibration curve for the learned quality filter: score-percent
    buckets (⌊score_micro/10⁴⌋, ≤101 rows at any scale) vs the observed
    teacher-label rate — a well-calibrated filter shows pos_rate_micro
    tracking its bucket; the standard pre-deployment readout before
    trusting the classifier's threshold on new data."""
    return classifier_calibration_rollup(_train_and_score(docs))


def _calibration_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return classifier_calibration(load(spark, sf_dir, "documents"))


#: Shared CTE prefix (teacher labels → train split → prior → weights →
#: per-doc scores) for the classifier query and its calibration curve.
_CLASSIFIER_SCORED_CTES = f"""
WITH lab AS (
  SELECT doc_id, lang, string_split(text, ' ') AS toks,
         CAST(len(string_split(text, ' ')) BETWEEN 20 AND 1000
              AND {_sql_count_in(_STOPWORDS).replace('toks', "string_split(text, ' ')")}
                  / len(string_split(text, ' ')) < 0.5 AS INT) AS label
  FROM documents
), train AS (
  SELECT * FROM lab
  WHERE doc_id % {CLASSIFIER_TRAIN_MOD} < {CLASSIFIER_TRAIN_LT}
), prior AS (
  SELECT (1000000 * CAST(SUM(label) AS BIGINT)) // COUNT(*) AS prior_micro
  FROM (SELECT label, unnest(toks) AS t FROM train)
), counts AS (
  SELECT token,
         CAST(SUM(label) AS BIGINT) AS c_pos,
         CAST(SUM(1 - label) AS BIGINT) AS c_neg
  FROM (SELECT label, unnest(toks) AS token FROM train)
  GROUP BY 1
), weights AS (
  SELECT token, (1000000 * (c_pos + 1)) // (c_pos + c_neg + 2) AS w_micro
  FROM counts WHERE c_pos + c_neg >= {CLASSIFIER_VOCAB_MIN}
), hits AS (
  SELECT doc_id,
         CAST(COUNT(*) AS BIGINT) AS n_hits,
         CAST(SUM(w_micro) AS BIGINT) AS sum_w
  FROM (SELECT doc_id, unnest(toks) AS token FROM lab)
  JOIN weights USING (token)
  GROUP BY 1
), scored AS (
  SELECT lang, label,
         COALESCE(h.n_hits, 0) AS n_hits,
         COALESCE(h.sum_w // h.n_hits, p.prior_micro) AS score_micro,
         p.prior_micro
  FROM lab LEFT JOIN hits h USING (doc_id) CROSS JOIN prior p
)"""

_CLASSIFIER_SQL = _CLASSIFIER_SCORED_CTES + """
SELECT lang, label,
       CAST(score_micro >= prior_micro AS INT) AS predicted,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN n_hits > 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_scored,
       CAST(SUM(score_micro) // COUNT(*) AS BIGINT) AS avg_score_micro
FROM scored
GROUP BY 1, 2, 3
"""

_CALIBRATION_SQL = _CLASSIFIER_SCORED_CTES + """
SELECT CAST(score_micro // 10000 AS INT) AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(label) AS BIGINT) AS n_pos,
       CAST((1000000 * SUM(label)) // COUNT(*) AS BIGINT) AS pos_rate_micro
FROM scored
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Code-vs-prose detector — the pretraining-mix signal that routes a
# document to the code pipeline (different dedup, different quality
# gates) instead of the prose one. Pure character arithmetic via
# translate-removal counts: exact integers, map-only, no regex engine
# in the loop (RE2-vs-Java dialect risk avoided entirely). The fixture
# corpus is punctuation-free word soup, so the catalog query seeds
# deterministic code-snippet suffixes (the with_copies discipline) to
# keep the detector non-vacuous.
# ---------------------------------------------------------------------------

#: Characters whose density marks code-like text.
CODE_CHARS = "{};=()<>[]"
CODE_MICRO_THRESHOLD = 5000
_CODE_SNIPPET = " if (x == 1) { return y[0]; } count = 42;"
_CODE_SEED_MOD = 20


def with_code_suffix(docs: DataFrame) -> DataFrame:
    """documents with a deterministic code snippet appended to every
    ``doc_id % 20 == 0`` row — the seeded witness for code detection
    (string concat of a literal: bit-identical cross-engine)."""
    return docs.withColumn(
        "text",
        F.when(F.col("doc_id") % _CODE_SEED_MOD == 0,
               F.concat(F.col("text"), F.lit(_CODE_SNIPPET)))
        .otherwise(F.col("text")),
    )


def code_detect(docs: DataFrame) -> DataFrame:
    """(doc_id, n_code_chars, n_digits, code_micro, is_codey): density
    of code-marker characters + digits per document, in micro-units of
    the total character count."""
    n_code = (F.length("text")
              - F.length(F.expr(f"translate(text, '{CODE_CHARS}', '')")))
    n_digit = (F.length("text")
               - F.length(F.expr("translate(text, '0123456789', '')")))
    return (
        docs.select(
            "doc_id",
            n_code.cast("long").alias("n_code_chars"),
            n_digit.cast("long").alias("n_digits"),
            F.greatest(F.length("text"), F.lit(1)).cast("long")
            .alias("__len"),
        )
        .withColumn(
            "code_micro",
            F.expr("cast((1000000 * (n_code_chars + n_digits))"
                   " div __len as bigint)"),
        )
        .withColumn(
            "is_codey",
            (F.col("code_micro") >= CODE_MICRO_THRESHOLD).cast("int"),
        )
        .drop("__len")
    )


def _code_detect_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return code_detect(with_code_suffix(load(spark, sf_dir, "documents")))


_CODE_DETECT_SQL = f"""
WITH aug AS (
  SELECT doc_id,
         CASE WHEN doc_id % {_CODE_SEED_MOD} = 0
              THEN text || '{_CODE_SNIPPET}' ELSE text END AS text
  FROM documents
), counted AS (
  SELECT doc_id,
         CAST(length(text) - length(translate(text, '{CODE_CHARS}', ''))
              AS BIGINT) AS n_code_chars,
         CAST(length(text) - length(translate(text, '0123456789', ''))
              AS BIGINT) AS n_digits,
         CAST(greatest(length(text), 1) AS BIGINT) AS len_total
  FROM aug
)
SELECT doc_id, n_code_chars, n_digits,
       CAST((1000000 * (n_code_chars + n_digits)) // len_total
            AS BIGINT) AS code_micro,
       CAST((1000000 * (n_code_chars + n_digits)) // len_total
            >= {CODE_MICRO_THRESHOLD} AS INT) AS is_codey
FROM counted
"""


def readability_ari(docs: DataFrame) -> DataFrame:
    """Automated Readability Index per document (Senter & Smith 1967):
    4.71·(chars/words) + 0.5·(words/sentences) − 21.43, with exact
    integer counts (chars = non-space characters, sentences = 1 +
    terminal-punctuation count via translate-removal) and the identical
    double expression shape on both engines; reported in centi-units."""
    words = F.size(F.split("text", " "))
    sents = (F.lit(1) + F.length("text")
             - F.length(F.expr("translate(text, '.!?', '')")))
    chars = F.length(F.expr("replace(text, ' ', '')"))
    return (
        docs.select(
            "doc_id",
            words.cast("long").alias("n_words"),
            sents.cast("long").alias("n_sents"),
            chars.cast("long").alias("n_letter_chars"),
        )
        .withColumn(
            "ari_centi",
            F.expr(
                "cast(round((4.71 * (cast(n_letter_chars as double)"
                " / n_words) + 0.5 * (cast(n_words as double)"
                " / n_sents) - 21.43) * 100) as bigint)"
            ),
        )
        .withColumn(
            "band",
            F.expr("CASE WHEN ari_centi < 500 THEN 'elementary'"
                   " WHEN ari_centi < 1000 THEN 'middle'"
                   " WHEN ari_centi < 1400 THEN 'high'"
                   " ELSE 'college' END"),
        )
    )


def _readability_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return readability_ari(load(spark, sf_dir, "documents"))


_READABILITY_SQL = """
WITH counted AS (
  SELECT doc_id,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
         CAST(1 + length(text) - length(translate(text, '.!?', ''))
              AS BIGINT) AS n_sents,
         CAST(length(replace(text, ' ', '')) AS BIGINT)
           AS n_letter_chars
  FROM documents
), scored AS (
  SELECT *,
         CAST(round((4.71 * (CAST(n_letter_chars AS DOUBLE) / n_words)
                     + 0.5 * (CAST(n_words AS DOUBLE) / n_sents)
                     - 21.43) * 100) AS BIGINT) AS ari_centi
  FROM counted
)
SELECT doc_id, n_words, n_sents, n_letter_chars, ari_centi,
       CASE WHEN ari_centi < 500 THEN 'elementary'
            WHEN ari_centi < 1000 THEN 'middle'
            WHEN ari_centi < 1400 THEN 'high'
            ELSE 'college' END AS band
FROM scored
"""


# ---------------------------------------------------------------------------
# Eval-set 13-gram contamination audit (Brown 2020 §4, the GPT-3
# train-test-overlap methodology): for every EVAL-split document, how
# many of its 13-token windows appear anywhere in the TRAIN split. The
# n-gram complement to the exact-hash (docs_split_leakage) and
# embedding-space (embed_split_leakage) audits — catches partial/
# quoted contamination neither of those sees. Composed from the
# novelty halves: the train index is ONE distinct-hash set, the eval
# probe a left-semi join — the corpus is never self-joined, and at
# 100 TB the semi probe side is runtime-bloom-prunable.
# ---------------------------------------------------------------------------

CONTAM_K = 13       # the Brown 2020 overlap window
CONTAM_EVAL_MOD = 7  # eval = doc_id % 7 == 0 (coprime to the copy offset)


def contamination_audit(docs: DataFrame, k: int = CONTAM_K,
                        eval_mod: int = CONTAM_EVAL_MOD) -> DataFrame:
    """(doc_id, n_windows, n_contaminated, contamination_milli) for
    every eval-split document."""
    ev = docs.filter(F.col("doc_id") % eval_mod == 0)
    tr = docs.filter(F.col("doc_id") % eval_mod != 0)
    scored = novelty_scores(ev, build_novelty_index(tr, k), k)
    return scored.select(
        "doc_id", "n_windows",
        (F.col("n_windows") - F.col("n_novel")).cast("int")
        .alias("n_contaminated"),
        F.expr("CASE WHEN n_windows > 0 THEN "
               "cast((1000 * (n_windows - n_novel)) div n_windows as int)"
               " END").alias("contamination_milli"),
    )


def _contamination_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_validator_github_spark.scale.dedup import COPY_OFFSET

    # Copies of every 5th doc only (offset ≡ 1 mod 7, so a copied eval
    # doc's twin lands in train): ~1/5 of eval docs are deterministic
    # full-contamination witnesses and the rest stay clean — the
    # discriminating fixture a saturating full-copy corpus isn't.
    docs = load(spark, sf_dir, "documents")
    aug = docs.select("doc_id", "text").unionAll(
        docs.filter(F.col("doc_id") % 5 == 0).select(
            (F.col("doc_id") + COPY_OFFSET).alias("doc_id"), "text")
    )
    return contamination_audit(aug)


def _contamination_sql() -> str:
    from etl_validator_github_spark.scale.dedup import COPY_OFFSET

    return f"""
WITH all_docs AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + {COPY_OFFSET}, text FROM documents
  WHERE doc_id % 5 = 0
),
tok AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM all_docs
), base AS (
  SELECT doc_id, CAST(len(t) AS INT) AS n_tokens, t FROM tok
), w AS (
  SELECT doc_id,
         unnest(list_transform(
             range(1, greatest(n_tokens - {CONTAM_K - 1}, 0) + 1),
             i -> md5(array_to_string(
                      list_slice(t, i, i + {CONTAM_K - 1}), ' '))))
           AS h
  FROM base
), ref AS (
  SELECT DISTINCT h FROM w WHERE doc_id % {CONTAM_EVAL_MOD} <> 0
), cont AS (
  SELECT doc_id, CAST(COUNT(*) AS INT) AS n_cont
  FROM (SELECT * FROM w WHERE doc_id % {CONTAM_EVAL_MOD} = 0) ew
  SEMI JOIN ref USING (h)
  GROUP BY 1
)
SELECT b.doc_id,
       CAST(greatest(b.n_tokens - {CONTAM_K - 1}, 0) AS INT) AS n_windows,
       CAST(COALESCE(c.n_cont, 0) AS INT) AS n_contaminated,
       CASE WHEN greatest(b.n_tokens - {CONTAM_K - 1}, 0) > 0 THEN
         CAST((1000 * COALESCE(c.n_cont, 0))
              // greatest(b.n_tokens - {CONTAM_K - 1}, 0) AS INT)
       END AS contamination_milli
FROM base b LEFT JOIN cont c USING (doc_id)
WHERE b.doc_id % {CONTAM_EVAL_MOD} = 0
"""


# ---------------------------------------------------------------------------
# Winnowing document fingerprints (Schleimer, Wilkerson & Aiken 2003 —
# the MOSS local fingerprinting scheme): k-token shingle hashes, then
# the minimum hash of every w-hash window. Guarantees any shared run of
# ≥ w+k−1 tokens yields at least one shared fingerprint, with a bounded
# fingerprint density — the local-dedup complement to global MinHash.
# Scale shape: shingle explode (codegen, the windowed_shingles path) +
# a per-doc window min (partition bounded by document length) + one
# doc-grain hash-agg; the corpus is never self-joined.
# ---------------------------------------------------------------------------

WINNOW_K = 3   # tokens per shingle (the dedup-family shingle width)
WINNOW_W = 4   # hashes per winnowing window


def winnow_fingerprints(docs: DataFrame) -> DataFrame:
    """(doc_id, n_windows, n_fingerprints, fp_sum): per-doc winnowing
    fingerprint census — distinct window-min shingle hashes plus their
    exact integer checksum (hashes reduced mod 2³¹−1, so the distinct
    sum stays far from BIGINT overflow)."""
    from pyspark.sql import Window

    from etl_validator_github_spark.scale.dedup import (
        MINHASH_P,
        windowed_shingles,
    )

    toked = docs.select("doc_id", F.split("text", " ").alias("__toks"))
    hashed = windowed_shingles(toked, WINNOW_K).withColumn(
        "h",
        F.expr(f"cast(conv(substring(md5(shingle), 1, 15), 16, 10)"
               f" as bigint) % {MINHASH_P}L"),
    )
    w = (Window.partitionBy("doc_id").orderBy("pos")
         .rowsBetween(-(WINNOW_W - 1), 0))
    fps = (
        hashed.withColumn("fp", F.min("h").over(w))
        .filter(F.col("pos") >= WINNOW_W)
    )
    return fps.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_windows"),
        F.countDistinct("fp").cast("long").alias("n_fingerprints"),
        F.sum_distinct(F.col("fp")).cast("long").alias("fp_sum"),
    )


def _winnow_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return winnow_fingerprints(load(spark, sf_dir, "documents"))


def _winnow_sql() -> str:
    from etl_validator_github_spark.scale.dedup import MINHASH_P

    return f"""
WITH tok AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
), pos AS (
  SELECT doc_id, unnest(range(1, len(toks) - {WINNOW_K - 2})) AS pos, toks
  FROM tok WHERE len(toks) >= {WINNOW_K}
), hashed AS (
  SELECT doc_id, pos,
         CAST(concat('0x', substring(md5(
           array_to_string(list_slice(toks, pos, pos + {WINNOW_K - 1}), ' ')
         ), 1, 15)) AS BIGINT) % {MINHASH_P} AS h
  FROM pos
), fps AS (
  SELECT doc_id, pos,
         MIN(h) OVER (PARTITION BY doc_id ORDER BY pos
                      ROWS BETWEEN {WINNOW_W - 1} PRECEDING
                      AND CURRENT ROW) AS fp
  FROM hashed
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_windows,
       CAST(COUNT(DISTINCT fp) AS BIGINT) AS n_fingerprints,
       CAST(SUM(DISTINCT fp) AS BIGINT) AS fp_sum
FROM fps WHERE pos >= {WINNOW_W}
GROUP BY 1
"""


TEXT_EXTRA_QUERIES: dict[str, Query] = {
    q.name: q
    for q in [
        Query("text_quality_classifier", _classifier_q, _CLASSIFIER_SQL,
              "Learned quality filter: NB-inspired token weights "
              "trained on the doc_id%10<3 split with heuristic teacher "
              "labels, scored corpus-wide via a broadcast vocab join — "
              "exact-integer weights, no floats."),
        Query("text_classifier_calibration", _calibration_q,
              _CALIBRATION_SQL,
              "Calibration curve of the learned filter: score-percent "
              "buckets vs observed teacher-label rate — one extra "
              "hash-agg over the shared scored frame, ≤101 rows."),
        Query("corpus_curation_pipeline", _curation_q, _curation_sql(),
              "End-to-end curation capstone: quality gate → exact "
              "dedup → per-domain cap, composed in order with per-doc "
              "attrition labels — each stage runs on the previous "
              "stage's survivors."),
        Query("text_derepeat", _derepeat_q, _DEREPEAT_SQL,
              "Consecutive-token de-repetition (the repair op behind "
              "the Gopher repetition flags): map-only filter/transform "
              "pass, zero shuffles; collapsed-text md5 proves the "
              "transform cross-engine."),
        Query("text_lang_confusion", _lang_confusion_q,
              _lang_confusion_sql(),
              "Confusion matrix of the lang-id heuristic vs labels "
              "with per-cell recall share in milli — the "
              "classifier-eval readout; 4×4 hash-agg over the map-only "
              "scorer."),
        Query("corpus_zipf_slope", _zipf_q, _ZIPF_SQL,
              "Zipf exponent per language: exact-integer OLS of "
              "floor-log2 freq on floor-log2 rank over the vocab "
              "table — template corpora flatten toward 0."),
        Query("corpus_vocab_stats", _vocab_stats_q, _VOCAB_STATS_SQL,
              "Per-language lexical diversity: type-token ratio + "
              "hapax share from two map-side-combining hash-aggs — "
              "catches template/looping corpora that pass per-doc "
              "gates."),
        Query("corpus_vocab_coverage", _coverage_curve_q,
              _COVERAGE_CURVE_SQL,
              "Tokenizer-sizing curve: cumulative token-mass coverage "
              "of the top 2^b vocab types per floor-log2 rank bucket, "
              "rank window over types only."),
        Query("text_doc_keywords", _keywords_q, _KEYWORDS_SQL,
              "Per-doc top-3 TF-IDF keywords (integer floor-log2 idf): "
              "tf hash-agg + broadcast df + doc-partitioned top-k "
              "window."),
        Query("text_ngram_novelty", _novelty_q, _NOVELTY_SQL,
              "Per-doc 5-gram novelty vs the src0 reference slice: "
              "map-only window hashing, one distinct-agg reference set, "
              "h-keyed anti join — the corpus is never self-joined."),
        Query("docs_sample_exact_k", _exact_k_q, _EXACT_K_SQL,
              "Exactly-k-per-stratum sample: md5-rank row_number ≤ k "
              "inside each (lang, source) window — reproducible under "
              "any partitioning, WindowGroupLimit keeps the sort "
              "frontier at k."),
        Query("text_token_fertility", _fertility_q, _FERTILITY_SQL,
              "Tokenizer-fertility / length-distribution report per "
              "(lang, source): exact integer token-count deciles, "
              "pieces-per-token and chars-per-piece milli ratios."),
        Query("text_unigram_lm_score", _lm_score_q, _LM_SCORE_SQL,
              "CCNet-style unigram-LM quality score: corpus-frequency "
              "floor-log2 mean per doc, top-V broadcast vocab, "
              "integer-exact across engines."),
        Query("docs_token_budget_select", _budget_select_q,
              _BUDGET_SELECT_SQL,
              "Token-budget curation: per-lang quality histogram → "
              "cutoff → map-only filter (no per-lang document sort)."),
        Query("text_normalize", _normalize_q, _NORMALIZE_SQL,
              "Canonicalization pass before exact dedup: lower + "
              "punctuation strip + whitespace collapse, map-only, "
              "RE2-safe cross-engine."),
        Query("docs_importance_resample", _dsir_q, _DSIR_SQL,
              "DSIR-style importance resampling: hashed n-gram bucket "
              "log-ratios vs a target-domain slice, exact-integer "
              "floor-log2 weights, deterministic md5-threshold accept."),
        Query("docs_domain_cap", _domain_cap_q, _DOMAIN_CAP_SQL,
              "C4-style per-domain document cap: hash-bucket histogram "
              "→ per-source cumulative cutoff → map-only keep (no "
              "per-domain document sort)."),
        Query("text_bpe_merges", _bpe_q, _bpe_sql(),
              "BPE tokenizer training (Sennrich 2016): one corpus pass "
              "builds the word histogram, then 3 unrolled merge "
              "iterations on the vocab-sized table — greedy pair merge "
              "via doubled-delimiter string replace, oracle unrolled "
              "into CTEs like embed_kmeans."),
        Query("text_bpe_segment", _bpe_segment_q, _bpe_segment_sql(),
              "Apply the trained BPE merges back to the corpus: "
              "per-doc piece counts under the learned vocabulary — "
              "segmentation on the vocab-sized word table, broadcast "
              "over the token stream (one corpus explode + hash-agg)."),
        Query("text_bm25_topk", _bm25_q, _bm25_sql(),
              "BM25 top-k retrieval over inverted postings: one corpus "
              "shuffle for tf, broadcast query set + df, term-keyed "
              "join (no corpus cross-join); per-term contributions "
              "integer-quantized before the per-doc sum so ranking is "
              "summation-order-independent."),
        Query("text_bigram_lm_score", _bigram_lm_q, _BIGRAM_LM_SQL,
              "CCNet-style perplexity quality scoring: bigram LM with "
              "stupid backoff trained on a reference slice, exact "
              "floor-log2 integer bits; broadcast reference tables, "
              "map-only scoring over the token stream."),
        Query("docs_perplexity_buckets", _ppl_buckets_q,
              _PPL_BUCKETS_SQL,
              "CCNet head/middle/tail split per language: exact "
              "integer-score histogram → tertile cutoffs → broadcast "
              "bucket label — no per-language corpus sort."),
        Query("text_pmi_collocations", _word_pmi_q, _WORD_PMI_SQL,
              "PMI collocation mining over document co-occurrence "
              "(top-V vocab, exact floor-log2 bits): map-side pair "
              "comprehension vs the oracle's relational self-join — "
              "a cross-formulation equivalence proof."),
        Query("docs_dup_rate_by_length", _dup_by_length_q,
              _DUP_BY_LENGTH_SQL,
              "Exact-dup rate per floor-log2 length bucket: where the "
              "dedup pressure lives — one md5 cluster-size hash-agg "
              "joined back on its own key, ~64-row rollup."),
        Query("docs_contamination_13gram", _contamination_q,
              _contamination_sql(),
              "Brown-2020-style eval decontamination audit: per eval-"
              "split doc, 13-token windows found anywhere in the train "
              "split (distinct-hash index + semi-join probe, corpus "
              "never self-joined) — the n-gram complement to the hash "
              "and embedding leakage audits."),
        Query("text_code_detect", _code_detect_q, _CODE_DETECT_SQL,
              "Code-vs-prose router: code-marker + digit character "
              "density via translate-removal counts (exact integers, "
              "map-only, no regex dialect risk); seeded code-snippet "
              "suffixes keep the detector non-vacuous on the "
              "punctuation-free fixture corpus."),
        Query("text_readability_ari", _readability_q, _READABILITY_SQL,
              "Automated Readability Index per doc (Senter & Smith "
              "1967): exact integer char/word/sentence counts, one "
              "identical-shape double expression per engine, "
              "centi-units + grade band — the reading-level quality "
              "signal."),
        Query("text_winnow_fingerprints", _winnow_q, _winnow_sql(),
              "Winnowing fingerprints (Schleimer 2003, the MOSS "
              "scheme): per-doc window-min shingle hashes — local "
              "dedup guarantee (any shared ≥ w+k−1 token run shares a "
              "fingerprint); shingle explode + doc-bounded window min "
              "+ one hash-agg, corpus never self-joined."),
    ]
}
