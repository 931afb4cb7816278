"""Streaming corpus ingestion: the LLM-training backfill/ingest shape.

File-source document stream → per-row quality gate (the same
`quality_flag` expression the batch `corpus_clean` pipeline uses) →
exact content-hash dedup → parquet append sink.

Two dedup modes, chosen by ``watermark``:

- ``watermark=None`` (bounded backfill, ``availableNow``): plain
  ``dropDuplicates`` on the content hash. State holds one 32-byte hash
  per distinct document for the run's lifetime — fine for a backfill
  that ends, wrong for a forever-running ingest.
- ``watermark="1 hour"`` (continuous ingest): stamp each row with its
  processing time and use ``dropDuplicatesWithinWatermark`` — state is
  bounded by (arrival rate × watermark) regardless of stream lifetime,
  the property that matters on an unbounded 100 TB/day feed. Re-deliveries
  land within seconds-to-minutes in practice, so a short watermark
  deduplicates them while old hashes age out.

Everything upstream of the sink is per-row column math (split / size /
md5) — no shuffle except the dedup's own state exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_validator_github_spark.scale.text import quality_flag

#: Schema of the documents feed (matches testdata documents.parquet).
DOC_STREAM_SCHEMA = (
    "doc_id long, text string, lang string, source string, n_chars long"
)


def clean_doc_stream(stream: DataFrame, watermark: str | None = None) -> DataFrame:
    """Quality-gate + content-hash-dedup a (streaming) document frame."""
    hashed = (
        stream.filter(quality_flag())
        .withColumn("content_hash", F.md5("text"))
    )
    if watermark is None:
        return hashed.dropDuplicates(["content_hash"])
    return (
        hashed.withColumn("ingest_ts", F.current_timestamp())
        .withWatermark("ingest_ts", watermark)
        .dropDuplicatesWithinWatermark(["content_hash"])
        .drop("ingest_ts")
    )


def stream_corpus_ingest(
    spark,
    source_dir: str,
    sink_dir: str,
    checkpoint_dir: str,
    watermark: str | None = None,
    available_now: bool = True,
):
    """Parquet file-source → clean_doc_stream → parquet append sink."""
    stream = (
        spark.readStream.schema(DOC_STREAM_SCHEMA)
        .option("recursiveFileLookup", "true")
        .option("maxFilesPerTrigger", 8)
        .parquet(source_dir)
    )
    writer = (
        clean_doc_stream(stream, watermark=watermark)
        .writeStream.outputMode("append")
        .format("parquet")
        .option("path", sink_dir)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_incremental_dedup(
    spark,
    source_dir: str,
    sink_dir: str,
    checkpoint_dir: str,
    corpus_hashes: DataFrame,
    corpus_bands: DataFrame,
    available_now: bool = True,
):
    """Streaming form of the incremental-dedup probe (scale/dedup.py):
    newly landed document files are flagged per micro-batch against a
    PRECOMPUTED corpus index — (content hashes, LSH band keys), built
    once via ``build_dedup_index`` — and the flags append to a parquet
    sink alongside doc_id.

    This is the daily-ingest shape at 100 TB: the index is a static
    few-bytes/doc table (batch side of the foreachBatch joins), the
    per-batch work is |batch| signature hashing + two semi-joins, and
    the corpus text is never touched. foreachBatch is required because
    stream-static SEMI joins + aggregation in one pass exceed what the
    continuous planner allows; the batch inside is plain batch Spark.
    """
    from etl_validator_github_spark.scale.dedup import probe_dedup_index

    # CALLER owns the index lifetime: pass corpus_hashes/corpus_bands
    # already ``.persist()``-ed (and unpersist them after the query
    # terminates). Without a persist every micro-batch re-scans and
    # re-hashes the corpus (O(|corpus|) per batch instead of
    # O(|batch| + |index|)). Persisting here instead would leak cached
    # copies for the SparkSession lifetime across the restart pattern
    # (this function is re-invoked with the same index on every restart,
    # and a StreamingQuery has no reliable termination hook to release
    # them from).

    stream = (
        spark.readStream.schema(DOC_STREAM_SCHEMA)
        .option("recursiveFileLookup", "true")
        .option("maxFilesPerTrigger", 8)
        .parquet(source_dir)
    )

    def _probe(batch_df: DataFrame, batch_id: int) -> None:
        probe_dedup_index(batch_df, corpus_hashes, corpus_bands).withColumn(
            "batch_id", F.lit(batch_id)
        ).write.mode("append").parquet(sink_dir)

    writer = stream.writeStream.foreachBatch(_probe).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_span_probe(
    spark,
    source_dir: str,
    sink_dir: str,
    checkpoint_dir: str,
    span_index: DataFrame,
    available_now: bool = True,
):
    """Streaming form of the incremental SPAN probe (scale/dedup.py
    ``probe_span_index``): each micro-batch of newly landed documents
    is scored for k-token spans already present in the corpus's
    persisted window-hash index — the quoted-content / contamination
    check on live ingest. Same shape as ``stream_incremental_dedup``:
    the caller passes ``span_index`` already persisted (it owns the
    lifetime), per-batch work is |batch| window hashing + one
    semi-join, the corpus text is never touched. Every sink row is
    stamped with its micro-batch id (the ``stream_cms_counters``
    convention) so a reader can drop a redelivered batch's duplicate
    appends by (batch_id, doc_id).
    """
    from etl_validator_github_spark.scale.dedup import probe_span_index

    stream = (
        spark.readStream.schema(DOC_STREAM_SCHEMA)
        .option("recursiveFileLookup", "true")
        .option("maxFilesPerTrigger", 8)
        .parquet(source_dir)
    )

    def _probe(batch_df: DataFrame, batch_id: int) -> None:
        probe_span_index(batch_df, span_index).withColumn(
            "batch_id", F.lit(batch_id)
        ).write.mode("append").parquet(sink_dir)

    writer = stream.writeStream.foreachBatch(_probe).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_bloom_probe(
    spark,
    source_dir: str,
    sink_dir: str,
    checkpoint_dir: str,
    bloom_row: DataFrame,
    available_now: bool = True,
):
    """Streaming decontamination gate through the Bloom membership
    sketch (scale/sketches.py): each micro-batch of newly landed
    documents shingles itself and probes the caller-built register row
    map-side, appending (doc_id, n_shingles, n_bloom_hits, flagged,
    batch_id) to the sink — the batch_id stamp is the redelivery-dedup
    key for readers (the ``stream_cms_counters`` convention).

    CALLER owns the ``bloom_row`` lifetime (the ``stream_span_probe``
    contract) — build it ONCE with ``bloom_build`` over the held-out
    suite and pass it persisted. The register row is a few KiB no
    matter how large the suite, so unlike the exact span/shingle
    indexes the per-batch probe ships NO per-key state at all: |batch|
    shingling + k hash/mask expressions + one doc-key agg. Bloom admits
    no false negatives, so a clean verdict here is final; flagged docs
    go to the exact (batch) decontamination pass for confirmation.
    """
    from etl_validator_github_spark.scale.dedup import _doc_shingles
    from etl_validator_github_spark.scale.sketches import bloom_probe

    stream = (
        spark.readStream.schema(DOC_STREAM_SCHEMA)
        .option("recursiveFileLookup", "true")
        .option("maxFilesPerTrigger", 8)
        .parquet(source_dir)
    )

    def _probe(batch_df: DataFrame, batch_id: int) -> None:
        keyed = _doc_shingles(batch_df).distinct()
        bloom_probe(keyed, bloom_row).withColumn(
            "batch_id", F.lit(batch_id)
        ).write.mode("append").parquet(sink_dir)

    writer = stream.writeStream.foreachBatch(_probe).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_novelty_probe(
    spark,
    source_dir: str,
    sink_dir: str,
    checkpoint_dir: str,
    novelty_index: DataFrame,
    available_now: bool = True,
):
    """Streaming n-gram novelty (scale/text.py ``novelty_scores``): each
    micro-batch of newly landed documents is scored for the fraction of
    its k-token windows ABSENT from the persisted reference hash index
    — the "is this source adding new text" readout on live ingest, the
    complement of ``stream_span_probe``'s contamination check. Same
    contract as the other probes: CALLER owns the ``novelty_index``
    lifetime (pass it persisted; built once via ``build_novelty_index``),
    per-batch work is |batch| window hashing + one anti-join + one
    doc-keyed agg, and every sink row carries its micro-batch id (the
    ``stream_cms_counters`` redelivery-dedup convention).
    """
    from etl_validator_github_spark.scale.text import novelty_scores

    stream = (
        spark.readStream.schema(DOC_STREAM_SCHEMA)
        .option("recursiveFileLookup", "true")
        .option("maxFilesPerTrigger", 8)
        .parquet(source_dir)
    )

    def _probe(batch_df: DataFrame, batch_id: int) -> None:
        novelty_scores(batch_df, novelty_index).withColumn(
            "batch_id", F.lit(batch_id)
        ).write.mode("append").parquet(sink_dir)

    writer = stream.writeStream.foreachBatch(_probe).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_postings_maintenance(
    spark,
    source_dir: str,
    postings_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
):
    """Incremental inverted-index build: each micro-batch of newly
    landed documents appends its (doc_id, dl, term, tf) postings
    (scale/text.py ``doc_postings``) to a parquet log, stamped with the
    micro-batch id. A document's postings are a pure function of its
    own text, so per-batch work is |batch| tokenize + one hash-agg and
    the index NEVER rewrites earlier documents — the property that
    makes a 100 TB/day corpus searchable incrementally.

    Readers dedup redeliveries by keeping each doc's FIRST batch
    (``read_postings_log``) and score with ``bm25_from_postings`` —
    which re-derives the corpus stats (n_docs, total tokens) from the
    postings themselves, so the log is the whole index.
    """
    from etl_validator_github_spark.scale.text import doc_postings

    stream = (
        spark.readStream.schema(DOC_STREAM_SCHEMA)
        .option("recursiveFileLookup", "true")
        .option("maxFilesPerTrigger", 8)
        .parquet(source_dir)
    )

    def _append(batch_df: DataFrame, batch_id: int) -> None:
        restore_log_aside(postings_dir)
        doc_postings(batch_df).withColumn(
            "batch_id", F.lit(batch_id)
        ).write.mode("append").parquet(postings_dir)

    writer = stream.writeStream.foreachBatch(_append).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_postings_log(spark, postings_dir: str) -> DataFrame:
    """The live postings table from the log, idempotent under BOTH
    replay shapes: an upstream redelivery appends byte-identical doc
    rows under a NEW batch_id (keep each doc's first batch — min
    batch_id, a doc-keyed semi-join), while a foreachBatch RETRY
    (sink append committed, checkpoint offset not) re-runs under the
    SAME batch_id — those byte-identical copies collapse in the
    ``distinct`` before the fold."""
    restore_log_aside(postings_dir)
    return _fold_log(spark.read.parquet(postings_dir), "doc_id")


def stream_perplexity_gate(
    spark,
    source_dir: str,
    sink_dir: str,
    checkpoint_dir: str,
    ref_docs: DataFrame,
    nll_cutoff_milli: int = 12_000,
    available_now: bool = True,
):
    """Streaming CCNet-style quality gate: each micro-batch of newly
    landed documents is scored by the bigram reference LM
    (scale/text.py::bigram_lm_score) and appended to the sink with a
    keep verdict (nll_bits_milli ≤ cutoff), stamped with batch_id —
    the redelivery-dedup key for readers (the ``stream_cms_counters``
    convention).

    CALLER owns ``ref_docs`` (the ``stream_bloom_probe`` contract):
    the reference slice is read once, and the LM tables it induces are
    reference-sized — they broadcast inside every per-batch score, so
    the probe ships no per-key state and each batch costs |batch|
    window hashing + three broadcast joins + one doc-key agg. Docs
    with < 2 tokens carry no transitions and are appended with NULL
    score and keep=false (route to manual review, exactly like the
    batch operator's absent-row semantics — made explicit here because
    a stream row must land SOMEWHERE).
    """
    from etl_validator_github_spark.scale.text import bigram_lm_score

    stream = (
        spark.readStream.schema(DOC_STREAM_SCHEMA)
        .option("recursiveFileLookup", "true")
        .option("maxFilesPerTrigger", 8)
        .parquet(source_dir)
    )

    def _score(batch_df: DataFrame, batch_id: int) -> None:
        scored = bigram_lm_score(batch_df, ref_docs=ref_docs)
        out = (
            batch_df.select("doc_id", "lang", "source")
            .join(scored, "doc_id", "left")
            .withColumn(
                "keep",
                F.coalesce(
                    F.col("nll_bits_milli") <= F.lit(nll_cutoff_milli),
                    F.lit(False),
                ),
            )
            .withColumn("batch_id", F.lit(batch_id))
        )
        out.write.mode("append").parquet(sink_dir)

    writer = stream.writeStream.foreachBatch(_score).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


#: Schema of an embeddings feed (matches testdata embeddings.parquet,
#: minus the label column a delta feed does not have).
VEC_STREAM_SCHEMA = "vec_id long, embedding array<float>"


def stream_semantic_dedup(
    spark,
    source_dir: str,
    sink_dir: str,
    checkpoint_dir: str,
    base: "DataFrame",
    available_now: bool = True,
):
    """Streaming form of ``semantic_dedup_incremental``
    (scale/similarity.py): newly landed embedding files are probed per
    micro-batch against the BASE corpus's IVF cells, appending
    (vec_id, cell, n_base_near_dups, is_semantic_dup) to a parquet sink.

    CALLER owns the ``base`` lifetime (same contract as
    ``stream_incremental_dedup``): pass it ``.persist()``-ed, or each
    micro-batch re-scans the base corpus. At 100 TB the per-cell base
    index (assignment + quantized vectors) is a precomputed table; the
    per-batch work is |batch| map-side assignment + the cell-key probe
    join.
    """
    from etl_validator_github_spark.scale.similarity import (
        semantic_dedup_incremental,
    )

    stream = (
        spark.readStream.schema(VEC_STREAM_SCHEMA)
        .option("recursiveFileLookup", "true")
        .option("maxFilesPerTrigger", 8)
        .parquet(source_dir)
    )

    def _probe(batch_df: DataFrame, batch_id: int) -> None:
        semantic_dedup_incremental(batch_df, base).withColumn(
            "batch_id", F.lit(batch_id)
        ).write.mode("append").parquet(sink_dir)

    writer = stream.writeStream.foreachBatch(_probe).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_cms_counters(
    spark,
    source_dir: str,
    counter_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
):
    """Streaming count-min maintenance over the document feed: each
    micro-batch appends its (batch_id, row, bucket, n) counter cells.

    The exactly-once discipline is the OPPOSITE of the HLL register
    log (streaming/events.py): CMS counters merge by SUM, which is NOT
    idempotent — a redelivered batch appended naively would double-
    count. So the log carries the batch_id, and the read-side fold
    (``cms_log_counters``) collapses duplicate (batch_id, row, bucket)
    rows FIRST — the copies are identical because the grid is a pure
    function of the batch — and only then sums across batches. Max
    gets idempotence for free; sum has to buy it with a key.
    """
    from etl_validator_github_spark.scale.sketches import cms_counters
    from etl_validator_github_spark.scale.text import tokens

    stream = (
        spark.readStream.schema(DOC_STREAM_SCHEMA)
        .option("recursiveFileLookup", "true")
        .option("maxFilesPerTrigger", 8)
        .parquet(source_dir)
    )

    def _append(batch_df: DataFrame, batch_id: int) -> None:
        restore_log_aside(counter_dir)
        toks = batch_df.select(F.explode(tokens()).alias("tok"))
        cms_counters(toks).withColumn(
            "batch_id", F.lit(batch_id)
        ).write.mode("append").parquet(counter_dir)

    writer = stream.writeStream.foreachBatch(_append).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def cms_log_counters(spark, counter_dir: str) -> DataFrame:
    """Fold the streamed counter log to the current grid:
    dedup per (batch_id, row, bucket) — duplicate appends of one batch
    are byte-identical — then SUM across batches."""
    restore_log_aside(counter_dir)
    log = spark.read.parquet(counter_dir)
    once = log.groupBy("batch_id", "row", "bucket").agg(
        F.max("n").alias("n")
    )
    return once.groupBy("row", "bucket").agg(F.sum("n").alias("n"))


def stream_classifier_counts(
    spark,
    source_dir: str,
    counts_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
):
    """Incremental quality-classifier training: each micro-batch of
    newly landed documents derives its teacher labels in-batch
    (scale/text.py::labeled_docs — a pure function of the doc text)
    and appends its (doc_id, label, token, tf) sufficient statistics
    to a parquet log, stamped with the micro-batch id. The NB weight
    table is additive in these statistics, so the model updates with
    work ∝ delta and never rewrites earlier docs — the same
    append-only contract as ``stream_postings_maintenance``, applied
    to model training instead of indexing.

    Redelivery discipline is the doc-keyed one (postings, not CMS):
    a redelivered batch appends byte-identical doc rows under a new
    batch_id, and the read-side fold keeps each doc's FIRST batch
    (``read_classifier_counts_log``) before summing to token grain.
    """
    from etl_validator_github_spark.scale.text import (
        labeled_docs,
        doc_token_counts,
    )

    stream = (
        spark.readStream.schema(DOC_STREAM_SCHEMA)
        .option("recursiveFileLookup", "true")
        .option("maxFilesPerTrigger", 8)
        .parquet(source_dir)
    )

    def _append(batch_df: DataFrame, batch_id: int) -> None:
        restore_log_aside(counts_dir)
        doc_token_counts(labeled_docs(batch_df)).withColumn(
            "batch_id", F.lit(batch_id)
        ).write.mode("append").parquet(counts_dir)

    writer = stream.writeStream.foreachBatch(_append).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_classifier_counts_log(spark, counts_dir: str) -> DataFrame:
    """The live sufficient-statistics table from the log, idempotent
    under both replay shapes (the ``read_postings_log`` discipline):
    ``distinct`` collapses a foreachBatch retry's byte-identical
    same-batch_id copies — counts merge by SUM, so without it a retry
    would double tf — and first-batch-wins (min batch_id) drops an
    upstream redelivery's new-batch_id copies. The fold to
    weights/prior is scale/text.py::classifier_weights_from_counts /
    classifier_prior_from_counts."""
    restore_log_aside(counts_dir)
    return _fold_log(spark.read.parquet(counts_dir), "doc_id")


def stream_ivf_index_maintenance(
    spark,
    source_dir: str,
    index_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
    np_assign: bool = False,
):
    """Streaming ANN-index maintenance: newly landed embedding files
    are assigned per micro-batch against the index's FROZEN centroid
    table (``persist_ivf_index`` must have written
    ``{index_dir}/cells.parquet`` first) and appended to an assignment
    log stamped with the micro-batch id. A vector's cell is a pure
    function of itself and the frozen centroids, so the index never
    rewrites earlier vectors and ingest work is ∝ batch — the
    ``stream_postings_maintenance`` contract for the vector side.
    Serve via scale/similarity.py::read_ivf_index_assignment (the
    unified batch+stream view) + ``ivf_topk_from_assignment``;
    ``np_assign`` opts into the dgemm assignment twin (the documented
    family bend — a 100k-vector micro-batch assigns in ~2 s instead of
    the interpreted expression fold's ~45 s)."""
    from etl_validator_github_spark.scale.similarity import (
        home_cell_assignment,
        quantized,
    )

    cells = spark.read.parquet(f"{index_dir}/cells.parquet")
    stream = (
        spark.readStream.schema(VEC_STREAM_SCHEMA)
        .option("recursiveFileLookup", "true")
        .option("maxFilesPerTrigger", 8)
        .parquet(source_dir)
    )

    def _append(batch_df: DataFrame, batch_id: int) -> None:
        restore_log_aside(f"{index_dir}/assign_log.parquet")
        home_cell_assignment(
            quantized(batch_df), cells, np_assign
        ).withColumn("batch_id", F.lit(batch_id)).write.mode(
            "append"
        ).parquet(f"{index_dir}/assign_log.parquet")

    writer = stream.writeStream.foreachBatch(_append).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_ivf_assignment_log(spark, index_dir: str) -> DataFrame:
    """The live assignment view for an index under streaming
    maintenance — delegates to the UNIFIED batch+stream reader
    (scale/similarity.py::read_ivf_index_assignment) so a deployment
    that bootstrapped with ``persist_ivf_index`` and then streamed
    deltas never serves a truncated candidate set."""
    from etl_validator_github_spark.scale.similarity import (
        read_ivf_index_assignment,
    )

    return read_ivf_index_assignment(spark, index_dir)


def stream_classifier_gate(
    spark,
    source_dir: str,
    sink_dir: str,
    checkpoint_dir: str,
    weights: DataFrame,
    prior: DataFrame,
    available_now: bool = True,
):
    """Streaming learned-quality gate: each micro-batch of newly landed
    documents is scored by the trained token-weight classifier
    (scale/text.py::quality_classifier_score) and appended with a keep
    verdict (score ≥ the occurrence prior), stamped with batch_id —
    the inference half of the classifier loop whose training half is
    ``stream_classifier_counts`` (weights/prior typically folded from
    that log via classifier_weights_from_counts /
    classifier_prior_from_counts).

    CALLER owns ``weights``/``prior`` (the ``stream_perplexity_gate``
    contract): the weight table is vocabulary-bounded and broadcasts
    inside every per-batch score, so the gate ships no per-key state
    and each batch costs |batch| explode + one broadcast join + one
    doc-key agg."""
    from etl_validator_github_spark.scale.text import (
        labeled_docs,
        quality_classifier_score,
    )

    stream = (
        spark.readStream.schema(DOC_STREAM_SCHEMA)
        .option("recursiveFileLookup", "true")
        .option("maxFilesPerTrigger", 8)
        .parquet(source_dir)
    )

    def _score(batch_df: DataFrame, batch_id: int) -> None:
        scored = quality_classifier_score(
            labeled_docs(batch_df), weights, prior
        )
        scored.withColumn(
            "keep", (F.col("score_micro") >= F.col("prior_micro")).cast("int")
        ).withColumn("batch_id", F.lit(batch_id)).write.mode(
            "append"
        ).parquet(sink_dir)

    writer = stream.writeStream.foreachBatch(_score).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def restore_log_aside(log_dir: str) -> None:
    """Crash-recovery preamble shared by EVERY log writer and reader
    entry point (the appenders above, the read_* folds, and
    scale/similarity.py::read_ivf_index_assignment): if a
    ``compact_log`` crash between its two renames left ``log_dir``
    absent with a complete ``.old-<tag>`` aside on disk, restore the
    newest aside before anything touches the path.

    Without this preamble a restarted maintenance stream's
    ``write.mode('append')`` would silently recreate ``log_dir``
    holding only the new micro-batch, and every read until the next
    compaction would serve a log missing all pre-crash rows (the
    compaction itself merge-folds leftover asides, so the data is
    never lost — but reads in between would be truncated). Idempotent
    and O(1) when ``log_dir`` exists — safe to call per micro-batch.
    Local-filesystem rename semantics (the sandbox contract).

    When MULTIPLE asides coexist (two crashed compactions in a row),
    the newest renames back and the older asides' part files move INTO
    it: each aside is a complete log state, Spark's uuid part-file
    names cannot collide, and the union is exactly what the read fold
    (distinct + first-batch-wins, with compacted generations stamped
    batch 0) converges from — restoring only the newest would serve a
    log missing every row unique to the older asides (r11 review
    finding)."""
    import glob as _glob
    import os

    if os.path.exists(log_dir):
        return
    asides = sorted(_glob.glob(f"{log_dir}.old-*"), key=os.path.getmtime)
    if not asides:
        return
    os.rename(asides[-1], log_dir)
    for aside in asides[:-1]:
        for name in os.listdir(aside):
            os.replace(os.path.join(aside, name),
                       os.path.join(log_dir, name))
        os.rmdir(aside)


def _fold_log(log: DataFrame, key_col: str) -> DataFrame:
    """The shared idempotence fold for batch_id-stamped append logs:
    ``distinct`` collapses a foreachBatch retry's same-batch_id copies,
    first-batch-wins (min batch_id per key) drops an upstream
    redelivery's new-batch_id copies."""
    log = log.distinct()
    first = log.groupBy(key_col).agg(F.min("batch_id").alias("batch_id"))
    return log.join(first, [key_col, "batch_id"]).drop("batch_id")


def compact_log(spark, log_dir: str, key_col: str = "doc_id",
                n_files: int | None = None) -> None:
    """Fold-and-rewrite compaction for the batch_id-stamped append logs
    (postings / classifier counts / IVF assignments): apply the
    read-side idempotence fold ONCE and rewrite the log as a single
    ``batch_id = 0`` generation. Correctness is preserved for every
    later replay shape: a post-compaction retry or redelivery of a
    PRE-compaction batch arrives with batch_id > 0 and loses
    first-batch-wins to the compacted generation; new appends keep
    their monotonically growing ids. Run while the maintenance stream
    is stopped (the nightly-lake-pass slot compact_parquet also owns).

    Swap choreography (the CDC write-aside discipline): the folded
    generation lands in ``<dir>.gen-<uuid>``, the old log moves to
    ``<dir>.old-<uuid>``, the generation renames in, and only then is
    the aside deleted. A crash mid-swap leaves either the original or
    a COMPLETE ``.old-`` aside on disk, never a half-written log; the
    recovery preamble below restores the aside and purges stale
    staging on the next run, so crash-then-recompact always converges.

    If BOTH the log and ``.old-*`` asides exist, the asides are
    MERGE-FOLDED into this compaction rather than purged: that state
    is either a completed swap whose final cleanup died (aside content
    ⊆ log — the merge is a no-op under the fold) or a crash-window
    aside that a restarted maintenance stream papered over by
    recreating the log with only its new batches (the aside holds all
    pre-crash rows — purging it would be silent data loss; the
    ADVICE-r10 finding). Union-then-fold is correct in both shapes
    because a compacted generation re-stamps every key at
    ``batch_id = 0``, which wins first-batch-wins against the aside's
    original rows. Local-filesystem rename semantics (the sandbox
    contract — on a cluster swap these for FileSystem.rename, same
    choreography)."""
    import glob as _glob
    import os
    import shutil
    import uuid as _uuid

    # Crash recovery (the streaming/cdc.py _recover_state_dir
    # discipline, shared with every writer/reader entry point): a
    # crash between the two renames leaves log_dir absent with a
    # complete .old-<tag> aside — restore the newest; stale .gen-*
    # staging from aborted runs is purged.
    restore_log_aside(log_dir)
    for stale in _glob.glob(f"{log_dir}.gen-*"):
        shutil.rmtree(stale, ignore_errors=True)

    src = spark.read.parquet(log_dir)
    merged_asides = sorted(_glob.glob(f"{log_dir}.old-*"),
                           key=os.path.getmtime)
    for aside in merged_asides:
        src = src.unionByName(spark.read.parquet(aside))
    folded = _fold_log(src, key_col).withColumn("batch_id", F.lit(0))
    tag = _uuid.uuid4().hex[:8]
    gen = f"{log_dir}.gen-{tag}"
    out = folded.repartition(n_files) if n_files else folded
    out.write.parquet(gen)
    old = f"{log_dir}.old-{tag}"
    os.rename(log_dir, old)
    os.rename(gen, log_dir)
    shutil.rmtree(old)
    # Only after the swap completes is it safe to retire the merged
    # asides — a crash before this point re-merges them next run.
    for aside in merged_asides:
        shutil.rmtree(aside, ignore_errors=True)
