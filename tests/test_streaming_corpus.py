"""Streaming corpus ingestion (streaming/corpus.py): quality gate +
content-hash dedup must behave identically to the batch pipeline, and
re-delivered document files must deduplicate across micro-batches."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_validator_github_spark.streaming.corpus import (
    stream_bloom_probe,
    stream_corpus_ingest,
)

GOOD = " ".join(f"tok{i}" for i in range(30))
GOOD2 = " ".join(f"other{i}" for i in range(25))
SHORT = "way too short"


def _write_docs(spark, path, rows):
    spark.createDataFrame(
        [(i, t, "en", "crawl", len(t)) for i, t in rows],
        "doc_id: long, text: string, lang: string, source: string, n_chars: long",
    ).coalesce(1).write.mode("overwrite").parquet(path)


def test_corpus_ingest_dedups_and_quality_gates(spark, tmp_path):
    src, sink, ckpt = tmp_path / "src", tmp_path / "sink", tmp_path / "ckpt"
    # Batch 1: one good doc, one short (quality-rejected) doc.
    _write_docs(spark, str(src / "b1.parquet"), [(0, GOOD), (1, SHORT)])
    # Batch 2: a re-delivery of the good doc (new doc_id, same content)
    # plus a genuinely new doc.
    _write_docs(spark, str(src / "b2.parquet"), [(2, GOOD), (3, GOOD2)])

    q = stream_corpus_ingest(spark, str(src), str(sink), str(ckpt))
    q.awaitTermination(120)

    out = spark.read.parquet(str(sink))
    texts = sorted(r["text"] for r in out.collect())
    assert texts == sorted([GOOD, GOOD2])           # dedup + quality gate
    assert out.filter(F.col("text") == SHORT).count() == 0


def test_corpus_ingest_watermarked_mode(spark, tmp_path):
    src = tmp_path / "wsrc"
    sink, ckpt = tmp_path / "wsink", tmp_path / "wckpt"
    _write_docs(spark, str(src / "b1.parquet"),
                [(0, GOOD), (1, GOOD), (2, GOOD2)])

    q = stream_corpus_ingest(
        spark, str(src), str(sink), str(ckpt), watermark="10 minutes"
    )
    q.awaitTermination(120)

    out = spark.read.parquet(str(sink))
    # Same-batch duplicates collapse; schema keeps the original columns
    # (ingest_ts is internal only).
    assert sorted(r["text"] for r in out.collect()) == sorted([GOOD, GOOD2])
    assert "ingest_ts" not in out.columns
    assert "content_hash" in out.columns


def test_stream_incremental_dedup_probes_static_index(spark, tmp_path):
    """Streaming delta files flagged against a precomputed corpus index:
    an exact re-send flags is_exact_dup with all bands hitting; a near
    variant hits bands without the exact flag; a novel doc hits nothing.
    A second availableNow run picks up only the newly landed file."""
    from etl_validator_github_spark.scale.dedup import (
        N_BANDS,
        build_dedup_index,
    )
    from etl_validator_github_spark.streaming.corpus import (
        stream_incremental_dedup,
    )

    corpus = spark.createDataFrame(
        [(0, GOOD, "en"), (1, GOOD2, "en")],
        "doc_id: long, text: string, lang: string",
    )
    # Caller owns the index lifetime (see stream_incremental_dedup):
    # persist once, reuse across both runs, unpersist at the end.
    hashes, bands = build_dedup_index(corpus)
    hashes, bands = hashes.persist(), bands.persist()
    try:
        src = tmp_path / "isrc"
        sink, ckpt = tmp_path / "isink", tmp_path / "ickpt"
        near = GOOD + " extra0 extra1"                 # shares most shingles
        novel = " ".join(f"fresh{i}" for i in range(20))
        _write_docs(spark, str(src / "d1.parquet"),
                    [(100, GOOD), (101, near), (102, novel)])

        q = stream_incremental_dedup(
            spark, str(src), str(sink), str(ckpt), hashes, bands
        )
        q.awaitTermination(120)
        got = {r.doc_id: (r.is_exact_dup, r.n_corpus_band_hits)
               for r in spark.read.parquet(str(sink)).collect()}
        assert got[100] == (1, N_BANDS)                # exact re-send
        assert got[101][0] == 0 and got[101][1] >= 1   # near-dup suspect
        assert got[102] == (0, 0)                      # genuinely novel

        # Incremental: a later file is probed in its own micro-batch.
        _write_docs(spark, str(src / "d2.parquet"), [(200, GOOD2)])
        q2 = stream_incremental_dedup(
            spark, str(src), str(sink), str(ckpt), hashes, bands
        )
        q2.awaitTermination(120)
        got2 = {r.doc_id: (r.is_exact_dup, r.n_corpus_band_hits)
                for r in spark.read.parquet(str(sink)).collect()}
        assert len(got2) == 4
        assert got2[200] == (1, N_BANDS)
    finally:
        hashes.unpersist()
        bands.unpersist()


def test_stream_semantic_dedup_probes_base_cells(spark, tmp_path):
    """Embedding delta files probed per micro-batch against the base
    corpus's IVF cells: an exact re-send flags, a novel direction does
    not, and a later file lands in its own micro-batch."""
    from etl_validator_github_spark.streaming.corpus import (
        stream_semantic_dedup,
    )

    base = spark.createDataFrame(
        [(0, [1.0, 0.0, 0.0, 0.0], 0), (1, [0.0, 1.0, 0.0, 0.0], 1)],
        "vec_id: long, embedding: array<float>, label: int",
    ).persist()
    try:
        src = tmp_path / "vsrc"
        sink, ckpt = tmp_path / "vsink", tmp_path / "vckpt"
        spark.createDataFrame(
            [(100, [1.0, 0.0, 0.0, 0.0]), (101, [0.0, 0.0, 1.0, 0.0])],
            "vec_id: long, embedding: array<float>",
        ).coalesce(1).write.parquet(str(src / "d1.parquet"))

        q = stream_semantic_dedup(
            spark, str(src), str(sink), str(ckpt), base
        )
        q.awaitTermination(120)
        got = {r.vec_id: r.is_semantic_dup
               for r in spark.read.parquet(str(sink)).collect()}
        assert got == {100: 1, 101: 0}

        spark.createDataFrame(
            [(200, [0.0, 1.0, 0.0, 0.0])],
            "vec_id: long, embedding: array<float>",
        ).coalesce(1).write.parquet(str(src / "d2.parquet"))
        q = stream_semantic_dedup(
            spark, str(src), str(sink), str(ckpt), base
        )
        q.awaitTermination(120)
        got = {r.vec_id: r.is_semantic_dup
               for r in spark.read.parquet(str(sink)).collect()}
        assert got == {100: 1, 101: 0, 200: 1}
    finally:
        base.unpersist()


def test_stream_span_probe_scores_quoted_content(spark, tmp_path):
    """Streaming span probe: a delta doc quoting a 20-token corpus run
    gets exact coverage of the quote; a novel doc scores zero. A later
    file is probed in its own micro-batch against the same persisted
    index."""
    from etl_validator_github_spark.scale.dedup import build_span_index
    from etl_validator_github_spark.streaming.corpus import stream_span_probe

    corpus = spark.createDataFrame(
        [(0, GOOD, "en"), (1, GOOD2, "en")],
        "doc_id: long, text: string, lang: string",
    )
    idx = build_span_index(corpus).persist()
    try:
        src = tmp_path / "spsrc"
        sink, ckpt = tmp_path / "spsink", tmp_path / "spckpt"
        quote = " ".join(f"tok{i}" for i in range(5, 25))    # 20 of GOOD
        quoting = quote + " " + " ".join(f"tail{i}" for i in range(10))
        novel = " ".join(f"fresh{i}" for i in range(25))
        _write_docs(spark, str(src / "d1.parquet"),
                    [(100, quoting), (101, novel)])

        q = stream_span_probe(spark, str(src), str(sink), str(ckpt), idx)
        q.awaitTermination(120)
        got = {r.doc_id: (r.n_hit_windows, r.covered_tokens)
               for r in spark.read.parquet(str(sink)).collect()}
        # tokens 1-20 of doc 100 are a verbatim corpus run → its single
        # fully-inside 20-token window hits, covering exactly 20 tokens.
        assert got[100] == (1, 20)
        assert got[101] == (0, 0)

        _write_docs(spark, str(src / "d2.parquet"), [(200, GOOD)])
        q2 = stream_span_probe(spark, str(src), str(sink), str(ckpt), idx)
        q2.awaitTermination(120)
        got2 = {r.doc_id: (r.n_hit_windows, r.covered_tokens)
                for r in spark.read.parquet(str(sink)).collect()}
        assert got2[200] == (11, 30)    # exact re-send: every window hits
        assert len(got2) == 3           # earlier files not re-probed
        # Rows are stamped with their micro-batch id (the
        # stream_cms_counters convention) so a reader can dedup a
        # redelivered batch by (batch_id, doc_id).
        bids = {r.doc_id: r.batch_id
                for r in spark.read.parquet(str(sink)).collect()}
        assert bids[100] == bids[101] == 0
        assert bids[200] > bids[100]
    finally:
        idx.unpersist()


def test_stream_incremental_dedup_exactly_once_across_restarts(spark, tmp_path):
    """The checkpoint makes file processing exactly-once across stream
    restarts: re-running over the same source adds nothing; a file
    landing between runs is probed exactly once."""
    from etl_validator_github_spark.scale.dedup import build_dedup_index
    from etl_validator_github_spark.streaming.corpus import (
        stream_incremental_dedup,
    )

    corpus = spark.createDataFrame(
        [(0, GOOD, "en")], "doc_id: long, text: string, lang: string"
    )
    hashes, bands = build_dedup_index(corpus)
    hashes, bands = hashes.persist(), bands.persist()
    try:
        src = tmp_path / "rsrc"
        sink, ckpt = tmp_path / "rsink", tmp_path / "rckpt"
        _write_docs(spark, str(src / "d1.parquet"), [(100, GOOD)])

        for _ in range(2):   # second run must be a no-op (checkpointed)
            q = stream_incremental_dedup(
                spark, str(src), str(sink), str(ckpt), hashes, bands
            )
            q.awaitTermination(120)
        assert spark.read.parquet(str(sink)).count() == 1

        _write_docs(spark, str(src / "d2.parquet"), [(200, GOOD2)])
        q = stream_incremental_dedup(
            spark, str(src), str(sink), str(ckpt), hashes, bands
        )
        q.awaitTermination(120)
        rows = spark.read.parquet(str(sink)).collect()
        assert sorted(r.doc_id for r in rows) == [100, 200]
    finally:
        hashes.unpersist()
        bands.unpersist()


def test_stream_cms_counter_log_folds_to_batch_grid(spark, tmp_path):
    """Streaming CMS: the deduped-then-summed counter log equals the
    single-pass grid over the union, and re-appending a batch's cells
    UNDER ITS OWN batch_id (redelivery) changes nothing — while the
    naive sum without the batch-id dedup would double-count."""
    from pyspark.sql import functions as F

    from etl_validator_github_spark.scale.sketches import (
        cms_counters,
        cms_point_query,
    )
    from etl_validator_github_spark.scale.text import tokens
    from etl_validator_github_spark.streaming.corpus import (
        cms_log_counters,
        stream_cms_counters,
    )

    DOC_SCHEMA = ("doc_id: long, text: string, lang: string, "
                  "source: string, n_chars: long")
    src, cdir, ckpt = tmp_path / "csrc", tmp_path / "cgrid", tmp_path / "cck"
    d1 = [(i, "alpha beta gamma", "en", "s0", 16) for i in range(20)]
    d2 = [(100 + i, "beta delta", "en", "s1", 10) for i in range(30)]
    spark.createDataFrame(d1, DOC_SCHEMA).write.parquet(str(src / "b1"))
    spark.createDataFrame(d2, DOC_SCHEMA).write.parquet(str(src / "b2"))

    q = stream_cms_counters(spark, str(src), str(cdir), str(ckpt))
    q.awaitTermination(120)

    union = spark.createDataFrame(d1 + d2, DOC_SCHEMA)
    expect_grid = {
        (r["row"], r["bucket"]): r["n"]
        for r in cms_counters(
            union.select(F.explode(tokens()).alias("tok"))
        ).collect()
    }
    got_grid = {(r["row"], r["bucket"]): r["n"]
                for r in cms_log_counters(spark, str(cdir)).collect()}
    assert got_grid == expect_grid

    # Point estimates off the streamed grid: beta appears 50x, delta 30x.
    probes = spark.createDataFrame([("beta",), ("delta",)], "tok: string")
    ests = {r["tok"]: r["n_est"]
            for r in cms_point_query(
                cms_log_counters(spark, str(cdir)), probes).collect()}
    assert ests["beta"] >= 50 and ests["delta"] >= 30

    # Redelivery: re-append batch 0's cells under batch_id 0 → no-op.
    log = spark.read.parquet(str(cdir))
    log.filter(log.batch_id == 0).write.mode("append").parquet(str(cdir))
    again = {(r["row"], r["bucket"]): r["n"]
             for r in cms_log_counters(spark, str(cdir)).collect()}
    assert again == expect_grid


def test_stream_bloom_probe_flags_contaminated_docs(spark, tmp_path):
    """Streaming Bloom gate: a delta doc quoting held-out content is
    flagged with its true overlapping shingles hitting (no false
    negatives); a novel doc with no set bits in common passes clean.
    Batch/stream parity: the sink rows equal the batch bloom_probe of
    the same docs. A later file probes in its own micro-batch."""
    from etl_validator_github_spark.scale.dedup import _doc_shingles
    from etl_validator_github_spark.scale.sketches import (
        bloom_build, bloom_probe,
    )

    heldout = spark.createDataFrame(
        [(0, GOOD, "en")], "doc_id: long, text: string, lang: string"
    )
    bloom = bloom_build(
        _doc_shingles(heldout).select("shingle").distinct()
    ).persist()
    try:
        src = tmp_path / "blsrc"
        sink, ckpt = tmp_path / "blsink", tmp_path / "blckpt"
        quote = " ".join(f"tok{i}" for i in range(5, 15))    # 10 of GOOD
        quoting = quote + " " + " ".join(f"tail{i}" for i in range(10))
        novel = " ".join(f"fresh{i}" for i in range(25))
        _write_docs(spark, str(src / "d1.parquet"),
                    [(100, quoting), (101, novel)])

        q = stream_bloom_probe(spark, str(src), str(sink), str(ckpt), bloom)
        q.awaitTermination(120)
        got = {r.doc_id: (r.n_shingles, r.n_bloom_hits, r.flagged)
               for r in spark.read.parquet(str(sink)).collect()}
        # 10 quoted tokens → 6 verbatim 5-shingles must all hit.
        assert got[100][2] == 1 and got[100][1] >= 6
        assert got[101] == (21, 0, 0)

        # Parity with the batch operator over the same delta docs.
        delta = spark.createDataFrame(
            [(100, quoting, "en"), (101, novel, "en")],
            "doc_id: long, text: string, lang: string",
        )
        batch = {r.doc_id: (r.n_shingles, r.n_bloom_hits, r.flagged)
                 for r in bloom_probe(
                     _doc_shingles(delta).distinct(), bloom).collect()}
        assert got == batch

        _write_docs(spark, str(src / "d2.parquet"), [(200, GOOD)])
        q2 = stream_bloom_probe(spark, str(src), str(sink), str(ckpt), bloom)
        q2.awaitTermination(120)
        got2 = {r.doc_id: r.flagged
                for r in spark.read.parquet(str(sink)).collect()}
        assert got2[200] == 1           # exact re-send: every shingle hits
        assert len(got2) == 3           # earlier files not re-probed
        # batch_id stamp: redelivery-dedup key for sink readers.
        bids = {r.doc_id: r.batch_id
                for r in spark.read.parquet(str(sink)).collect()}
        assert bids[100] == bids[101] == 0 and bids[200] > 0
    finally:
        bloom.unpersist()


def test_stream_perplexity_gate_scores_and_routes(spark, tmp_path):
    """Streaming CCNet-style gate: micro-batch docs are scored by the
    caller-owned reference LM with batch parity (same nll as the batch
    operator given the same ref slice); a fluent-under-the-ref doc
    keeps, a gibberish doc is cut by the cutoff, and a no-transition
    doc lands with NULL score and keep=false. A second file scores in
    its own micro-batch with its batch_id stamped."""
    from etl_validator_github_spark.scale.text import bigram_lm_score
    from etl_validator_github_spark.streaming.corpus import (
        stream_perplexity_gate,
    )

    ref = spark.createDataFrame(
        [(0, GOOD, "en")], "doc_id: long, text: string, lang: string"
    ).persist()
    try:
        src = tmp_path / "ppsrc"
        sink, ckpt = tmp_path / "ppsink", tmp_path / "ppckpt"
        fluent = " ".join(f"tok{i}" for i in range(12))   # ref bigrams
        gibberish = " ".join(f"zz{i}" for i in range(12))  # all OOV
        _write_docs(spark, str(src / "d1.parquet"),
                    [(100, fluent), (101, gibberish), (102, "solo")])

        q = stream_perplexity_gate(spark, str(src), str(sink), str(ckpt),
                                   ref, nll_cutoff_milli=4000)
        q.awaitTermination(120)
        got = {r.doc_id: r for r in spark.read.parquet(str(sink)).collect()}
        assert bool(got[100].keep) and not bool(got[101].keep)
        assert got[102].nll_bits_milli is None and not bool(got[102].keep)

        # Batch parity: same scores as bigram_lm_score on the same docs.
        delta = spark.createDataFrame(
            [(100, fluent, "x"), (101, gibberish, "x")],
            "doc_id: long, text: string, source: string",
        )
        batch = {r.doc_id: r.nll_bits_milli
                 for r in bigram_lm_score(delta, ref_docs=ref).collect()}
        assert {d: got[d].nll_bits_milli for d in (100, 101)} == batch

        _write_docs(spark, str(src / "d2.parquet"), [(200, fluent)])
        q2 = stream_perplexity_gate(spark, str(src), str(sink), str(ckpt),
                                    ref, nll_cutoff_milli=4000)
        q2.awaitTermination(120)
        rows = spark.read.parquet(str(sink)).collect()
        assert {r.doc_id for r in rows} == {100, 101, 102, 200}
        b200 = [r.batch_id for r in rows if r.doc_id == 200][0]
        assert b200 > max(r.batch_id for r in rows if r.doc_id != 200)
    finally:
        ref.unpersist()


def test_stream_novelty_probe_scores_against_reference(spark, tmp_path):
    """Streaming novelty probe: a doc copying reference text scores 0
    novelty, a fresh doc scores 1000, a half-quote lands in between;
    a later file probes in its own micro-batch against the same
    persisted index, rows carry batch_id."""
    from etl_validator_github_spark.scale.text import build_novelty_index
    from etl_validator_github_spark.streaming.corpus import (
        stream_novelty_probe,
    )

    ref = spark.createDataFrame(
        [(0, GOOD, "en")], "doc_id: long, text: string, lang: string"
    )
    idx = build_novelty_index(ref).persist()
    try:
        src = tmp_path / "nvsrc"
        sink, ckpt = tmp_path / "nvsink", tmp_path / "nvckpt"
        novel = " ".join(f"fresh{i}" for i in range(30))
        # 20 reference tokens then 10 fresh: windows fully inside the
        # quote are known, windows crossing/after it are novel.
        half = " ".join(f"tok{i}" for i in range(20)) + " " + \
            " ".join(f"new{i}" for i in range(10))
        _write_docs(spark, str(src / "d1.parquet"),
                    [(100, GOOD), (101, novel), (102, half)])

        q = stream_novelty_probe(spark, str(src), str(sink), str(ckpt), idx)
        q.awaitTermination(120)
        got = {r.doc_id: (r.n_windows, r.n_novel, r.novelty_milli)
               for r in spark.read.parquet(str(sink)).collect()}
        assert got[100] == (26, 0, 0)          # verbatim reference copy
        assert got[101] == (26, 26, 1000)      # fully novel
        # doc 102: 30 tokens → 26 windows; the 16 windows fully inside
        # tok0..tok19 are reference windows, the other 10 are novel.
        assert got[102] == (26, 10, 384)

        _write_docs(spark, str(src / "d2.parquet"), [(200, novel)])
        q2 = stream_novelty_probe(spark, str(src), str(sink), str(ckpt), idx)
        q2.awaitTermination(120)
        rows = spark.read.parquet(str(sink)).collect()
        assert len(rows) == 4                  # earlier files not re-probed
        bids = {r.doc_id: r.batch_id for r in rows}
        assert bids[200] > bids[100]
    finally:
        idx.unpersist()


def test_stream_postings_maintenance_matches_batch_bm25(spark, tmp_path):
    """Incrementally-built postings (two micro-batches) must score
    BM25 identically to the batch pipeline over the union of the docs,
    and a redelivered batch's duplicate appends must not change the
    read (first-batch-wins dedup)."""
    from etl_validator_github_spark.scale.text import (
        bm25_from_postings,
        bm25_topk,
        doc_postings,
    )
    from etl_validator_github_spark.streaming.corpus import (
        read_postings_log,
        stream_postings_maintenance,
    )

    queries = ((1, "tok1 other3"), (2, "tok2"))
    src = tmp_path / "pgsrc"
    plog, ckpt = tmp_path / "pglog", tmp_path / "pgckpt"
    _write_docs(spark, str(src / "d1.parquet"), [(0, GOOD), (1, GOOD2)])
    q = stream_postings_maintenance(spark, str(src), str(plog), str(ckpt))
    q.awaitTermination(120)
    _write_docs(spark, str(src / "d2.parquet"),
                [(2, GOOD + " extra"), (3, "tok1 tok1 tok2 plus more")])
    q2 = stream_postings_maintenance(spark, str(src), str(plog), str(ckpt))
    q2.awaitTermination(120)

    all_docs = spark.createDataFrame(
        [(0, GOOD), (1, GOOD2), (2, GOOD + " extra"),
         (3, "tok1 tok1 tok2 plus more")],
        "doc_id: long, text: string",
    )
    want = sorted(map(tuple, bm25_topk(all_docs, queries).collect()))
    got = sorted(map(tuple, bm25_from_postings(
        read_postings_log(spark, str(plog)), queries).collect()))
    assert got == want and len(got) > 0

    # Simulate a redelivery: re-append batch 0's postings under a new
    # batch_id — the deduped read must be unchanged.
    import pyspark.sql.functions as F
    first = spark.createDataFrame([(0, GOOD), (1, GOOD2)],
                                  "doc_id: long, text: string")
    doc_postings(first).withColumn("batch_id", F.lit(99)) \
        .write.mode("append").parquet(str(plog))
    got2 = sorted(map(tuple, bm25_from_postings(
        read_postings_log(spark, str(plog)), queries).collect()))
    assert got2 == want

    # Simulate a foreachBatch RETRY: the sink append committed but the
    # checkpoint offset didn't, so the batch re-runs under the SAME
    # batch_id — byte-identical rows must collapse, not double tf.
    doc_postings(first).withColumn("batch_id", F.lit(0)) \
        .write.mode("append").parquet(str(plog))
    got3 = sorted(map(tuple, bm25_from_postings(
        read_postings_log(spark, str(plog)), queries).collect()))
    assert got3 == want


def test_stream_classifier_counts_match_batch_weights(spark, tmp_path):
    """Incrementally-streamed sufficient statistics (two micro-batches
    + a restart) must fold to EXACTLY the batch-trained classifier
    weight table and occurrence prior over the union of the docs, and
    a redelivered batch must not change the fold (first-batch-wins)."""
    from etl_validator_github_spark.scale.text import (
        labeled_docs,
        classifier_prior_from_counts,
        classifier_weights_from_counts,
        doc_token_counts,
        quality_classifier_weights,
    )
    from etl_validator_github_spark.streaming.corpus import (
        read_classifier_counts_log,
        stream_classifier_counts,
    )

    soup = "the of and to in a " * 5          # 30 stopword tokens → label 0
    rows1 = [(0, GOOD), (1, soup.strip())]
    rows2 = [(2, GOOD2), (3, (GOOD + " " + soup).strip())]
    src = tmp_path / "clsrc"
    clog, ckpt = tmp_path / "cllog", tmp_path / "clckpt"
    _write_docs(spark, str(src / "d1.parquet"), rows1)
    q = stream_classifier_counts(spark, str(src), str(clog), str(ckpt))
    q.awaitTermination(120)
    _write_docs(spark, str(src / "d2.parquet"), rows2)
    q2 = stream_classifier_counts(spark, str(src), str(clog), str(ckpt))
    q2.awaitTermination(120)

    all_docs = spark.createDataFrame(
        [(i, t, "en", "crawl", len(t)) for i, t in rows1 + rows2],
        "doc_id: long, text: string, lang: string, source: string,"
        " n_chars: long",
    )
    lab = labeled_docs(all_docs)
    want_w = sorted(map(tuple, quality_classifier_weights(lab).collect()))
    assert len(want_w) > 0  # stopwords repeat past the vocab prune

    log = read_classifier_counts_log(spark, str(clog))
    got_w = sorted(map(tuple, classifier_weights_from_counts(log).collect()))
    assert got_w == want_w

    want_p = classifier_prior_from_counts(doc_token_counts(lab)).collect()
    got_p = classifier_prior_from_counts(log).collect()
    assert [tuple(r) for r in got_p] == [tuple(r) for r in want_p]

    # Redelivery: re-append batch-1 docs' counts under a new batch_id —
    # the first-batch-wins fold must be unchanged.
    import pyspark.sql.functions as F
    first = spark.createDataFrame(
        [(i, t, "en", "crawl", len(t)) for i, t in rows1],
        "doc_id: long, text: string, lang: string, source: string,"
        " n_chars: long",
    )
    doc_token_counts(labeled_docs(first)).withColumn(
        "batch_id", F.lit(99)
    ).write.mode("append").parquet(str(clog))
    got_w2 = sorted(map(tuple, classifier_weights_from_counts(
        read_classifier_counts_log(spark, str(clog))).collect()))
    assert got_w2 == want_w

    # foreachBatch RETRY: the batch re-runs under the SAME batch_id
    # (sink append committed, offset not) — counts merge by SUM, so
    # the byte-identical copies must collapse, not double tf.
    doc_token_counts(labeled_docs(first)).withColumn(
        "batch_id", F.lit(0)
    ).write.mode("append").parquet(str(clog))
    got_w3 = sorted(map(tuple, classifier_weights_from_counts(
        read_classifier_counts_log(spark, str(clog))).collect()))
    assert got_w3 == want_w


def test_stream_ivf_index_maintenance_matches_in_memory(spark, tmp_path):
    """Streamed assignment log (two micro-batches + restart) served
    through ivf_topk_from_assignment must equal the in-memory ivf_topk
    over the union; retry (same batch_id) and redelivery (new
    batch_id) replays must not change the fold."""
    import pyspark.sql.functions as F
    from etl_validator_github_spark.scale.similarity import (
        home_cell_assignment,
        ivf_topk,
        ivf_topk_from_assignment,
        persist_ivf_cells,
        quantized,
    )
    from etl_validator_github_spark.streaming.corpus import (
        read_ivf_assignment_log,
        stream_ivf_index_maintenance,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    idx = str(tmp_path / "ivfidx")
    # Cells-only bootstrap: the stream owns every assignment row.
    persist_ivf_cells(emb, idx)

    src = tmp_path / "vecsrc"
    wave1 = emb.filter(F.col("vec_id") % 2 == 0).select("vec_id", "embedding")
    wave2 = emb.filter(F.col("vec_id") % 2 == 1).select("vec_id", "embedding")
    wave1.coalesce(1).write.parquet(str(src / "w1.parquet"))
    q = stream_ivf_index_maintenance(spark, str(src), idx,
                                     str(tmp_path / "ck"))
    q.awaitTermination(120)
    wave2.coalesce(1).write.parquet(str(src / "w2.parquet"))
    q2 = stream_ivf_index_maintenance(spark, str(src), idx,
                                      str(tmp_path / "ck"))
    q2.awaitTermination(120)

    cells = spark.read.parquet(f"{idx}/cells.parquet")
    live = read_ivf_assignment_log(spark, idx)
    got = sorted(map(tuple, ivf_topk_from_assignment(live, cells).collect()))
    want = sorted(map(tuple, ivf_topk(emb).collect()))
    assert got == want and len(got) > 0

    # Retry (same batch_id 0) and redelivery (new batch_id 99) of
    # wave 1's assignment rows — the deduped fold must be unchanged.
    for replay_id in (0, 99):
        home_cell_assignment(quantized(wave1), cells).withColumn(
            "batch_id", F.lit(replay_id)
        ).write.mode("append").parquet(f"{idx}/assign_log.parquet")
    live2 = read_ivf_assignment_log(spark, idx)
    got2 = sorted(map(tuple, ivf_topk_from_assignment(live2, cells).collect()))
    assert got2 == want


def test_stream_classifier_gate_closes_the_loop(spark, tmp_path):
    """End-to-end classifier loop: train from the streamed counts log,
    then score a fresh document stream with the folded weights — the
    streamed verdicts must equal the batch scorer's on the same docs."""
    from etl_validator_github_spark.scale.text import (
        classifier_prior_from_counts,
        classifier_weights_from_counts,
        labeled_docs,
        quality_classifier_score,
    )
    from etl_validator_github_spark.streaming.corpus import (
        read_classifier_counts_log,
        stream_classifier_counts,
        stream_classifier_gate,
    )

    soup = ("the of and to in a " * 5).strip()
    train_rows = [(0, GOOD), (1, soup), (2, GOOD2), (3, GOOD + " " + soup)]
    src1 = tmp_path / "trainsrc"
    clog = tmp_path / "cntlog"
    _write_docs(spark, str(src1 / "d1.parquet"), train_rows)
    q = stream_classifier_counts(spark, str(src1), str(clog),
                                 str(tmp_path / "ck1"))
    q.awaitTermination(120)

    log = read_classifier_counts_log(spark, str(clog)).persist()
    try:
        weights = classifier_weights_from_counts(log).persist()
        prior = classifier_prior_from_counts(log).persist()

        score_rows = [(10, GOOD2 + " tail"), (11, soup + " " + soup)]
        src2, sink = tmp_path / "scoresrc", tmp_path / "scoresink"
        _write_docs(spark, str(src2 / "s1.parquet"), score_rows)
        g = stream_classifier_gate(spark, str(src2), str(sink),
                                   str(tmp_path / "ck2"), weights, prior)
        g.awaitTermination(120)

        got = {
            r["doc_id"]: (r["n_hits"], r["score_micro"], r["keep"])
            for r in spark.read.parquet(str(sink)).collect()
        }
        batch_docs = spark.createDataFrame(
            [(i, t, "en", "crawl", len(t)) for i, t in score_rows],
            "doc_id: long, text: string, lang: string, source: string,"
            " n_chars: long",
        )
        want = {
            r["doc_id"]: (
                r["n_hits"], r["score_micro"],
                int(r["score_micro"] >= r["prior_micro"]),
            )
            for r in quality_classifier_score(
                labeled_docs(batch_docs), weights, prior).collect()
        }
        assert got == want and len(got) == 2
    finally:
        log.unpersist()


def test_compact_log_preserves_fold_and_shrinks(spark, tmp_path):
    """Compaction folds the log once (batch_id 0) and must be invisible
    to readers — including against LATE replays of pre-compaction
    batches arriving after the compaction ran."""
    import glob

    from etl_validator_github_spark.scale.text import (
        classifier_weights_from_counts,
        doc_token_counts,
        labeled_docs,
    )
    from etl_validator_github_spark.streaming.corpus import (
        compact_log,
        read_classifier_counts_log,
        stream_classifier_counts,
    )

    soup = ("the of and to in a " * 5).strip()
    src = tmp_path / "csrc"
    clog = tmp_path / "clog"
    _write_docs(spark, str(src / "d1.parquet"), [(0, GOOD), (1, soup)])
    q = stream_classifier_counts(spark, str(src), str(clog),
                                 str(tmp_path / "ck"))
    q.awaitTermination(120)
    _write_docs(spark, str(src / "d2.parquet"), [(2, GOOD2)])
    q2 = stream_classifier_counts(spark, str(src), str(clog),
                                  str(tmp_path / "ck"))
    q2.awaitTermination(120)

    want = sorted(map(tuple, classifier_weights_from_counts(
        read_classifier_counts_log(spark, str(clog))).collect()))
    files_before = len(glob.glob(f"{clog}/*.parquet"))

    compact_log(spark, str(clog), key_col="doc_id", n_files=1)
    files_after = len(glob.glob(f"{clog}/*.parquet"))
    assert files_after <= files_before
    got = sorted(map(tuple, classifier_weights_from_counts(
        read_classifier_counts_log(spark, str(clog))).collect()))
    assert got == want

    # LATE replay of the pre-compaction batch 0 (same id) and a
    # redelivery under a new id — both must lose first-batch-wins to
    # the compacted generation... except batch_id 0 TIES the compacted
    # generation; its rows are byte-identical to a SUBSET fold, so
    # distinct absorbs exact copies and differing tf would be a bug in
    # the source, not the log. Use ids 3 and 99 (post-compaction ids).
    import pyspark.sql.functions as F
    first = spark.createDataFrame(
        [(0, GOOD, "en", "crawl", len(GOOD))],
        "doc_id: long, text: string, lang: string, source: string,"
        " n_chars: long",
    )
    for replay_id in (3, 99):
        doc_token_counts(labeled_docs(first)).withColumn(
            "batch_id", F.lit(replay_id)
        ).write.mode("append").parquet(str(clog))
    got2 = sorted(map(tuple, classifier_weights_from_counts(
        read_classifier_counts_log(spark, str(clog))).collect()))
    assert got2 == want


def test_unified_index_serves_batch_plus_streamed_vectors(spark, tmp_path):
    """The split-brain trap: bootstrap with persist_ivf_index (base in
    assign.parquet), stream a delta (assign_log.parquet) — serving via
    ivf_topk_from_index must see BOTH stores and equal the in-memory
    ivf_topk over the union."""
    import pyspark.sql.functions as F
    from etl_validator_github_spark.scale.similarity import (
        ivf_topk,
        ivf_topk_from_index,
        persist_ivf_index,
    )
    from etl_validator_github_spark.streaming.corpus import (
        stream_ivf_index_maintenance,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    base = emb.filter(F.col("vec_id") % 3 != 0)
    delta = emb.filter(F.col("vec_id") % 3 == 0).select(
        "vec_id", "embedding"
    )
    idx = str(tmp_path / "mixidx")
    persist_ivf_index(base, emb, idx)
    src = tmp_path / "mixsrc"
    delta.coalesce(1).write.parquet(str(src / "d1.parquet"))
    q = stream_ivf_index_maintenance(spark, str(src), idx,
                                     str(tmp_path / "mixck"),
                                     np_assign=True)
    q.awaitTermination(120)

    got = sorted(map(tuple, ivf_topk_from_index(spark, idx).collect()))
    want = sorted(map(tuple, ivf_topk(emb).collect()))
    assert got == want and len(got) > 0


def test_compact_log_recovers_from_mid_swap_crash(spark, tmp_path):
    """A crash between compact_log's two renames leaves the log absent
    with a complete .old- aside; the next run must restore it and
    compact normally."""
    import os

    from etl_validator_github_spark.scale.text import (
        classifier_weights_from_counts,
    )
    from etl_validator_github_spark.streaming.corpus import (
        compact_log,
        read_classifier_counts_log,
        stream_classifier_counts,
    )

    src = tmp_path / "rsrc"
    clog = tmp_path / "rlog"
    _write_docs(spark, str(src / "d1.parquet"), [(0, GOOD), (1, GOOD2)])
    q = stream_classifier_counts(spark, str(src), str(clog),
                                 str(tmp_path / "rck"))
    q.awaitTermination(120)
    want = sorted(map(tuple, classifier_weights_from_counts(
        read_classifier_counts_log(spark, str(clog))).collect()))

    # Simulate the crash window: log moved aside, swap never finished.
    os.rename(str(clog), f"{clog}.old-deadbeef")
    os.makedirs(f"{clog}.gen-stale")          # aborted staging too
    compact_log(spark, str(clog), key_col="doc_id", n_files=1)
    got = sorted(map(tuple, classifier_weights_from_counts(
        read_classifier_counts_log(spark, str(clog))).collect()))
    assert got == want
    assert not os.path.exists(f"{clog}.old-deadbeef")
    assert not os.path.exists(f"{clog}.gen-stale")


def test_restore_log_aside_runs_from_readers_and_writers(spark, tmp_path):
    """ADVICE r10 (medium): a compact_log crash between its two renames
    leaves the log as a complete .old- aside. Every reader entry point
    must restore it, and a RESTARTED maintenance stream must restore it
    before its first append — otherwise write.mode('append') recreates
    the log with only the new batch and pre-crash rows go dark."""
    import os

    from etl_validator_github_spark.scale.text import (
        classifier_weights_from_counts,
    )
    from etl_validator_github_spark.streaming.corpus import (
        read_classifier_counts_log,
        stream_classifier_counts,
    )

    src = tmp_path / "asrc"
    clog = tmp_path / "alog"
    _write_docs(spark, str(src / "d1.parquet"), [(0, GOOD), (1, GOOD2)])
    q = stream_classifier_counts(spark, str(src), str(clog),
                                 str(tmp_path / "ack"))
    q.awaitTermination(120)
    want = sorted(map(tuple, classifier_weights_from_counts(
        read_classifier_counts_log(spark, str(clog))).collect()))

    # Reader restores the aside.
    os.rename(str(clog), f"{clog}.old-cafe01")
    got = sorted(map(tuple, classifier_weights_from_counts(
        read_classifier_counts_log(spark, str(clog))).collect()))
    assert got == want and os.path.exists(str(clog))

    # Restarted stream restores the aside BEFORE appending: after a new
    # micro-batch the log holds pre-crash rows AND the new batch.
    os.rename(str(clog), f"{clog}.old-cafe02")
    _write_docs(spark, str(src / "d2.parquet"), [(2, GOOD)])
    q2 = stream_classifier_counts(spark, str(src), str(clog),
                                  str(tmp_path / "ack"))
    q2.awaitTermination(120)
    folded = read_classifier_counts_log(spark, str(clog))
    assert not os.path.exists(f"{clog}.old-cafe02")
    assert sorted(r["doc_id"] for r in
                  folded.select("doc_id").distinct().collect()) == [0, 1, 2]


def test_compact_log_merges_aside_with_recreated_log(spark, tmp_path):
    """The silent-data-loss window the ADVICE named: crash aside on
    disk AND a recreated log (e.g. an out-of-tree writer appended
    without the restore preamble). compact_log must MERGE-FOLD the
    aside instead of purging it."""
    import os

    import pyspark.sql.functions as F
    from etl_validator_github_spark.scale.text import (
        doc_token_counts,
        labeled_docs,
    )
    from etl_validator_github_spark.streaming.corpus import (
        compact_log,
        read_classifier_counts_log,
        stream_classifier_counts,
    )

    src = tmp_path / "msrc"
    clog = tmp_path / "mlog"
    _write_docs(spark, str(src / "d1.parquet"), [(0, GOOD), (1, GOOD2)])
    q = stream_classifier_counts(spark, str(src), str(clog),
                                 str(tmp_path / "mck"))
    q.awaitTermination(120)

    # Crash window: log renamed aside; then a writer recreates the log
    # holding ONLY a new batch (bypassing the restore preamble).
    os.rename(str(clog), f"{clog}.old-dead01")
    fresh = spark.createDataFrame(
        [(2, GOOD, "en", "crawl", len(GOOD))],
        "doc_id: long, text: string, lang: string, source: string,"
        " n_chars: long",
    )
    doc_token_counts(labeled_docs(fresh)).withColumn(
        "batch_id", F.lit(7)
    ).write.mode("append").parquet(str(clog))

    compact_log(spark, str(clog), key_col="doc_id", n_files=1)
    assert not os.path.exists(f"{clog}.old-dead01")
    folded = read_classifier_counts_log(spark, str(clog))
    assert sorted(r["doc_id"] for r in
                  folded.select("doc_id").distinct().collect()) == [0, 1, 2]


def test_unified_index_reader_restores_log_aside(spark, tmp_path):
    """ADVICE r10 (low): read_ivf_index_assignment must not conclude
    batch-only while a crashed compaction's assign_log aside sits on
    disk — that would silently truncate every candidate set."""
    import os

    import pyspark.sql.functions as F
    from etl_validator_github_spark.scale.similarity import (
        ivf_topk,
        ivf_topk_from_index,
        persist_ivf_index,
    )
    from etl_validator_github_spark.streaming.corpus import (
        stream_ivf_index_maintenance,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    base = emb.filter(F.col("vec_id") % 3 != 0)
    delta = emb.filter(F.col("vec_id") % 3 == 0).select(
        "vec_id", "embedding"
    )
    idx = str(tmp_path / "aside_idx")
    persist_ivf_index(base, emb, idx)
    src = tmp_path / "aside_src"
    delta.coalesce(1).write.parquet(str(src / "d1.parquet"))
    q = stream_ivf_index_maintenance(spark, str(src), idx,
                                     str(tmp_path / "aside_ck"),
                                     np_assign=True)
    q.awaitTermination(120)

    log_p = f"{idx}/assign_log.parquet"
    os.rename(log_p, f"{log_p}.old-beef01")  # crashed compaction
    got = sorted(map(tuple, ivf_topk_from_index(spark, idx).collect()))
    want = sorted(map(tuple, ivf_topk(emb).collect()))
    assert got == want and os.path.exists(log_p)


import pytest


@pytest.mark.parametrize("k", [1, 2, 5])
def test_streamed_classifier_fold_matches_batch_across_splits(
        spark, tmp_path, k):
    """The fold-level loop-closure property (r10 verdict item 6): a
    corpus streamed in k micro-batches through stream_classifier_counts
    AND compacted must yield bit-identical weights and prior to the
    one-shot batch training path — k-batch == 1-batch, through the
    compaction rewrite."""
    from etl_validator_github_spark.scale.text import (
        classifier_prior_from_counts,
        classifier_weights_from_counts,
        doc_token_counts,
        labeled_docs,
        quality_classifier_weights,
    )
    from etl_validator_github_spark.streaming.corpus import (
        compact_log,
        read_classifier_counts_log,
        stream_classifier_counts,
    )

    soup = ("the of and to in a " * 5).strip()
    texts = [GOOD, GOOD2, soup, GOOD + " " + soup, GOOD2 + " extra pad"]
    rows = [(i, texts[i % len(texts)]) for i in range(10)]
    src = tmp_path / f"ksrc{k}"
    clog, ckpt = tmp_path / f"klog{k}", tmp_path / f"kck{k}"
    # One availableNow run per chunk forces exactly k micro-batches.
    for j in range(k):
        _write_docs(spark, str(src / f"d{j}.parquet"), rows[j::k])
        q = stream_classifier_counts(spark, str(src), str(clog),
                                     str(ckpt))
        q.awaitTermination(120)
    compact_log(spark, str(clog), key_col="doc_id", n_files=1)

    all_docs = spark.createDataFrame(
        [(i, t, "en", "crawl", len(t)) for i, t in rows],
        "doc_id: long, text: string, lang: string, source: string,"
        " n_chars: long",
    )
    lab = labeled_docs(all_docs)
    want_w = sorted(map(tuple, quality_classifier_weights(lab).collect()))
    want_p = [tuple(r) for r in
              classifier_prior_from_counts(doc_token_counts(lab)).collect()]
    assert len(want_w) > 0

    log = read_classifier_counts_log(spark, str(clog))
    got_w = sorted(map(tuple,
                       classifier_weights_from_counts(log).collect()))
    got_p = [tuple(r) for r in classifier_prior_from_counts(log).collect()]
    assert got_w == want_w
    assert got_p == want_p


@pytest.mark.parametrize("kill_after", [0, 1, 2, 3, 4])
def test_compact_log_every_kill_point_converges(spark, tmp_path,
                                                monkeypatch, kill_after):
    """Exhaustive kill-point property for compact_log's swap (the CDC
    discipline): with a PRE-EXISTING .old- aside on disk (the
    merge-fold path active), crash after each filesystem op in the
    real choreography — 0 = gen staged only, 1 = after log→old, 2 =
    after gen→log, 3 = after rmtree(old), 4 = no crash — then rerun
    compact_log. Every interleaving must converge to the same fold
    with no .old-/.gen- leftovers and no lost rows."""
    import os
    import shutil

    import pyspark.sql.functions as F
    from etl_validator_github_spark.scale.text import (
        doc_token_counts,
        labeled_docs,
    )
    from etl_validator_github_spark.streaming.corpus import (
        compact_log,
        read_classifier_counts_log,
    )

    def counts_for(rows, batch_id):
        df = spark.createDataFrame(
            [(i, t, "en", "crawl", len(t)) for i, t in rows],
            "doc_id: long, text: string, lang: string, source: string,"
            " n_chars: long",
        )
        return doc_token_counts(labeled_docs(df)).withColumn(
            "batch_id", F.lit(batch_id))

    clog = str(tmp_path / f"kl{kill_after}")
    counts_for([(0, GOOD), (1, GOOD2)], 0).write.mode(
        "append").parquet(clog)
    counts_for([(2, GOOD)], 1).write.mode("append").parquet(clog)
    # Pre-existing aside from an earlier crashed compaction: holds a
    # doc the live log has never seen — purging it would lose doc 3.
    counts_for([(3, GOOD2)], 5).write.parquet(f"{clog}.old-pre")
    want = [0, 1, 2, 3]

    class Killed(Exception):
        pass

    ops = {"n": 0}
    real_rename, real_rmtree = os.rename, shutil.rmtree

    def kill_then(fn):
        def wrapped(*a, **kw):
            if ops["n"] >= kill_after:
                raise Killed()
            ops["n"] += 1
            return fn(*a, **kw)
        return wrapped

    monkeypatch.setattr(os, "rename", kill_then(real_rename))
    monkeypatch.setattr(shutil, "rmtree", kill_then(real_rmtree))
    try:
        compact_log(spark, clog, key_col="doc_id", n_files=1)
        crashed = False
    except Killed:
        crashed = True
    monkeypatch.setattr(os, "rename", real_rename)
    monkeypatch.setattr(shutil, "rmtree", real_rmtree)
    assert crashed == (kill_after < 4)

    # Recovery: one successful compaction converges from every state.
    compact_log(spark, clog, key_col="doc_id", n_files=1)
    folded = read_classifier_counts_log(spark, clog)
    got = sorted(r["doc_id"] for r in
                 folded.select("doc_id").distinct().collect())
    assert got == want
    leftovers = [p for p in os.listdir(tmp_path)
                 if p.startswith(f"kl{kill_after}.")]
    assert leftovers == []


def test_restore_log_aside_merges_multiple_asides(spark, tmp_path):
    """Two coexisting asides (double crash): restoring only the newest
    would serve a log missing every row unique to the older one —
    restore_log_aside must merge them all back (r11 review finding)."""
    import os

    import pyspark.sql.functions as F
    from etl_validator_github_spark.scale.text import (
        doc_token_counts,
        labeled_docs,
    )
    from etl_validator_github_spark.streaming.corpus import (
        read_classifier_counts_log,
        restore_log_aside,
    )

    def counts_for(rows, batch_id):
        df = spark.createDataFrame(
            [(i, t, "en", "crawl", len(t)) for i, t in rows],
            "doc_id: long, text: string, lang: string, source: string,"
            " n_chars: long",
        )
        return doc_token_counts(labeled_docs(df)).withColumn(
            "batch_id", F.lit(batch_id))

    clog = str(tmp_path / "multi")
    # Older aside: the original full log (docs 0, 1).
    counts_for([(0, GOOD), (1, GOOD2)], 0).write.parquet(
        f"{clog}.old-aaaa")
    # Newer aside: a recreated log holding only a later batch (doc 2).
    counts_for([(2, GOOD)], 7).write.parquet(f"{clog}.old-bbbb")
    os.utime(f"{clog}.old-bbbb")  # ensure strictly newer mtime

    restore_log_aside(clog)
    assert os.path.exists(clog)
    assert not os.path.exists(f"{clog}.old-aaaa")
    assert not os.path.exists(f"{clog}.old-bbbb")
    folded = read_classifier_counts_log(spark, clog)
    assert sorted(r["doc_id"] for r in
                  folded.select("doc_id").distinct().collect()) == [0, 1, 2]
