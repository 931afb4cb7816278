"""Custom Python DataSource (sources/synthdocs.py): registration,
determinism under re-partitioning, planted duplicates, and the Spark
4.1 pushFilters partition pruning."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_validator_github_spark.sources.synthdocs import (
    DUP_EVERY,
    SynthDocsReader,
    doc_row,
    register,
)


def _load(spark, **opts):
    register(spark)
    r = spark.read.format("synthdocs")
    for k, v in opts.items():
        r = r.option(k, v)
    return r.load()


def test_synthdocs_schema_count_and_determinism(spark):
    df = _load(spark, docs=997, docs_per_shard=100, seed=7)
    assert df.columns == ["doc_id", "shard", "text", "lang",
                          "source", "n_chars"]
    assert df.count() == 997
    # shard = doc_id // per_shard everywhere; last shard is partial.
    bad = df.filter(F.col("shard") != (F.col("doc_id") / 100)
                    .cast("int")).count()
    assert bad == 0
    # Two independent reads (different shard sizes → different
    # parallelism) agree row-for-row on the id-derived columns.
    a = {r.doc_id: (r.text, r.lang, r.source)
         for r in df.collect()}
    b = {r.doc_id: (r.text, r.lang, r.source)
         for r in _load(spark, docs=997, docs_per_shard=250,
                        seed=7).collect()}
    assert a == b
    # Pure-Python mirror of one row.
    did, text, lang, source, n_chars = doc_row(7, 500)
    assert a[500] == (text, lang, source)


def test_synthdocs_planted_duplicates_feed_dedup(spark):
    from etl_validator_github_spark.scale.dedup import exact_dedup_groups

    df = _load(spark, docs=400, docs_per_shard=97, seed=3)
    texts = {r.doc_id: r.text for r in df.collect()}
    for d in range(DUP_EVERY, 400, DUP_EVERY):
        assert texts[d] == texts[d - 1]
    groups = exact_dedup_groups(
        df.select("doc_id", "text", "lang")).collect()
    n_dups = sum(r.n_copies - 1 for r in groups)
    assert n_dups == len(range(DUP_EVERY, 400, DUP_EVERY))
    # Each planted pair keeps the ORIGINAL (lower) id.
    two = {r.keep_id for r in groups if r.n_copies == 2}
    assert two == {d - 1 for d in range(DUP_EVERY, 400, DUP_EVERY)}


def test_synthdocs_pushdown_prunes_partitions(spark):
    # Engine level: the filter prunes rows without a post-filter...
    df = _load(spark, docs=1000, docs_per_shard=100).filter(
        F.col("shard") == 2)
    got = df.agg(F.min("doc_id"), F.max("doc_id"),
                 F.count(F.lit(1))).collect()[0]
    assert tuple(got) == (200, 299, 100)
    # ...and unit level: pushFilters consumes the shard filter (returns
    # nothing back) and partitions() shrinks to exactly that shard.
    from pyspark.sql.datasource import EqualTo, GreaterThan, In

    rd = SynthDocsReader({"docs": "1000", "docs_per_shard": "100"})
    left = list(rd.pushFilters([EqualTo(("shard",), 2),
                                GreaterThan(("doc_id",), 5)]))
    assert [type(f) for f in left] == [GreaterThan]   # unsupported back
    assert [p.value for p in rd.partitions()] == [2]
    rd2 = SynthDocsReader({"docs": "1000", "docs_per_shard": "100"})
    assert list(rd2.pushFilters([In(("shard",), (1, 3))])) == []
    assert [p.value for p in rd2.partitions()] == [1, 3]


def test_synthdocs_fully_pruned_filter_returns_zero_rows(spark):
    """A shard predicate outside the shard range empties partitions();
    PySpark then calls read(None) once — it must yield nothing, not
    crash (plan_data_source_read substitutes [None] for an empty
    partition list)."""
    df = _load(spark, docs=200, docs_per_shard=100)  # shards 0..1
    assert df.filter(F.col("shard") == 7).count() == 0
    assert df.filter(F.col("shard").isin(5, 9)).count() == 0
    # unit level: empty partitions() + read(None) → no rows
    from pyspark.sql.datasource import EqualTo

    rd = SynthDocsReader({"docs": "200", "docs_per_shard": "100"})
    assert list(rd.pushFilters([EqualTo(("shard",), 7)])) == []
    assert rd.partitions() == []
    assert list(rd.read(None)) == []


def test_synthdocs_stream_drains_once_and_matches_batch(spark, tmp_path):
    """Streaming half: availableNow drains the bounded corpus through
    offset-ranged micro-batches into a parquet sink; the result equals
    the batch read row-for-row, and a checkpointed re-run adds
    nothing."""
    register(spark)
    sink = str(tmp_path / "ssink")
    ckpt = str(tmp_path / "sckpt")

    def run():
        q = (spark.readStream.format("synthdocs")
             .option("docs", 730).option("docs_per_shard", 100)
             .option("seed", 11).load()
             .writeStream.format("parquet")
             .option("path", sink).option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination(120)

    run()
    streamed = {tuple(r) for r in spark.read.parquet(sink).collect()}
    batch = {tuple(r) for r in _load(spark, docs=730, docs_per_shard=100,
                                     seed=11).collect()}
    assert streamed == batch and len(streamed) == 730

    run()                                       # checkpointed no-op
    assert spark.read.parquet(sink).count() == 730


def test_synthdocs_shingle_distribution_has_real_text_shape():
    """Distribution-shape guard (the r8 lesson institutionalized): the
    r7 1M-doc dedup numbers were invalid because the old token formula
    collapsed 134M 5-gram windows into 53k distinct shingles (df ~2400)
    and nothing asserted corpus shape. Pin the generator's shingle
    statistics on a 10k-doc sample so a future token-formula tweak
    cannot silently re-degenerate every shingle-keyed measurement
    (minhash, span dedup, PPJoin, Bloom, novelty).

    Bounds (measured: 99.94% distinct, max df 2 on originals; the old
    degenerate formula scores 4.5% distinct, max df 138 on the same
    sample — far outside, so this test fails on it):
      - >= 99% of 5-gram windows are distinct across the corpus,
      - no shingle appears in more than 4 documents.
    Pure-Python doc_row, no Spark needed.
    """
    from collections import Counter

    from etl_validator_github_spark.sources.synthdocs import (
        DUP_EVERY,
        doc_row,
    )

    K = 5
    df = Counter()
    windows = 0
    # Originals only: planted every-DUP_EVERY-th copies duplicate whole
    # texts BY DESIGN and would (correctly) double those docs' df.
    for doc_id in range(10_000):
        if doc_id % DUP_EVERY == 0 and doc_id > 0:
            continue
        toks = doc_row(246, doc_id)[1].split()
        windows += max(0, len(toks) - K + 1)
        for g in {" ".join(toks[i:i + K])
                  for i in range(len(toks) - K + 1)}:
            df[g] += 1

    distinct_share = len(df) / windows
    assert distinct_share >= 0.99, (
        f"shingle space degenerated: only {distinct_share:.2%} of "
        f"{windows} windows are distinct — re-check the token formula"
    )
    assert max(df.values()) <= 4, (
        f"max document frequency {max(df.values())} — shingle-keyed "
        "operators would fan out df^2 candidates per key"
    )
