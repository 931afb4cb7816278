"""Streaming corpus ingestion (streaming/corpus.py): quality gate +
content-hash dedup must behave identically to the batch pipeline, and
re-delivered document files must deduplicate across micro-batches."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_validator_github_spark.streaming.corpus import stream_corpus_ingest

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
