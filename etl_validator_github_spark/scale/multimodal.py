"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The pattern for image/audio/video at 100 TB: store media as an opaque
``binary`` column next to typed metadata, and run decode / feature
extraction as Arrow-batched pandas functions over ``mapInPandas`` —
Python touches each batch once, the plan stays distributed, and the
binary bytes never hit the driver.

This container has no image/audio libraries, so the actual decode step
is a clearly-marked stub (``decode_image`` raises NotImplementedError)
plus a deterministic fake feature extractor whose outputs are pure
functions of the payload's md5 — which makes the whole pipeline
oracle-checkable end-to-end even though the "decoder" is fake. The
Spark-side plumbing (schema, Arrow batch shape, UDF signatures,
partition behavior) is real and tested.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from etl_validator_github_spark.contract import Query, load
from etl_validator_github_spark.scale.dedup import COPY_OFFSET

PAYLOAD_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("payload", BinaryType()),
])

FEATURE_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("n_bytes", LongType()),
    StructField("content_hash", StringType()),
    StructField("fake_width", IntegerType()),
    StructField("fake_height", IntegerType()),
    StructField("fake_n_frames", IntegerType()),
])


def decode_image(payload: bytes):  # pragma: no cover - intentional stub
    """Decode an image payload to pixels.

    STUB: no image codec libraries exist in this environment. On a real
    cluster this is where PIL/libvips/ffmpeg decode one Arrow batch of
    payloads; the surrounding mapInPandas plumbing is identical.
    """
    raise NotImplementedError("image decoding requires codec libraries")


def attach_payload(docs: DataFrame) -> DataFrame:
    """documents → (doc_id, payload binary) via Arrow-batched mapInPandas.

    Payload is the UTF-8 document text — a deterministic stand-in for
    image bytes that keeps the pipeline verifiable.
    """

    def to_payload(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "payload": pdf["text"].map(lambda s: s.encode("utf-8")),
            })

    return docs.select("doc_id", "text").mapInPandas(to_payload, PAYLOAD_SCHEMA)


def extract_features(payloads: DataFrame) -> DataFrame:
    """Binary payload → deterministic fake media features.

    Width/height/frame-count derive from the payload md5, standing in
    for a real decoder's outputs (dimension probe, frame sampling).
    """

    def features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            hashes = pdf["payload"].map(lambda b: hashlib.md5(bytes(b)).hexdigest())
            h32 = hashes.map(lambda h: int(h[:8], 16))
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "n_bytes": pdf["payload"].map(len).astype("int64"),
                "content_hash": hashes,
                "fake_width": (1 + h32 % 1920).astype("int32"),
                "fake_height": (1 + h32 % 1080).astype("int32"),
                "fake_n_frames": (1 + h32 % 16).astype("int32"),
            })

    return payloads.mapInPandas(features, FEATURE_SCHEMA)


RESIZED_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("out_width", IntegerType()),
    StructField("out_height", IntegerType()),
    StructField("scale_num", LongType()),   # exact rational scale =
    StructField("scale_den", LongType()),   # target / max(w, h)
])

TARGET_EDGE = 256


def resize_images(features: DataFrame, target_edge: int = TARGET_EDGE) -> DataFrame:
    """Aspect-preserving resize metadata (longest edge → target).

    STUB decode: real pixel resampling needs codec libraries; here the
    stage computes the exact output geometry a resizer would use, as
    integer arithmetic (floor(dim * target / long_edge)), batch-wise
    over Arrow. The geometry math IS the production logic — only the
    pixel pass is fake. Scale is carried as an exact rational
    (target/long_edge) so downstream stays engine-exact.
    """

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            w = pdf["fake_width"].astype("int64")
            h = pdf["fake_height"].astype("int64")
            long_edge = w.combine(h, max)
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "out_width": (w * target_edge // long_edge).astype("int32"),
                "out_height": (h * target_edge // long_edge).astype("int32"),
                "scale_num": pd.Series([target_edge] * len(pdf)).astype("int64"),
                "scale_den": long_edge,
            })

    return features.select(
        "doc_id", "fake_width", "fake_height"
    ).mapInPandas(resize, RESIZED_SCHEMA)


FRAME_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("frame_idx", IntegerType()),
    StructField("frame_hash", StringType()),
])

FRAME_STRIDE = 4


def sample_frames(features: DataFrame, stride: int = FRAME_STRIDE) -> DataFrame:
    """Every ``stride``-th frame index per video payload (frame 0 always
    included) — the fan-out stage of a video pipeline. One output row
    per sampled frame; frame bytes are faked as md5(content_hash ||
    frame_idx) where a real decoder would emit the frame tensor. The
    fan-out happens inside the Arrow batch, so output partitioning
    follows the parent payload (no shuffle).
    """

    def frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, hashes = [], [], []
            for doc_id, n, chash in zip(
                pdf["doc_id"], pdf["fake_n_frames"], pdf["content_hash"]
            ):
                for i in range(0, int(n), stride):
                    ids.append(doc_id)
                    idxs.append(i)
                    hashes.append(
                        hashlib.md5(f"{chash}|{i}".encode()).hexdigest()
                    )
            yield pd.DataFrame({
                "doc_id": pd.Series(ids, dtype="int64"),
                "frame_idx": pd.Series(idxs, dtype="int32"),
                "frame_hash": pd.Series(hashes, dtype="object"),
            })

    return features.select(
        "doc_id", "fake_n_frames", "content_hash"
    ).mapInPandas(frames, FRAME_SCHEMA)


def frame_dedup_stats(frames: DataFrame) -> DataFrame:
    """Cross-video frame dedup: per video, how many of its sampled
    frames occur in ANY other video — the video counterpart of
    chunk-level text dedup (shared intros/outros/stock footage at
    production scale). Same two uniform-hash-key shuffles as
    ``chunk_dedup_stats``: a frame-hash count with map-side combine,
    then the per-video rollup.
    """
    counts = frames.groupBy("frame_hash").agg(
        F.count(F.lit(1)).alias("global_count")
    )
    per_video = (
        frames.join(counts, "frame_hash")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_frames"),
            F.sum((F.col("global_count") > 1).cast("int")).cast("int")
            .alias("n_shared_frames"),
        )
    )
    return per_video.select(
        "doc_id", "n_frames", "n_shared_frames",
        (F.col("n_shared_frames") / F.col("n_frames")).alias("shared_ratio"),
    )


def _multimodal_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return extract_features(attach_payload(docs))


def _resize_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return resize_images(extract_features(attach_payload(docs)))


def _frames_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return sample_frames(extract_features(attach_payload(docs)))


def _frame_dedup_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Partial copy injection: every 5th payload gets a duplicate, so the
    # fixture (which has no naturally identical videos) exercises BOTH
    # branches — copied videos share every frame, the rest share none.
    base = load(spark, sf_dir, "documents").select("doc_id", "text")
    copies = base.filter(F.col("doc_id") % 5 == 0).select(
        (F.col("doc_id") + COPY_OFFSET).alias("doc_id"), "text"
    )
    docs = base.unionAll(copies)
    return frame_dedup_stats(
        sample_frames(extract_features(attach_payload(docs)))
    )


# The oracle reproduces the fake decoder arithmetic in SQL: payload is
# the UTF-8 text (ASCII corpus → n_bytes == n_chars) and every feature is
# a pure function of md5(text).
_MULTIMODAL_SQL = """
WITH h AS (
  SELECT doc_id,
         CAST(length(text) AS BIGINT) AS n_bytes,
         md5(text) AS content_hash,
         CAST(concat('0x', substring(md5(text), 1, 8)) AS BIGINT) AS h32
  FROM documents
)
SELECT doc_id, n_bytes, content_hash,
       CAST(1 + h32 % 1920 AS INT) AS fake_width,
       CAST(1 + h32 % 1080 AS INT) AS fake_height,
       CAST(1 + h32 % 16 AS INT) AS fake_n_frames
FROM h
"""


_RESIZE_SQL = f"""
WITH h AS (
  SELECT doc_id,
         CAST(concat('0x', substring(md5(text), 1, 8)) AS BIGINT) AS h32
  FROM documents
), dims AS (
  SELECT doc_id,
         CAST(1 + h32 % 1920 AS BIGINT) AS w,
         CAST(1 + h32 % 1080 AS BIGINT) AS h
  FROM h
)
SELECT doc_id,
       CAST(w * {TARGET_EDGE} // greatest(w, h) AS INT) AS out_width,
       CAST(h * {TARGET_EDGE} // greatest(w, h) AS INT) AS out_height,
       CAST({TARGET_EDGE} AS BIGINT) AS scale_num,
       greatest(w, h) AS scale_den
FROM dims
"""

_FRAMES_SQL = f"""
WITH h AS (
  SELECT doc_id, md5(text) AS content_hash,
         CAST(concat('0x', substring(md5(text), 1, 8)) AS BIGINT) AS h32
  FROM documents
), meta AS (
  SELECT doc_id, content_hash, CAST(1 + h32 % 16 AS INT) AS n_frames
  FROM h
)
SELECT doc_id,
       CAST(i AS INT) AS frame_idx,
       md5(concat(content_hash, '|', CAST(i AS VARCHAR))) AS frame_hash
FROM meta, unnest(range(0, n_frames, {FRAME_STRIDE})) AS t(i)
"""

_FRAME_DEDUP_SQL = f"""
WITH all_docs AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + {COPY_OFFSET} AS doc_id, text FROM documents
  WHERE doc_id % 5 = 0
), h AS (
  SELECT doc_id, md5(text) AS content_hash,
         CAST(concat('0x', substring(md5(text), 1, 8)) AS BIGINT) AS h32
  FROM all_docs
), meta AS (
  SELECT doc_id, content_hash, CAST(1 + h32 % 16 AS INT) AS n_frames
  FROM h
), fr AS (
  SELECT doc_id,
         md5(concat(content_hash, '|', CAST(i AS VARCHAR))) AS frame_hash
  FROM meta, unnest(range(0, n_frames, {FRAME_STRIDE})) AS t(i)
), gc AS (
  SELECT frame_hash, COUNT(*) AS global_count FROM fr GROUP BY 1
), per_video AS (
  SELECT doc_id,
         CAST(COUNT(*) AS INT) AS n_frames,
         CAST(SUM(CASE WHEN global_count > 1 THEN 1 ELSE 0 END) AS INT)
           AS n_shared_frames
  FROM fr JOIN gc USING (frame_hash)
  GROUP BY 1
)
SELECT doc_id, n_frames, n_shared_frames,
       n_shared_frames / n_frames AS shared_ratio
FROM per_video
"""


MULTIMODAL_QUERIES: dict[str, Query] = {
    q.name: q
    for q in [
        Query("multimodal_features", _multimodal_q, _MULTIMODAL_SQL,
              "Arrow-batched mapInPandas binary plumbing with md5-derived "
              "fake decoder features (decode stubbed; no codecs in "
              "container)."),
        Query("multimodal_resize", _resize_q, _RESIZE_SQL,
              "Aspect-preserving resize geometry over mapInPandas (pixel "
              "pass stubbed; integer geometry exact)."),
        Query("multimodal_frame_sample", _frames_q, _FRAMES_SQL,
              "Strided video-frame sampling fan-out inside Arrow batches "
              "(no shuffle)."),
        Query("multimodal_frame_dedup", _frame_dedup_q, _FRAME_DEDUP_SQL,
              "Cross-video frame-hash dedup: per-video fraction of "
              "sampled frames repeated anywhere in the corpus (chunk-"
              "dedup shape on the frame stream)."),
    ]
}
