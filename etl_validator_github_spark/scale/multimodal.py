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


def _multimodal_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return extract_features(attach_payload(docs))


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


MULTIMODAL_QUERIES: dict[str, Query] = {
    "multimodal_features": Query(
        "multimodal_features", _multimodal_q, _MULTIMODAL_SQL,
        "Arrow-batched mapInPandas binary plumbing with md5-derived fake "
        "decoder features (decode stubbed; no codecs in container).",
    )
}
