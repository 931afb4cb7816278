"""Streaming CDC apply (streaming/cdc.py): the changelog stream
maintained into a keyed parquet state, across micro-batches, with
within-batch last-op-wins, deletes, retry idempotence, and the
generation swap leaving no stale directories behind."""

from __future__ import annotations

import json
import os


def _write(path, name, rows):
    path.mkdir(parents=True, exist_ok=True)
    with open(path / name, "w") as f:
        for key, seq, op, payload in rows:
            f.write(json.dumps(
                {"key": key, "seq": seq, "op": op, "payload": payload}
            ) + "\n")


def _state(spark, state_dir):
    return {r["key"]: (r["seq"], r["payload"])
            for r in spark.read.parquet(str(state_dir)).collect()}


def test_cdc_apply_across_batches_with_deletes(spark, tmp_path):
    from etl_validator_github_spark.streaming.cdc import stream_cdc_apply

    src = tmp_path / "log"
    state, ckpt = tmp_path / "state", tmp_path / "ckpt"
    # Batch 1: adds, plus an in-batch update (key 2 → v2b wins by seq).
    _write(src, "01.json", [
        (1, 10, "A", "v1"), (2, 11, "A", "v2"), (2, 12, "C", "v2b"),
        (3, 13, "A", "v3"),
    ])
    q = stream_cdc_apply(spark, str(src), str(state), str(ckpt))
    q.awaitTermination(120)
    assert _state(spark, state) == {
        1: (10, "v1"), 2: (12, "v2b"), 3: (13, "v3")}

    # Batch 2 (separate file → separate micro-batch): update 1,
    # delete 3, add 4.
    _write(src, "02.json", [
        (1, 20, "C", "v1b"), (3, 21, "D", None), (4, 22, "A", "v4"),
    ])
    q2 = stream_cdc_apply(spark, str(src), str(state), str(ckpt))
    q2.awaitTermination(120)
    assert _state(spark, state) == {
        1: (20, "v1b"), 2: (12, "v2b"), 4: (22, "v4")}

    # No stale generation directories after the swaps.
    stale = [d for d in os.listdir(tmp_path)
             if d.startswith("state.gen-") or d.startswith("state.old-")]
    assert stale == []


def test_cdc_batch_application_is_idempotent(spark):
    """foreachBatch may retry a batch: applying the same changelog
    batch to its own output must be a no-op."""
    from etl_validator_github_spark.streaming.cdc import (
        apply_changelog_batch,
    )

    batch = spark.createDataFrame(
        [(1, 10, "A", "v1"), (2, 11, "A", "v2"), (2, 12, "D", None)],
        "key long, seq long, op string, payload string",
    )
    once = apply_changelog_batch(None, batch)
    twice = apply_changelog_batch(once, batch)
    assert sorted(map(tuple, once.collect())) \
        == sorted(map(tuple, twice.collect())) == [(1, 10, "v1")]


def test_cdc_matches_batch_changelog_semantics(spark, tmp_path):
    """Streamed application over N batches equals ONE batch application
    of the concatenated changelog — the batch/stream parity pin."""
    from etl_validator_github_spark.streaming.cdc import (
        apply_changelog_batch,
        stream_cdc_apply,
    )

    rows1 = [(k, k * 2, "A", f"v{k}") for k in range(6)]
    rows2 = [(0, 100, "D", None), (1, 101, "C", "v1x"),
             (9, 102, "A", "v9")]
    src = tmp_path / "log2"
    state, ckpt = tmp_path / "state2", tmp_path / "ckpt2"
    _write(src, "01.json", rows1)
    _write(src, "02.json", rows2)
    q = stream_cdc_apply(spark, str(src), str(state), str(ckpt))
    q.awaitTermination(120)

    full = spark.createDataFrame(
        rows1 + rows2, "key long, seq long, op string, payload string"
    )
    want = {r["key"]: (r["seq"], r["payload"])
            for r in apply_changelog_batch(None, full).collect()}
    assert _state(spark, state) == want
