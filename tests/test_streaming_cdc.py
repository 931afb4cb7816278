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


def test_cdc_recover_mid_swap_crash_restores_previous_generation(tmp_path):
    """Crash between os.rename(state_dir, old) and os.rename(staged,
    state_dir): no live state_dir, a complete previous generation at
    .old-<id>, a complete-but-unswapped stage at .gen-<id>.  Recovery
    must restore the aside (so the retried batch sees the maintained
    state, not None) and delete the stale stage."""
    from etl_validator_github_spark.streaming.cdc import _recover_state_dir

    state = tmp_path / "state"
    aside = tmp_path / "state.old-7"
    staged = tmp_path / "state.gen-7"
    aside.mkdir()
    (aside / "part-00000.parquet").write_bytes(b"previous-generation")
    staged.mkdir()
    (staged / "part-00000.parquet").write_bytes(b"unswapped-stage")

    _recover_state_dir(str(state))

    assert state.is_dir()
    assert (state / "part-00000.parquet").read_bytes() == b"previous-generation"
    assert not aside.exists()
    assert not staged.exists()


def test_cdc_recover_post_swap_crash_keeps_live_state(tmp_path):
    """Crash after the new generation swapped in but before the old
    aside was deleted: the live state_dir must be kept verbatim and the
    leftover aside removed."""
    from etl_validator_github_spark.streaming.cdc import _recover_state_dir

    state = tmp_path / "state"
    state.mkdir()
    (state / "part-00000.parquet").write_bytes(b"new-generation")
    aside = tmp_path / "state.old-3"
    aside.mkdir()
    (aside / "part-00000.parquet").write_bytes(b"old-generation")

    _recover_state_dir(str(state))

    assert (state / "part-00000.parquet").read_bytes() == b"new-generation"
    assert not aside.exists()


def test_cdc_stream_resumes_through_simulated_mid_swap_crash(spark, tmp_path):
    """End-to-end: run batch 1, simulate the mid-swap crash by hand
    (state_dir renamed aside, stage left behind), then run batch 2 on a
    fresh stream start — previously maintained keys must survive."""
    import shutil

    from etl_validator_github_spark.streaming.cdc import stream_cdc_apply

    src = tmp_path / "log"
    state, ckpt = tmp_path / "state", tmp_path / "ckpt"
    _write(src, "01.json", [(1, 10, "A", "v1"), (2, 11, "A", "v2")])
    q = stream_cdc_apply(spark, str(src), str(state), str(ckpt))
    q.awaitTermination(120)
    assert _state(spark, state) == {1: (10, "v1"), 2: (11, "v2")}

    # Simulate the crash window left by a died swap of batch 99.
    os.rename(state, tmp_path / "state.old-99")
    shutil.copytree(tmp_path / "state.old-99", tmp_path / "state.gen-99")

    _write(src, "02.json", [(2, 20, "D", None), (3, 21, "A", "v3")])
    q = stream_cdc_apply(spark, str(src), str(state), str(ckpt))
    q.awaitTermination(120)
    # Key 1 (maintained only by pre-crash generations) must survive.
    assert _state(spark, state) == {1: (10, "v1"), 3: (21, "v3")}
    leftovers = [p for p in os.listdir(tmp_path)
                 if p.startswith("state.old-") or p.startswith("state.gen-")]
    assert leftovers == []


import pytest


@pytest.mark.parametrize("kill_after", [0, 1, 2, 3])
def test_cdc_every_swap_kill_point_converges(spark, tmp_path, monkeypatch,
                                             kill_after):
    """Exhaustive kill-point property: crash the REAL swap choreography
    after each filesystem op in sequence (0 = stage written but no
    rename yet, 1 = after state→old, 2 = after staged→state, 3 = no
    crash), then retry the same batch through the real apply path.
    EVERY interleaving must converge to the same final state with no
    stale .old-/.gen- leftovers."""
    from etl_validator_github_spark.streaming import cdc

    state = tmp_path / "state"
    # Batch 0 establishes the previous generation normally.
    b0 = spark.createDataFrame(
        [(1, 10, "A", "v1"), (2, 11, "A", "v2")], cdc.CDC_STREAM_SCHEMA)
    cdc.apply_batch_to_dir(spark, b0, str(state), 0)
    assert _state(spark, state) == {1: (10, "v1"), 2: (11, "v2")}

    b1 = spark.createDataFrame(
        [(2, 20, "D", None), (3, 21, "A", "v3")], cdc.CDC_STREAM_SCHEMA)
    want = {1: (10, "v1"), 3: (21, "v3")}

    class Killed(Exception):
        pass

    ops = {"n": 0}
    real_rename, real_rmtree = os.rename, cdc.shutil.rmtree

    def kill_then(fn):
        def wrapped(*a, **kw):
            if ops["n"] >= kill_after:
                raise Killed()
            ops["n"] += 1
            return fn(*a, **kw)
        return wrapped

    monkeypatch.setattr(cdc.os, "rename", kill_then(real_rename))
    monkeypatch.setattr(cdc.shutil, "rmtree", kill_then(real_rmtree))
    try:
        cdc.apply_batch_to_dir(spark, b1, str(state), 1)
        crashed = False
    except Killed:
        crashed = True
    assert crashed == (kill_after < 3)
    monkeypatch.setattr(cdc.os, "rename", real_rename)
    monkeypatch.setattr(cdc.shutil, "rmtree", real_rmtree)

    # Invariant after recovery alone: a whole generation is live.
    cdc._recover_state_dir(str(state))
    live = _state(spark, state)
    assert live in ({1: (10, "v1"), 2: (11, "v2")}, want), live

    # The foreachBatch retry (same batch, same id) must converge.
    cdc.apply_batch_to_dir(spark, b1, str(state), 1)
    assert _state(spark, state) == want
    leftovers = [p for p in os.listdir(tmp_path)
                 if p.startswith("state.old-") or p.startswith("state.gen-")]
    assert leftovers == []
