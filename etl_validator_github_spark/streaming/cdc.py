"""Streaming CDC apply: a changelog stream (the reference's
RecordOperation A/C/D semantics, DM_bankfile_validate_pipeline's
changelog model — see queries/relational.py::changelog_latest_state for
the batch twin) maintained into a KEYED PARQUET STATE TABLE.

Per micro-batch, inside ``foreachBatch``:

1. reduce the batch to one winning row per key (max (seq) — the batch
   may carry several ops for one key);
2. ``state' = (state ANTI JOIN batch-keys) ∪ (batch winners where op ≠
   'D')`` — two keyed joins, work ∝ |state| + |batch|;
3. write ``state'`` to a fresh generation directory and swap it in by
   rename (write-aside then rename-swap — the crash-safe choreography
   ``streaming/events.py::compact_registers`` uses). The swap itself is
   two renames, so a crash BETWEEN them leaves no live ``state_dir`` —
   ``_recover_state_dir`` closes that window: on every batch (and so on
   restart) a missing ``state_dir`` with a leftover ``.old-<id>`` aside
   is restored by renaming the aside back, and stale ``.gen-*`` staged
   dirs (partial or complete-but-unswapped) are deleted before the
   retried batch rebuilds them. Net effect: a crash at ANY point leaves
   either the old or the new generation recoverable, never a partial,
   and the foreachBatch retry converges (re-applying the same batch is
   a no-op by construction).

Applying the SAME batch twice is a no-op by construction (the anti-join
removes exactly the keys the union re-adds), so foreachBatch retries
are safe without sink transactions.

At 100 TB the state rewrite is the cost: a real deployment partitions
the state by key range and rewrites only partitions the batch touches
(or uses a table format with MERGE). The operator keeps the full
rewrite for clarity; the join shapes are the part that carries.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Changelog feed schema: key, monotone sequence, op ∈ A/C/D, payload.
CDC_STREAM_SCHEMA = "key long, seq long, op string, payload string"


def apply_changelog_batch(state: DataFrame | None,
                          batch: DataFrame) -> DataFrame:
    """One CDC application step (pure, testable): latest op per key
    wins within the batch; 'D' removes the key, 'A'/'C' upsert."""
    w = F.max(F.struct("seq", "op", "payload")).alias("__w")
    winners = (
        batch.groupBy("key").agg(w)
        .select("key", F.col("__w.seq").alias("seq"),
                F.col("__w.op").alias("op"),
                F.col("__w.payload").alias("payload"))
    )
    upserts = winners.filter(F.col("op") != "D") \
        .select("key", "seq", "payload")
    if state is None:
        return upserts
    untouched = state.join(winners.select("key"), "key", "left_anti")
    return untouched.unionByName(upserts)


def _recover_state_dir(state_dir: str) -> None:
    """Heal the rename-swap crash window before applying a batch.

    If the process died between ``os.rename(state_dir, old)`` and
    ``os.rename(staged, state_dir)`` there is no live ``state_dir`` but
    a complete previous generation sits at ``state_dir.old-<id>`` —
    restore it (highest id wins if several somehow accumulated).
    Leftover ``state_dir.gen-<id>`` staging dirs are stale regardless of
    completeness (the retried batch rebuilds its stage from scratch) and
    leftover ``.old-<id>`` asides next to a LIVE state_dir are the
    post-swap crash window — both are deleted.
    """
    parent = os.path.dirname(state_dir) or "."
    base = os.path.basename(state_dir)
    if not os.path.isdir(parent):
        return
    asides, staged = [], []
    for entry in os.listdir(parent):
        path = os.path.join(parent, entry)
        if entry.startswith(f"{base}.old-"):
            asides.append(path)
        elif entry.startswith(f"{base}.gen-"):
            staged.append(path)
    if not os.path.exists(state_dir) and asides:
        def _gen_id(p: str) -> int:
            try:
                return int(p.rsplit("-", 1)[1])
            except ValueError:
                return -1
        asides.sort(key=_gen_id)
        os.rename(asides.pop(), state_dir)
    for path in asides + staged:
        shutil.rmtree(path, ignore_errors=True)


def _swap_generation(state_dir: str, staged: str, batch_id: int) -> None:
    """Rename-swap next to the live dir (same filesystem): old aside,
    new in, old deleted last — a crash at ANY point leaves a whole
    generation for ``_recover_state_dir`` to restore or keep
    (exhaustively pinned by the kill-point test in
    tests/test_streaming_cdc.py)."""
    old = f"{state_dir}.old-{batch_id}"
    if os.path.exists(state_dir):
        os.rename(state_dir, old)
    os.rename(staged, state_dir)
    shutil.rmtree(old, ignore_errors=True)


def apply_batch_to_dir(spark, batch_df: DataFrame, state_dir: str,
                       batch_id: int) -> None:
    """One foreachBatch application against the parquet state table:
    heal any crash window, apply the changelog step, stage the new
    generation, swap it in. Idempotent under retries (re-applying the
    same batch is a no-op by construction)."""
    _recover_state_dir(state_dir)
    state = (
        spark.read.parquet(state_dir)
        if os.path.exists(state_dir) else None
    )
    new = apply_changelog_batch(state, batch_df)
    staged = f"{state_dir}.gen-{batch_id}"
    new.write.mode("overwrite").parquet(staged)
    _swap_generation(state_dir, staged, batch_id)


def stream_cdc_apply(
    spark,
    source_dir: str,
    state_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
):
    """Changelog file stream → maintained state table at ``state_dir``."""
    stream = (
        spark.readStream.schema(CDC_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(source_dir)
    )

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        apply_batch_to_dir(spark, batch_df, state_dir, batch_id)

    writer = stream.writeStream.foreachBatch(_apply).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
