"""Structured Streaming validation pipeline (streaming/pipeline.py).

Exercises the Spark-idiomatic replacement for the reference's polling
file-watch (DM_bankfile_validate_pipeline.py:1550-1588): files landing in
a ready directory flow through the rule engine into the pipe-CSV error
sink with exactly-once checkpointing and availableNow (catch-up-and-stop)
semantics.
"""

from __future__ import annotations

import glob

from pyspark.sql import functions as F

from etl_validator_github_spark.generator import generate_bankdata
from etl_validator_github_spark.operators import mutate
from etl_validator_github_spark.streaming.pipeline import BatchGuard, stream_validate


def _read_error_csvs(spark, error_dir):
    files = [f for f in glob.glob(f"{error_dir}/*.csv")]
    if not files:
        return None
    return (
        spark.read.option("header", True).option("sep", "|").csv(files)
    )


def test_stream_validate_available_now(spark, tmp_path):
    ready = str(tmp_path / "ready")
    errors = str(tmp_path / "errors")
    ckpt = str(tmp_path / "ckpt")

    df = generate_bankdata(spark, 20, seed=246)
    bad = mutate.overwrite_cells(
        df, {("PostalCode", 0): "123", ("PostalCode", 1): "@@@@@"},
        order_by="PayeeID",
    )
    bad.write.parquet(f"{ready}/mtfdm_dev2_dmbankdata_0001.parquet")

    q = stream_validate(spark, ready, errors, ckpt, available_now=True)
    q.awaitTermination(120)

    out = _read_error_csvs(spark, errors)
    assert out is not None, "error sink is empty"
    rows = {r["PayeeId"]: r["ERROR_DESC"] for r in out.collect()}
    assert len(rows) == 2
    assert all("PostalCode" in desc for desc in rows.values())

    # Second availableNow run: checkpoint marks the file as processed, so
    # nothing is re-emitted (exactly-once per file).
    q2 = stream_validate(spark, ready, errors, ckpt, available_now=True)
    q2.awaitTermination(120)
    assert _read_error_csvs(spark, errors).count() == 2

    # A newly landed file IS picked up incrementally.
    bad2 = mutate.overwrite_cells(
        df, {("RecordOperation", 3): "Z"}, order_by="PayeeID"
    )
    bad2.write.parquet(f"{ready}/mtfdm_dev2_dmbankdata_0002.parquet")
    q3 = stream_validate(spark, ready, errors, ckpt, available_now=True)
    q3.awaitTermination(120)
    out3 = _read_error_csvs(spark, errors)
    assert out3.count() == 3
    assert (
        out3.filter(F.col("ERROR_DESC").contains("RecordOperation")).count() == 1
    )


def test_batch_guard_state_machine(tmp_path):
    """Two strikes trip the breaker; success resets and clears the flag
    (reference PIPE:136-176 gate-guard semantics)."""
    import pytest

    g = BatchGuard(str(tmp_path / "guard"))
    assert not g.tripped()
    assert g.record_failure("reconcile mismatch") == 1
    assert not g.tripped()                      # one strike: still open
    assert g.record_failure("reconcile mismatch") == 2
    assert g.tripped()                          # two strikes: STOP flag
    with pytest.raises(RuntimeError, match="circuit breaker tripped"):
        g.refuse_if_tripped()
    g.record_success()
    assert not g.tripped()                      # operator-visible reset
    assert g.record_failure("again") == 1       # counter restarted


def test_stream_validate_refuses_batch_after_two_failed_reconciles(
    spark, tmp_path
):
    """E2E breaker: two batches whose reconcile reports failure trip the
    guard; the third batch is refused BEFORE writing (its errors never
    reach the sink), and clearing via record_success lets it through."""
    from pyspark.errors.exceptions.captured import StreamingQueryException

    ready = str(tmp_path / "ready")
    errors = str(tmp_path / "errors")
    ckpt = str(tmp_path / "ckpt")
    guard = BatchGuard(str(tmp_path / "guard"))

    df = generate_bankdata(spark, 10, seed=246)
    bad = mutate.overwrite_cells(
        df, {("PostalCode", 0): "123"}, order_by="PayeeID"
    )

    def run_one(idx):
        q = stream_validate(
            spark, ready, errors, ckpt, available_now=True,
            guard=guard, reconcile=lambda bdf, bid: False,
        )
        q.awaitTermination(120)

    bad.write.parquet(f"{ready}/mtfdm_dev2_dmbankdata_0001.parquet")
    run_one(1)                                  # strike 1 (batch written)
    bad.write.parquet(f"{ready}/mtfdm_dev2_dmbankdata_0002.parquet")
    run_one(2)                                  # strike 2 → STOP flag
    assert guard.tripped()
    n_before = _read_error_csvs(spark, errors).count()

    bad.write.parquet(f"{ready}/mtfdm_dev2_dmbankdata_0003.parquet")
    q = stream_validate(
        spark, ready, errors, ckpt, available_now=True,
        guard=guard, reconcile=lambda bdf, bid: False,
    )
    try:
        q.awaitTermination(120)
        raised = False
    except StreamingQueryException as exc:
        raised = True
        assert "batch refused" in str(exc)
    assert raised, "third batch must be refused while the breaker is tripped"
    # Refused before the write: the sink gained nothing.
    assert _read_error_csvs(spark, errors).count() == n_before

    # Operator clears the breaker → the SAME (uncommitted) batch replays
    # from the checkpoint and lands exactly once.
    guard.record_success()
    q2 = stream_validate(
        spark, ready, errors, ckpt, available_now=True,
        guard=guard, reconcile=lambda bdf, bid: True,
    )
    q2.awaitTermination(120)
    assert _read_error_csvs(spark, errors).count() == n_before + 1
    assert not guard.tripped()


def test_batch_guard_state_survives_restart(tmp_path):
    """A NEW BatchGuard instance over the same guard dir (a restarted
    driver) sees the prior strikes and the tripped flag — the file-based
    state is the restart-durability contract."""
    import pytest

    d = str(tmp_path / "guard")
    g1 = BatchGuard(d)
    g1.record_failure("first strike")
    g2 = BatchGuard(d)                  # "restarted" process
    assert g2.record_failure("second strike") == 2
    assert g2.tripped()
    g3 = BatchGuard(d)
    with pytest.raises(RuntimeError, match="circuit breaker tripped"):
        g3.refuse_if_tripped()
    g3.record_success()
    assert not BatchGuard(d).tripped()
