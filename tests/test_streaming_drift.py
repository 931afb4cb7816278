"""Streaming drift monitor: exact KS core + batch↔stream agreement.

The KS core is hand-checked against closed-form cases, then the
Structured Streaming monitor (streaming/drift.py) is fed the testdata
events and must agree row-for-row with the batch scorecard computed
from the same finalized windows — the monitor-vs-backfill contract.
"""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from etl_validator_github_spark.functions.stats import ks_vs_reference
from etl_validator_github_spark.queries.relational import load_events
from etl_validator_github_spark.streaming.drift import (
    reference_histogram,
    score_windows,
    stream_value_drift,
    windowed_value_counts,
)


def test_ks_core_closed_form_cases(spark):
    # Reference: uniform over {1, 2} (1 each).
    ref = spark.createDataFrame([(1, 1), (2, 1)], "v long, n_ref long")
    # Group A: same shape scaled 5× → identical CDFs → KS = 0.
    # Group B: all mass on 1 → CDFs (1.0 vs 0.5) at v=1 → KS = 0.5.
    counts = spark.createDataFrame(
        [("A", 1, 5), ("A", 2, 5), ("B", 1, 10)],
        "g string, v long, n long",
    )
    got = {r["g"]: (r["n_window"], r["n_ref"], r["ks_micro"])
           for r in ks_vs_reference(counts, ref, ["g"]).collect()}
    assert got == {"A": (10, 2, 0), "B": (10, 2, 500000)}


def test_ks_core_matches_brute_force(spark):
    # Arbitrary histograms, KS recomputed in pure Python over the
    # merged axis with exact fractions.
    from fractions import Fraction

    ref_h = {3: 4, 7: 1, 9: 2}
    win_h = {1: 2, 7: 3, 10: 1}
    ref = spark.createDataFrame(list(ref_h.items()), "v long, n_ref long")
    counts = spark.createDataFrame(
        [("w", v, n) for v, n in win_h.items()], "g string, v long, n long"
    )
    axis = sorted(set(ref_h) | set(win_h))
    n_l, n_r = sum(win_h.values()), sum(ref_h.values())
    cl = cr = 0
    best = Fraction(0)
    for v in axis:
        cl += win_h.get(v, 0)
        cr += ref_h.get(v, 0)
        best = max(best, abs(Fraction(cl, n_l) - Fraction(cr, n_r)))
    want = (best.numerator * 1_000_000) // best.denominator
    [row] = ks_vs_reference(counts, ref, ["g"]).collect()
    assert (row["n_window"], row["n_ref"], row["ks_micro"]) == (
        n_l, n_r, want)


def test_streaming_drift_matches_batch_scorecard(spark, sf_dir, tmp_path):
    src, sink, ckpt, refd = (tmp_path / "src", tmp_path / "sink",
                             tmp_path / "ckpt", tmp_path / "ref")
    src.mkdir()

    ev = load_events(spark, sf_dir).select(
        "event_id",
        F.expr("ts_us div 1000000").alias("ts_s"),
        "user_id", "event_type", "value",
    )
    rows = ev.collect()
    with open(src / "events.json", "w") as f:
        for r in rows:
            f.write(json.dumps(r.asDict()) + "\n")

    # Freeze the reference profile from the same corpus (the "golden
    # snapshot" role) and persist it where the monitor reads it.
    reference_histogram(ev).write.parquet(str(refd))

    q = stream_value_drift(
        spark, str(src), str(refd), str(sink), str(ckpt),
        window="1 hour", watermark="1 hour", available_now=True,
    )
    q.awaitTermination(180)

    streamed = {
        r["window_start"]: (r["n_window"], r["n_ref"], r["ks_micro"])
        for r in spark.read.parquet(str(sink)).collect()
    }
    assert streamed, "watermark finalized no windows"

    # Batch scorecard over the SAME second-precision rows; the stream
    # only emits watermark-finalized windows, so compare value-for-value
    # on the streamed set and require full coverage strictly below the
    # watermark horizon (max event time − 1h).
    counts = (
        ev.select(
            F.timestamp_seconds(F.expr("(ts_s div 3600) * 3600"))
            .alias("window_start"),
            F.round(F.col("value") * 100).cast("long").alias("v"),
        )
        .groupBy("window_start", "v")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    ref = spark.read.parquet(str(refd))
    batch = {
        r["window_start"]: (r["n_window"], r["n_ref"], r["ks_micro"])
        for r in score_windows(counts, ref).collect()
    }
    for w, got in streamed.items():
        assert got == batch[w], (w, got, batch[w])
    horizon = max(r["ts_s"] for r in rows) - 3600
    finalized = {w for w in batch
                 if w.timestamp() + 3600 < horizon}
    assert finalized <= set(streamed), (
        sorted(finalized - set(streamed)))


def test_windowed_value_counts_schema(spark):
    df = spark.createDataFrame(
        [(1, 1_000_000, 1, "click", 1.25)],
        "event_id long, ts_s long, user_id long, event_type string,"
        " value double",
    )
    out = windowed_value_counts(df)
    assert out.columns == ["window_start", "v", "n"]


def test_ks_sparse_equals_dense(spark):
    """The r13 sparse change-point evaluation (counts_within_ref=True)
    must return EXACTLY the dense merged-grid result whenever its
    premise holds — randomized histograms where every group value is
    drawn from the reference domain, including groups missing most of
    the domain, single-value groups, and heavy ties at the extremes."""
    import random

    rng = random.Random(13)
    domain = sorted(rng.sample(range(-50, 200), 40))
    ref_rows = [(v, rng.randint(1, 9)) for v in domain]
    ref = spark.createDataFrame(ref_rows, "v long, n_ref long")
    counts_rows = []
    for g in range(12):
        vals = rng.sample(domain, rng.randint(1, len(domain)))
        counts_rows += [(f"g{g}", v, rng.randint(1, 7)) for v in vals]
    counts_rows += [("solo", domain[0], 3), ("edge", domain[-1], 1)]
    counts = spark.createDataFrame(counts_rows, "g string, v long, n long")

    def key(rows):
        return sorted(tuple(r) for r in rows)

    dense = key(ks_vs_reference(counts, ref, ["g"]).collect())
    sparse = key(ks_vs_reference(counts, ref, ["g"],
                                 counts_within_ref=True).collect())
    assert sparse == dense


def test_ks_sparse_premise_violation_fails_loudly(spark):
    """counts_within_ref=True with a counts value ABSENT from ref must
    raise (r14 guard, ADVICE r13) — the old inner join silently dropped
    the row and returned plausible wrong statistics."""
    import pytest

    ref = spark.createDataFrame([(1, 5), (2, 5)], "v long, n_ref long")
    counts = spark.createDataFrame(
        [("g0", 1, 3), ("g0", 7, 2)], "g string, v long, n long"
    )
    with pytest.raises(Exception, match="missing from the reference"):
        ks_vs_reference(counts, ref, ["g"],
                        counts_within_ref=True).collect()
