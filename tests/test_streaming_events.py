"""Watermarked windowed aggregation on the events stream
(streaming/events.py).

Append mode + watermark semantics: a window is emitted only once the
watermark (max event time − delay) passes its end — that's also when its
state is dropped, the property that bounds state at production scale.
"""

from __future__ import annotations

import json

from etl_validator_github_spark.streaming.events import stream_windowed_rollup

H = 3600


def _write_events(path, rows):
    path.mkdir(parents=True, exist_ok=True)
    with open(path / "batch.json", "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def test_windowed_rollup_emits_finalized_windows(spark, tmp_path):
    src, sink, ckpt = tmp_path / "src", tmp_path / "sink", tmp_path / "ckpt"
    rows = []
    eid = 0
    # hour 0: 3 clicks; hour 1: 2 views; hour 3: 1 click (advances the
    # watermark far enough to finalize hours 0 and 1).
    for ts, et in [(10, "click"), (20, "click"), (30, "click"),
                   (H + 5, "view"), (H + 6, "view"),
                   (3 * H + 30, "click")]:
        rows.append({"event_id": eid, "ts_s": ts, "user_id": eid % 3,
                     "event_type": et, "value": 1.5})
        eid += 1
    _write_events(src, rows)

    q = stream_windowed_rollup(
        spark, str(src), str(sink), str(ckpt),
        window="1 hour", watermark="1 hour", available_now=True,
    )
    q.awaitTermination(120)

    out = spark.read.parquet(str(sink))
    got = {
        (r["window_start"].hour, r["event_type"]): (r["n_events"], r["value_total"])
        for r in out.collect()
    }
    # Hours 0 and 1 are below the watermark (max ts 3h − 1h = 2h) → emitted.
    assert got[(0, "click")] == (3, 4.5)
    assert got[(1, "view")] == (2, 3.0)
    # Hour 3 is NOT finalized yet in append mode.
    assert (3, "click") not in got


def _ev(eid, ts, user, et="click", value=1.0):
    return {"event_id": eid, "ts_s": ts, "user_id": user,
            "event_type": et, "value": value}


def test_stream_stream_join_matches_batch_range_join(spark, tmp_path):
    """The watermarked stream-stream join must produce exactly the rows
    the equivalent batch range-join finds on the same (on-time) data."""
    from pyspark.sql import functions as F

    from etl_validator_github_spark.streaming.events import (
        stream_click_view_join,
    )

    csrc, vsrc = tmp_path / "clicks", tmp_path / "views"
    sink, ckpt = tmp_path / "jsink", tmp_path / "jckpt"
    clicks = [_ev(1, 1000, 7), _ev(2, 5000, 7), _ev(3, 1200, 8)]
    views = [
        _ev(11, 500, 7, "view"),    # 500 s before click 1 → within 600 s
        _ev(12, 990, 7, "view"),    # 10 s before click 1 → match
        _ev(13, 4000, 7, "view"),   # 1000 s before click 2 → too old
        _ev(14, 1200, 8, "view"),   # same instant as click 3 → match
        _ev(15, 1100, 9, "view"),   # user with no clicks
    ]
    _write_events(csrc, clicks)
    _write_events(vsrc, views)
    q = stream_click_view_join(spark, str(csrc), str(vsrc),
                               str(sink), str(ckpt))
    q.awaitTermination(120)

    got = {(r.click_id, r.view_id, r.lag_s)
           for r in spark.read.parquet(str(sink)).collect()}
    assert got == {(1, 11, 500), (1, 12, 10), (3, 14, 0)}

    # Batch twin: same predicate on static frames — results identical.
    c = spark.createDataFrame([(e["event_id"], e["ts_s"], e["user_id"])
                               for e in clicks], "click_id long, cts long, user_id long")
    v = spark.createDataFrame([(e["event_id"], e["ts_s"], e["user_id"])
                               for e in views], "view_id long, vts long, vuser long")
    batch = (
        c.join(v, (F.col("user_id") == F.col("vuser"))
               & (F.col("vts") >= F.col("cts") - 600)
               & (F.col("vts") <= F.col("cts")))
        .select("click_id", "view_id", (F.col("cts") - F.col("vts")).alias("lag_s"))
    )
    assert {tuple(r) for r in batch.collect()} == got


def test_stream_stream_join_drops_late_views(spark, tmp_path):
    """Late-arrival semantics: once the checkpointed watermark has
    passed, a view older than the watermark must NOT join, even though
    a matching click exists — the state for that click is gone."""
    from etl_validator_github_spark.streaming.events import (
        stream_click_view_join,
    )

    csrc, vsrc = tmp_path / "lclicks", tmp_path / "lviews"
    sink, ckpt = tmp_path / "lsink", tmp_path / "lckpt"
    H = 3600
    # Run 1: a matched pair at t≈2h, plus t=6h traffic on both sides
    # advancing the watermark to 5h (watermark delay 1h).
    _write_events(csrc, [_ev(1, 2 * H, 7), _ev(2, 6 * H, 7)])
    _write_events(vsrc, [_ev(11, 2 * H - 60, 7, "view"),
                         _ev(12, 6 * H - 30, 7, "view")])
    q = stream_click_view_join(spark, str(csrc), str(vsrc),
                               str(sink), str(ckpt))
    q.awaitTermination(120)
    got1 = {(r.click_id, r.view_id)
            for r in spark.read.parquet(str(sink)).collect()}
    assert got1 == {(1, 11), (2, 12)}

    # Run 2 (same checkpoint): a view for click 1 arrives hours late —
    # its event time (2h) is far below the 5h watermark → dropped.
    with open(vsrc / "late.json", "w") as f:
        f.write(json.dumps(_ev(13, 2 * H - 30, 7, "view")) + "\n")
    q2 = stream_click_view_join(spark, str(csrc), str(vsrc),
                                str(sink), str(ckpt))
    q2.awaitTermination(120)
    got2 = {(r.click_id, r.view_id)
            for r in spark.read.parquet(str(sink)).collect()}
    assert got2 == got1, "late view must be discarded by the watermark"


def test_stream_stream_left_outer_emits_delayed_nulls(spark, tmp_path):
    """leftOuter semantics: an unmatched click emits (null view) only
    once the watermark proves no matching view can still arrive — in a
    later micro-batch than the click itself."""
    from etl_validator_github_spark.streaming.events import (
        stream_click_view_join,
    )

    csrc, vsrc = tmp_path / "oclicks", tmp_path / "oviews"
    sink, ckpt = tmp_path / "osink", tmp_path / "ockpt"
    H = 3600
    # click 1 (u7) has a view; click 2 (u8) never gets one.
    _write_events(csrc, [_ev(1, 1000, 7), _ev(2, 1200, 8)])
    _write_events(vsrc, [_ev(11, 900, 7, "view")])
    q = stream_click_view_join(spark, str(csrc), str(vsrc),
                               str(sink), str(ckpt),
                               join_type="leftOuter")
    q.awaitTermination(120)
    got1 = {(r.click_id, r.view_id)
            for r in spark.read.parquet(str(sink)).collect()}
    assert (1, 11) in got1
    # The unmatched click cannot be certain yet (watermark ≈ 1000 − 1h).
    assert (2, None) not in got1

    # Advance the watermark well past click 2's window on BOTH inputs
    # and trigger another run: the delayed null row must now flush.
    with open(csrc / "later.json", "w") as f:
        f.write(json.dumps(_ev(3, 6 * H, 9)) + "\n")
    with open(vsrc / "later.json", "w") as f:
        f.write(json.dumps(_ev(12, 6 * H - 30, 9, "view")) + "\n")
    q2 = stream_click_view_join(spark, str(csrc), str(vsrc),
                                str(sink), str(ckpt),
                                join_type="leftOuter")
    q2.awaitTermination(120)
    got2 = {(r.click_id, r.view_id)
            for r in spark.read.parquet(str(sink)).collect()}
    assert (2, None) in got2, got2
    assert (3, 12) in got2


def test_stream_dedup_drops_redelivered_ids(spark, tmp_path):
    from etl_validator_github_spark.streaming.events import stream_deduped_ingest

    src, sink, ckpt = tmp_path / "dsrc", tmp_path / "dsink", tmp_path / "dckpt"
    rows = [
        {"event_id": 1, "ts_s": 10, "user_id": 1, "event_type": "click", "value": 1.0},
        {"event_id": 2, "ts_s": 20, "user_id": 1, "event_type": "view", "value": 2.0},
        {"event_id": 1, "ts_s": 10, "user_id": 1, "event_type": "click", "value": 1.0},  # redelivery
        {"event_id": 3, "ts_s": 30, "user_id": 2, "event_type": "click", "value": 3.0},
        {"event_id": 2, "ts_s": 20, "user_id": 1, "event_type": "view", "value": 2.0},   # redelivery
    ]
    _write_events(src, rows)
    q = stream_deduped_ingest(spark, str(src), str(sink), str(ckpt))
    q.awaitTermination(120)
    out = spark.read.parquet(str(sink))
    ids = sorted(r.event_id for r in out.collect())
    assert ids == [1, 2, 3]


def test_stream_static_enrichment_matches_batch_and_flags_unknowns(
    spark, tmp_path
):
    """Stream-static broadcast join: per-segment windowed rollup equals
    the batch twin on finalized windows, and events whose user is
    absent from the dimension surface as segment='unknown' rather than
    dropping."""
    from pyspark.sql import functions as F

    from etl_validator_github_spark.streaming.events import (
        enriched_rollup,
        stream_enriched_rollup,
    )

    src, sink, ckpt = tmp_path / "esrc", tmp_path / "esink", tmp_path / "eckpt"
    dim = tmp_path / "dim.parquet"
    spark.createDataFrame(
        [(0, "gold"), (1, "gold"), (2, "basic")],
        "user_id long, segment string",
    ).write.parquet(str(dim))
    rows = [
        _ev(1, 10, 0, value=1.0),          # hour 0, gold
        _ev(2, 20, 1, value=2.0),          # hour 0, gold
        _ev(3, 30, 2, value=4.0),          # hour 0, basic
        _ev(4, 40, 9, value=8.0),          # hour 0, user 9 not in dim
        _ev(5, H + 5, 0, value=1.0),       # hour 1, gold
        _ev(6, 3 * H + 30, 0, value=1.0),  # advances watermark past 0,1
    ]
    _write_events(src, rows)

    q = stream_enriched_rollup(
        spark, str(src), str(dim), str(sink), str(ckpt),
        window="1 hour", watermark="1 hour",
    )
    q.awaitTermination(120)

    out = spark.read.parquet(str(sink))
    got = {
        (r["window_start"].hour, r["segment"]): (r["n_events"], r["value_total"])
        for r in out.collect()
    }
    assert got[(0, "gold")] == (2, 3.0)
    assert got[(0, "basic")] == (1, 4.0)
    assert got[(0, "unknown")] == (1, 8.0)
    assert got[(1, "gold")] == (1, 1.0)
    # Hour 3 not finalized in append mode.
    assert not any(h == 3 for h, _ in got)

    # Batch twin over the on-time rows produces the same finalized rows.
    ev = spark.createDataFrame(
        [(r["event_id"], r["ts_s"], r["user_id"], r["event_type"], r["value"])
         for r in rows[:5]],
        "event_id long, ts_s long, user_id long, event_type string, value double",
    )
    dims = spark.read.parquet(str(dim))
    batch = {
        (r["window_start"].hour, r["segment"]): (r["n_events"], r["value_total"])
        for r in enriched_rollup(ev, dims).collect()
    }
    assert batch == got


def test_stream_sketch_registers_merge_to_batch_state(spark, tmp_path):
    """Streaming HLL maintenance: after two micro-batches the
    max-merged register log folds to EXACTLY the sketch a single batch
    pass over the union computes — and re-appending a batch's
    registers (simulated redelivery) changes nothing, because register
    merge is idempotent max."""
    from etl_validator_github_spark.scale.sketches import (
        fold_registers,
        hll_registers,
    )
    from etl_validator_github_spark.streaming.events import (
        sketch_estimate,
        stream_distinct_sketch,
    )

    src = tmp_path / "ssrc"
    regs, ckpt = tmp_path / "regs", tmp_path / "sckpt"
    batch1 = [_ev(i, 10 + i, i % 40) for i in range(60)]
    batch2 = [_ev(100 + i, 200 + i, 20 + (i % 50)) for i in range(80)]
    src.mkdir(parents=True)
    with open(src / "b1.json", "w") as f:
        for r in batch1:
            f.write(__import__("json").dumps(r) + "\n")
    with open(src / "b2.json", "w") as f:
        for r in batch2:
            f.write(__import__("json").dumps(r) + "\n")

    q = stream_distinct_sketch(spark, str(src), str(regs), str(ckpt))
    q.awaitTermination(120)

    got = {r["grp"]: (r["v_zero"], r["sum_pow"], r["n_est"])
           for r in sketch_estimate(spark, str(regs)).collect()}

    union = spark.createDataFrame(
        [(r["event_id"], r["ts_s"], r["user_id"], r["event_type"], r["value"])
         for r in batch1 + batch2],
        "event_id long, ts_s long, user_id long, event_type string, value double",
    )
    expect = {
        r["grp"]: (r["v_zero"], r["sum_pow"], r["n_est"])
        for r in fold_registers(
            hll_registers(union, "event_type", "user_id")
        ).collect()
    }
    assert got == expect

    # Redelivery: append batch1's registers AGAIN — estimate unchanged.
    b1df = union.filter(union.event_id < 100)
    hll_registers(b1df, "event_type", "user_id").write.mode(
        "append"
    ).parquet(str(regs))
    again = {r["grp"]: (r["v_zero"], r["sum_pow"], r["n_est"])
             for r in sketch_estimate(spark, str(regs)).collect()}
    assert again == expect


def test_register_log_compaction_preserves_estimates(spark, tmp_path):
    """Compacting the register log (max-merge + swap) must not change
    any estimate, and must shrink the log to one row per (grp, bucket)."""
    from etl_validator_github_spark.scale.sketches import hll_registers
    from etl_validator_github_spark.streaming.events import (
        compact_registers,
        sketch_estimate,
    )

    regs = tmp_path / "clog"
    ev = spark.createDataFrame(
        [(i, "t", i % 31) for i in range(100)],
        "event_id long, event_type string, user_id long",
    )
    # Three overlapping appends → duplicate (grp, bucket) rows.
    for lo, hi in [(0, 50), (25, 75), (50, 100)]:
        hll_registers(
            ev.filter((ev.event_id >= lo) & (ev.event_id < hi)),
            "event_type", "user_id",
        ).write.mode("append").parquet(str(regs))

    before = {r["grp"]: (r["v_zero"], r["sum_pow"], r["n_est"])
              for r in sketch_estimate(spark, str(regs)).collect()}
    raw_rows = spark.read.parquet(str(regs)).count()

    n = compact_registers(spark, str(regs))
    after = {r["grp"]: (r["v_zero"], r["sum_pow"], r["n_est"])
             for r in sketch_estimate(spark, str(regs)).collect()}
    assert after == before
    assert n == spark.read.parquet(str(regs)).count() <= raw_rows
    dups = (
        spark.read.parquet(str(regs))
        .groupBy("grp", "bucket").count().filter("count > 1").count()
    )
    assert dups == 0


def test_stream_session_rollup_emits_finalized_sessions(spark, tmp_path):
    """Native session windows in append mode: a user's gap-separated
    bursts become separate finalized sessions once the watermark
    passes their ends; the freshest session stays withheld. A second
    run over the same source is a checkpointed no-op."""
    from etl_validator_github_spark.streaming.events import (
        stream_session_rollup,
    )

    src, sink, ckpt = tmp_path / "ssrc", tmp_path / "ssink", tmp_path / "sckpt"
    rows = [
        # user 1: burst A (2 events, 10 min apart), then 40-min gap
        # (> 30-min session gap) → burst B (1 event).
        _ev(0, 0, 1), _ev(1, 600, 1), _ev(2, 3000, 1),
        # user 2 far in the future: advances the watermark (1h delay)
        # beyond burst A's and B's ends, finalizing both.
        _ev(3, 6 * H, 2),
    ]
    _write_events(src, rows)

    q = stream_session_rollup(spark, str(src), str(sink), str(ckpt))
    q.awaitTermination(120)
    got = {
        (r.user_id, int(r.session_start.timestamp())): (
            r.n_events, int(r.session_end.timestamp()))
        for r in spark.read.parquet(str(sink)).collect()
    }
    # Burst A: [0, 600+1800); burst B: [3000, 3000+1800).
    assert got[(1, 0)] == (2, 600 + 1800)
    assert got[(1, 3000)] == (1, 3000 + 1800)
    # User 2's session is above the watermark → withheld.
    assert all(u != 2 for u, _ in got)

    q2 = stream_session_rollup(spark, str(src), str(sink), str(ckpt))
    q2.awaitTermination(120)
    assert spark.read.parquet(str(sink)).count() == 2   # no re-emission


def test_stream_table_profile_matches_batch_and_survives_redelivery(
        spark, tmp_path):
    """Mergeable streaming profile: after two micro-batch files, the
    folded report equals the batch table_profile + count of the union
    (exact fields) and the batch HLL estimate (registers max-merge to
    identical state). Re-running the stream with a FRESH checkpoint
    re-appends every batch; the report must not change — sums dedup by
    batch_id, min/max and registers are idempotent."""
    from etl_validator_github_spark.queries.relational import table_profile
    from etl_validator_github_spark.scale.sketches import fold_registers
    from etl_validator_github_spark.streaming.events import (
        profile_registers,
        profile_report,
        stream_table_profile,
    )

    schema = "doc_id long, lang string, n_chars long"
    spec = (("doc_id", "num"), ("lang", "str"), ("n_chars", "num"))
    rows1 = [(1, "en", 120), (2, "de", None), (3, None, 90)]
    rows2 = [(4, "en", 300), (5, "fr", 10), (6, "en", None)]
    src = tmp_path / "pfsrc"
    prof, regs = tmp_path / "pfprof", tmp_path / "pfregs"

    def write(name, rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
            str(src / name))

    write("f1.parquet", rows1)

    def run(ck):
        q = stream_table_profile(
            spark, str(src), schema, spec, str(prof), str(regs),
            str(tmp_path / ck))
        q.awaitTermination(120)

    run("ck1")
    write("f2.parquet", rows2)
    run("ck1")

    def snap():
        return {
            r.column_name: (r.n_rows, r.n_nulls, r.n_distinct_est,
                            r.min_num, r.max_num, r.min_str, r.max_str)
            for r in profile_report(spark, str(prof), str(regs)).collect()
        }

    got = snap()
    union = spark.createDataFrame(rows1 + rows2, schema)
    exp_exact = {
        r.column_name: (r.n_nulls, r.min_num, r.max_num,
                        r.min_str, r.max_str)
        for r in table_profile(union, spec).collect()
    }
    exp_est = {
        r.grp: r.n_est
        for r in fold_registers(profile_registers(union, spec)).collect()
    }
    assert set(got) == {"doc_id", "lang", "n_chars"}
    for c, (n_rows, n_nulls, n_est, mn, mx, sn, sx) in got.items():
        assert n_rows == 6
        assert (n_nulls, mn, mx, sn, sx) == exp_exact[c]
        assert n_est == exp_est[c]
    assert got["lang"][1] == 1 and got["n_chars"][1] == 2  # real nulls

    # Redelivery: a retried foreachBatch re-appends the SAME batch's
    # rows verbatim (same batch_id, same values) — simulate by
    # duplicating both logs. The report must not change: sums dedup on
    # batch_id, min/max and registers are idempotent.
    for d in (prof, regs):
        src_df = spark.read.parquet(str(d))
        rows = src_df.collect()  # materialize BEFORE appending to the
        #                          same directory being read
        spark.createDataFrame(rows, src_df.schema).write.mode(
            "append").parquet(str(d))
    assert snap() == got


def test_stream_expectations_monitor_accumulates_and_dedups(spark, tmp_path):
    """Expectations monitor: per-batch gate rows accumulate across
    micro-batches; a redelivered batch's duplicate appends fold out on
    read; unique() checks are rejected up front."""
    import json

    import pytest
    from pyspark.sql import functions as F

    from etl_validator_github_spark.operators.expectations import (
        expect_between,
        expect_in_set,
        expect_unique,
        run_expectations,
    )
    from etl_validator_github_spark.streaming.events import (
        EVENT_STREAM_SCHEMA,
        read_expectations_report,
        stream_expectations_monitor,
    )

    checks = [
        expect_in_set("event_type", ("click", "view")),
        expect_between("value", 0.0, 100.0),
    ]
    src = tmp_path / "exsrc"
    rep, ckpt = tmp_path / "exrep", tmp_path / "exckpt"
    src.mkdir(parents=True)

    def _ev(eid, typ, val):
        return {"event_id": eid, "ts_s": eid, "user_id": 0,
                "event_type": typ, "value": val}

    with open(src / "01.json", "w") as f:
        for r in [_ev(0, "click", 5.0), _ev(1, "bogus", 5.0),
                  _ev(2, "view", -3.0)]:
            f.write(json.dumps(r) + "\n")
    q = stream_expectations_monitor(
        spark, str(src), EVENT_STREAM_SCHEMA, checks, str(rep), str(ckpt))
    q.awaitTermination(120)

    with open(src / "02.json", "w") as f:
        for r in [_ev(3, "click", 500.0), _ev(4, "view", 1.0)]:
            f.write(json.dumps(r) + "\n")
    q2 = stream_expectations_monitor(
        spark, str(src), EVENT_STREAM_SCHEMA, checks, str(rep), str(ckpt))
    q2.awaitTermination(120)

    got = {r["check"]: (r["n_rows"], r["n_violations"])
           for r in read_expectations_report(spark, str(rep)).collect()}
    assert got["in_set(event_type)"] == (5, 1)   # 'bogus'
    assert got["between(value)"] == (5, 2)       # -3.0 and 500.0

    # Redelivery: re-append batch 0's gate rows under its SAME batch_id
    # → the (batch_id, check) max-dedup folds them out.
    first = spark.createDataFrame(
        [(0, 0, 0, "click", 5.0), (1, 1, 0, "bogus", 5.0),
         (2, 2, 0, "view", -3.0)],
        "event_id long, ts_s long, user_id long, event_type string, value double",
    )
    run_expectations(first, checks).withColumn(
        "batch_id", F.lit(0)
    ).write.mode("append").parquet(str(rep))
    got2 = {r["check"]: (r["n_rows"], r["n_violations"])
            for r in read_expectations_report(spark, str(rep)).collect()}
    assert got2 == got

    with pytest.raises(ValueError):
        stream_expectations_monitor(
            spark, str(src), EVENT_STREAM_SCHEMA,
            [expect_unique("event_id")], str(rep), str(ckpt))
