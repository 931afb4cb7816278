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
