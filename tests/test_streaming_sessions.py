"""Stateful streaming sessionizer (streaming/sessions.py).

Covers: a session closing inside one micro-batch, state carrying an open
session across micro-batches (separate files, maxFilesPerTrigger=1), and
exactly-once emission of closed sessions.
"""

from __future__ import annotations

import json

from etl_validator_github_spark.streaming.sessions import stream_sessionize

GAP = 100


def _write(path, name, rows):
    path.mkdir(parents=True, exist_ok=True)
    with open(path / name, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def _ev(eid, ts, user=0):
    return {"event_id": eid, "ts_s": ts, "user_id": user,
            "event_type": "click", "value": 1.0}


def test_sessionizer_closes_on_gap_and_spans_batches(spark, tmp_path):
    src, sink, ckpt = tmp_path / "src", tmp_path / "sink", tmp_path / "ckpt"

    # File 1: user 0 has events at 0,10,20 then a gap to 500 (closes
    # session 1 in-batch); the 500-session stays open.
    _write(src, "01.json", [_ev(0, 0), _ev(1, 10), _ev(2, 20), _ev(3, 500)])
    q = stream_sessionize(spark, str(src), str(sink), str(ckpt), gap_s=GAP)
    q.awaitTermination(120)

    out = {tuple(r) for r in spark.read.parquet(str(sink)).collect()}
    assert out == {(0, 0, 20, 3)}

    # File 2 (next run → new micro-batch): event at 520 extends the open
    # session; event at 5000 closes it → (500..520, 2 events) emitted.
    _write(src, "02.json", [_ev(4, 520), _ev(5, 5000)])
    q2 = stream_sessionize(spark, str(src), str(sink), str(ckpt), gap_s=GAP)
    q2.awaitTermination(120)

    out2 = {tuple(r) for r in spark.read.parquet(str(sink)).collect()}
    assert out2 == {(0, 0, 20, 3), (0, 500, 520, 2)}
